"""TPU session 5: WBFM stage-2 alternatives + OFDM push.

Stage-2 today: ONE folded 775-tap decim-5 FIR at quad rate (6.9 ms of the
13.4 ms step).  Candidates:
  a. folded 775-tap (current)            — baseline
  b. split: 215-tap decim-5 audio FIR + deemph truncated FIR at AUDIO rate
  c. split with XLA (non-pallas) path for both
  d. folded via XLA path
Also re-times the fused front alone to see the other half of the budget.

Run: nohup python -u benchmarks/tpu_session5_r03.py > /tmp/tpu_s5.log 2>&1 &
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from benchmarks.bench_util import setup_cache, sync, time_fn, time_fn_carry


def J(**kw):
    print(json.dumps(kw), flush=True)


def main():
    setup_cache()
    import jax
    import jax.numpy as jnp
    from gnuradio_tpu.kernels.fir_xla import fir_apply
    from gnuradio_tpu.models.wfm import wfm_taps
    from gnuradio_tpu.models.wfm_sharded import _deemph_coeffs
    from gnuradio_tpu.ops.iir_core import first_order_fir_taps

    n = 1 << 25
    nq = n // 4

    a = np.asarray(wfm_taps(250e3, 50e3), np.float64)       # 215 taps
    b0, b1, r = _deemph_coeffs(50e3, 75e-6)
    d = np.asarray(first_order_fir_taps(b0, b1, r), np.float64)
    up = np.zeros(5 * len(d) - 4)
    up[::5] = d
    comb = np.convolve(a, up).astype(np.float32)            # 775 taps
    J(meta=dict(audio_taps=len(a), deemph_taps=len(d), comb=len(comb)))

    y = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(1), (nq + len(comb) - 1,), dtype="float32"))()
    ya = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(1), (nq + len(a) - 1,), dtype="float32"))()

    # a. folded pallas
    g = jax.jit(lambda v: fir_apply(v, jnp.asarray(comb), 5))
    J(stage="a_folded_pallas", dt_ms=round(time_fn(g, y, iters=10) * 1e3, 3))
    # d. folded XLA
    gx = jax.jit(lambda v: fir_apply(v, jnp.asarray(comb), 5,
                                     prefer_pallas=False))
    J(stage="d_folded_xla", dt_ms=round(time_fn(gx, y, iters=10) * 1e3, 3))

    # b. split pallas: audio FIR then deemph at audio rate
    af = jnp.asarray(a.astype(np.float32))
    df = jnp.asarray(d.astype(np.float32))

    @jax.jit
    def split(v):
        au = fir_apply(v, af, 5)
        aup = jnp.concatenate([jnp.zeros(len(d) - 1, jnp.float32), au])
        return fir_apply(aup, df, 1)

    J(stage="b_split_pallas", dt_ms=round(time_fn(split, ya, iters=10) * 1e3, 3))

    @jax.jit
    def split_x(v):
        au = fir_apply(v, af, 5, prefer_pallas=False)
        aup = jnp.concatenate([jnp.zeros(len(d) - 1, jnp.float32), au])
        return fir_apply(aup, df, 1, prefer_pallas=False)

    J(stage="c_split_xla", dt_ms=round(time_fn(split_x, ya, iters=10) * 1e3, 3))

    # full fused step: folded vs split stage2 (planes layout, R=256)
    from gnuradio_tpu.models.wfm import make_wfm_step_fused as mk
    iqp = jax.jit(lambda: 0.5 * jax.random.normal(
        jax.random.PRNGKey(0), (2, n), dtype="float32"))()
    for mode in ("folded", "split"):
        init, st_fn, mult = mk(1e6, 250e3, 50e3, R=256, layout="planes",
                               stage2=mode)
        run = jax.jit(st_fn)
        st = jax.jit(init)()
        dt = time_fn_carry(run, st, iqp, iters=10)
        J(stage=f"full_fused_{mode}", dt_ms=round(dt * 1e3, 3),
          msps=round(n / dt / 1e6, 1))

    # front alone at R=256
    from gnuradio_tpu.models.wfm import make_wfm_step_fused
    from gnuradio_tpu.kernels.wfm_fused_pallas import WfmFrontFused
    from gnuradio_tpu.models.wfm import channel_taps
    front = WfmFrontFused(channel_taps(1e6, 250e3), 0.0, 1e6, 4,
                          250e3 / (2 * np.pi * 75e3), R=256)
    xr = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(2), (n + front.history,), dtype="float32"))()
    xi = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(3), (n + front.history,), dtype="float32"))()
    fr = jax.jit(lambda p, q: front(p, q))
    J(stage="front_R256", dt_ms=round(time_fn(fr, xr, xi, iters=10) * 1e3, 3))
    for R in (512, 1024):
        fro = WfmFrontFused(channel_taps(1e6, 250e3), 0.0, 1e6, 4,
                            250e3 / (2 * np.pi * 75e3), R=R)
        frr = jax.jit(lambda p, q, fo=fro: fo(p, q))
        J(stage=f"front_R{R}",
          dt_ms=round(time_fn(frr, xr, xi, iters=10) * 1e3, 3))


if __name__ == "__main__":
    main()
