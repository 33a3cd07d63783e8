"""TPU session 4: re-measure after 0-d-tap fix, B=128 multi-group FIR,
OFDM row-gather, planes layout everywhere.

Run: nohup python -u benchmarks/tpu_session4_r03.py > /tmp/tpu_s4.log 2>&1 &
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from benchmarks.bench_util import setup_cache, sync, time_fn, time_fn_carry


def J(**kw):
    print(json.dumps(kw), flush=True)


def wfm():
    import jax
    from gnuradio_tpu.models.wfm import make_wfm_step_fused
    n = 1 << 25
    iq = jax.jit(lambda: 0.5 * jax.random.normal(
        jax.random.PRNGKey(0), (2, n), dtype="float32"))()
    for R in (128, 256):
        init, step, mult = make_wfm_step_fused(1e6, 250e3, 50e3, R=R,
                                               layout="planes")
        run = jax.jit(step)
        st = jax.jit(init)()
        dt = time_fn_carry(run, st, iq, iters=10)
        J(stage=f"fused_planes_R{R}", dt_ms=round(dt * 1e3, 3),
          msps=round(n / dt / 1e6, 1))
    # stage2 alone (folded 775-tap decim-5, B=128 multi-group)
    import jax.numpy as jnp
    from gnuradio_tpu.kernels.fir_xla import fir_apply
    from gnuradio_tpu.models.wfm import wfm_taps
    from gnuradio_tpu.models.wfm_sharded import _deemph_coeffs
    from gnuradio_tpu.ops.iir_core import first_order_fir_taps
    a = np.asarray(wfm_taps(250e3, 50e3), np.float64)
    b0, b1, r = _deemph_coeffs(50e3, 75e-6)
    d = np.asarray(first_order_fir_taps(b0, b1, r), np.float64)
    up = np.zeros(5 * len(d) - 4)
    up[::5] = d
    comb = np.convolve(a, up).astype(np.float32)
    nq = n // 4
    y = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(1), (nq + len(comb) - 1,), dtype="float32"))()
    g = jax.jit(lambda v: fir_apply(v, jnp.asarray(comb), 5))
    dt = time_fn(g, y, iters=10)
    J(stage="stage2_folded_B128", dt_ms=round(dt * 1e3, 3),
      ntaps=len(comb))


def channelizer_layout():
    import jax
    from jax import lax
    from gnuradio_tpu.models.channelize import make_channelizer_step
    init, step, meta = make_channelizer_step(6_400_000.0, 64,
                                             resample_rate=0.9375)
    n = (1 << 22)
    n = (n // meta["in_multiple"]) * meta["in_multiple"]
    for layout in ("interleaved", "planes"):
        if layout == "interleaved":
            @jax.jit
            def run(state, iq):
                return step(state, lax.complex(iq[:, 0], iq[:, 1]))
            shape = (n, 2)
        else:
            @jax.jit
            def run(state, iq):
                return step(state, lax.complex(iq[0], iq[1]))
            shape = (2, n)
        iq = jax.jit(lambda: 0.5 * jax.random.normal(
            jax.random.PRNGKey(1), shape, dtype="float32"))()
        st = jax.jit(init)()
        dt = time_fn_carry(run, st, iq, iters=10)
        J(stage=f"channelizer_{layout}", dt_ms=round(dt * 1e3, 3),
          msps=round(n / dt / 1e6, 1))


def ofdm():
    import jax
    import jax.numpy as jnp
    from gnuradio_tpu.models.ofdm import ofdm_rx_burst, ofdm_tx_burst
    from gnuradio_tpu.ops import ofdm as O
    n_occ = len(O.default_occupied_carriers(64))
    nf = 8
    rng = np.random.default_rng(0)
    for B in (4096, 16384):
        idx = jnp.asarray(rng.integers(0, 4, (B, nf * n_occ)
                                       ).astype(np.int32))

        @jax.jit
        def loop(state, si):
            def one(s):
                iq, _ = ofdm_tx_burst(s, 64, 16, pad=32)
                out, _ = ofdm_rx_burst(iq, nf, 64, 16, equalizer="static")
                return out
            return state, jax.vmap(one)(si)

        st = jnp.zeros(())
        dt = time_fn_carry(loop, st, idx, iters=10)
        burst_len = 32 * 2 + (2 + nf) * (64 + 16)
        J(ofdm=f"loopback_B{B}", dt_ms=round(dt * 1e3, 3),
          msps=round(B * burst_len / dt / 1e6, 1))


def topblock():
    from benchmarks.bench_topblock import bench_bare, bench_topblock_device
    J(**bench_bare(1 << 24))
    J(**bench_topblock_device(1 << 24, steps=16))


def dvbt():
    import jax
    import jax.numpy as jnp
    from gnuradio_tpu.ops import dtv
    cfg = dtv.DVBTConfig()
    pil = dtv.DVBTPilots(cfg)
    nb1 = dtv.dvbt_tx_bytes_per_superframe(cfg)
    k0 = next(k for k in range(1, 9) if (k * nb1) % 1504 == 0)
    for mult in (4, 8):
        nb = nb1 * k0 * mult
        ts = jnp.asarray(np.random.default_rng(0).integers(
            0, 256, nb).astype(np.int8))
        full = jax.jit(lambda b: dtv.dvbt_tx(b, cfg, pil))
        out = full(ts)
        n_out = int(out.shape[0])
        dt = time_fn(full, ts, iters=10)
        J(dvbt=f"full_x{mult}", dt_ms=round(dt * 1e3, 3),
          msps=round(n_out / dt / 1e6, 2))


def main():
    setup_cache()
    for name, fn in [("wfm", wfm), ("chan", channelizer_layout),
                     ("ofdm", ofdm), ("topblock", topblock),
                     ("dvbt", dvbt)]:
        print(f"### {name}", flush=True)
        t0 = time.time()
        try:
            fn()
        except Exception:
            import traceback
            J(section=name, error=traceback.format_exc()[-500:])
        J(section=name, wall_s=round(time.time() - t0, 1))


if __name__ == "__main__":
    main()
