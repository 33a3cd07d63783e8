"""TPU session 6: half-contraction front kernel (v2) vs v1 + full step.

Run: nohup python -u benchmarks/tpu_session6_r03.py > /tmp/tpu_s6.log 2>&1 &
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
    from gnuradio_tpu.kernels.wfm_fused_pallas import WfmFrontFused
    from gnuradio_tpu.models.wfm import channel_taps, make_wfm_step_fused

    n = 1 << 25
    taps = channel_taps(1e6, 250e3)
    xr = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(2), (n + 110,), dtype="float32"))()
    xi = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(3), (n + 110,), dtype="float32"))()

    for kern in ("v1", "v2"):
        for R in (128, 256, 512):
            fro = WfmFrontFused(taps, 0.0, 1e6, 4, 0.5305, R=R, kernel=kern)
            frr = jax.jit(lambda p, q, fo=fro: fo(p, q))
            try:
                dt = time_fn(frr, xr, xi, iters=10)
                J(stage=f"front_{kern}_R{R}", dt_ms=round(dt * 1e3, 3))
            except Exception as e:
                J(stage=f"front_{kern}_R{R}", error=repr(e)[:200])

    # correctness spot-check on chip: v1 vs v2 outputs
    f1 = WfmFrontFused(taps, 0.0, 1e6, 4, 0.5305, R=128, kernel="v1")
    f2 = WfmFrontFused(taps, 0.0, 1e6, 4, 0.5305, R=128, kernel="v2")
    small_r = xr[: (1 << 18) + 110]
    small_i = xi[: (1 << 18) + 110]
    y1 = jax.jit(lambda p, q: f1(p, q))(small_r, small_i)
    y2 = jax.jit(lambda p, q: f2(p, q))(small_r, small_i)
    d = jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))(y1, y2)
    J(stage="v1_vs_v2_onchip_maxerr", err=float(np.asarray(d)))

    # full fused step: split stage2 x v2 front
    iqp = jax.jit(lambda: 0.5 * jax.random.normal(
        jax.random.PRNGKey(0), (2, n), dtype="float32"))()
    for R in (128, 256, 512):
        init, st_fn, mult = make_wfm_step_fused(1e6, 250e3, 50e3, R=R,
                                                layout="planes",
                                                stage2="split")
        run = jax.jit(st_fn)
        st = jax.jit(init)()
        dt = time_fn_carry(run, st, iqp, iters=10)
        J(stage=f"full_split_v2_R{R}", dt_ms=round(dt * 1e3, 3),
          msps=round(n / dt / 1e6, 1))


if __name__ == "__main__":
    main()
