"""Stage decomposition + R sweep for the fused WBFM chain.

Run: nohup python -u benchmarks/probe_wfm_stages.py > /tmp/probe_wfm2.log 2>&1 &
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from benchmarks.bench_util import setup_cache, time_fn


def main():
    setup_cache()
    import jax
    import jax.numpy as jnp
    from gnuradio_tpu.models.wfm import channel_taps, wfm_taps
    from gnuradio_tpu.models.wfm_sharded import _deemph_coeffs
    from gnuradio_tpu.ops.iir_core import first_order_fir_taps
    from gnuradio_tpu.kernels.wfm_fused_pallas import WfmFrontFused
    from gnuradio_tpu.kernels.fir_xla import fir_apply

    n = 1 << 25
    iq = jax.jit(lambda: 0.5 * jax.random.normal(
        jax.random.PRNGKey(0), (n + 110, 2), dtype="float32"))()

    # stage 1 fused front, R sweep
    for R in (32, 64, 128, 256):
        front = WfmFrontFused(channel_taps(1e6, 250e3), 0.0, 1e6, 4,
                              0.53, R=R)
        xq = iq[: n + front.history]
        f = jax.jit(lambda x: front(x))
        try:
            dt = time_fn(f, xq, iters=10)
            r = {"stage": f"front_R{R}", "dt_ms": round(dt * 1e3, 3),
                 "msps_in": round(n / dt / 1e6, 1)}
        except Exception as e:
            r = {"stage": f"front_R{R}", "error": repr(e)[:200]}
        print(json.dumps(r), flush=True)

    # stage 2: audio FIR decim 5 at quad rate
    a_taps = np.asarray(wfm_taps(250e3, 50e3), np.float32)
    nq = n // 4
    y = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(1), (nq + len(a_taps) - 1,), dtype="float32"))()
    g = jax.jit(lambda v: fir_apply(v, jnp.asarray(a_taps), 5))
    dt = time_fn(g, y, iters=10)
    print(json.dumps({"stage": "audio_fir", "dt_ms": round(dt * 1e3, 3),
                      "ntaps": len(a_taps)}), flush=True)

    # stage 3: deemph FIR at audio rate
    b0, b1, rr = _deemph_coeffs(50e3, 75e-6)
    d_taps = np.asarray(first_order_fir_taps(b0, b1, rr), np.float32)
    na = nq // 5
    z = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(2), (na + len(d_taps) - 1,), dtype="float32"))()
    h = jax.jit(lambda v: fir_apply(v, jnp.asarray(d_taps), 1))
    dt = time_fn(h, z, iters=10)
    print(json.dumps({"stage": "deemph_fir", "dt_ms": round(dt * 1e3, 3),
                      "ntaps": len(d_taps)}), flush=True)

    # full fused chain at best R
    from gnuradio_tpu.models.wfm import make_wfm_step_fused
    from benchmarks.bench_util import time_fn_carry
    for R in (64, 128):
        init, step, mult = make_wfm_step_fused(1e6, 250e3, 50e3, R=R)
        run = jax.jit(step)
        st = jax.jit(init)()
        x = iq[:n]
        dt = time_fn_carry(run, st, x, iters=10)
        print(json.dumps({"stage": f"full_fused_R{R}",
                          "dt_ms": round(dt * 1e3, 3),
                          "msps": round(n / dt / 1e6, 1)}), flush=True)


if __name__ == "__main__":
    main()
