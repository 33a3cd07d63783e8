"""Isolate the fused-WBFM kernel bottleneck: precision sweep + stage
ablations, all via monkeypatched kernel variants.

Run: nohup python -u benchmarks/probe_wfm4.py > /tmp/probe_wfm4.log 2>&1 &
"""
import functools
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
    from jax.experimental import pallas as pl
    from gnuradio_tpu.kernels import wfm_fused_pallas as WF
    from gnuradio_tpu.models.wfm import channel_taps

    n = 1 << 25
    front = WF.WfmFrontFused(channel_taps(1e6, 250e3), 0.0, 1e6, 4, 0.53,
                             R=128)
    iq = jax.jit(lambda: 0.5 * jax.random.normal(
        jax.random.PRNGKey(0), (n + front.history, 2), dtype="float32"))()

    def variant_kernel(prec, do_demod, do_atan):
        def _k(xar, xhr, xai, xhi, w_ref, o_ref, *, R, B, D, K, gain,
               c0r, c0i):
            BD = B * D
            Gr = jnp.concatenate([xar[...], xhr[0]], axis=0).reshape(
                R + K, BD)
            Gi = jnp.concatenate([xai[...], xhi[0]], axis=0).reshape(
                R + K, BD)
            W = w_ref[...]
            dot = functools.partial(
                jax.lax.dot_general,
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)
            Ar = dot(Gr[0:R], W[0])
            Ai = dot(Gi[0:R], W[0])
            for k in range(1, K + 1):
                Ar = Ar + dot(Gr[k:k + R], W[k])
                Ai = Ai + dot(Gi[k:k + R], W[k])
            if not do_demod:
                o_ref[...] = Ar[:, 0:B] + Ai[:, B:2 * B]
                return
            ycr = Ar[:, 0 * B:1 * B] - Ai[:, 1 * B:2 * B]
            yci = Ar[:, 1 * B:2 * B] + Ai[:, 0 * B:1 * B]
            ypr = Ar[:, 2 * B:3 * B] - Ai[:, 3 * B:4 * B]
            ypi = Ar[:, 3 * B:4 * B] + Ai[:, 2 * B:3 * B]
            zr0 = ycr * ypr + yci * ypi
            zi0 = yci * ypr - ycr * ypi
            zr = zr0 * c0r - zi0 * c0i
            zi = zr0 * c0i + zi0 * c0r
            if do_atan:
                o_ref[...] = gain * WF._atan2(zi, zr)
            else:
                o_ref[...] = zr + zi
        return _k

    orig = WF._wfm_kernel
    cases = [
        ("highest_full", jax.lax.Precision.HIGHEST, True, True),
        ("highest_nodemod", jax.lax.Precision.HIGHEST, False, False),
        ("highest_noatan", jax.lax.Precision.HIGHEST, True, False),
        ("default_full", jax.lax.Precision.DEFAULT, True, True),
        ("high_full", jax.lax.Precision.HIGH, True, True),
    ]
    for name, prec, demod, atan in cases:
        WF._wfm_kernel = variant_kernel(prec, demod, atan)
        WF._wfm_front_pallas.clear_cache()
        f = jax.jit(lambda x: front(x))
        try:
            dt = time_fn(f, iq, iters=10)
            r = {"case": name, "dt_ms": round(dt * 1e3, 3),
                 "msps_in": round(n / dt / 1e6, 1)}
        except Exception as e:
            r = {"case": name, "error": repr(e)[:200]}
        print(json.dumps(r), flush=True)
    WF._wfm_kernel = orig


if __name__ == "__main__":
    main()
