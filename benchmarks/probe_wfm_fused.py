"""Probe: fused WBFM front end (kernels/wfm_fused_pallas.py) on the real
chip vs the round-2 unfused chain.

Run: nohup python -u benchmarks/probe_wfm_fused.py > /tmp/probe_wfm.log 2>&1 &
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from benchmarks.bench_util import setup_cache, time_fn_carry


def probe(n, fused=True):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from gnuradio_tpu.models.wfm import make_wfm_step, make_wfm_step_fused
    if fused:
        init, step, mult = make_wfm_step_fused(1e6, 250e3, 50e3)

        @jax.jit
        def run(state, iqp):
            return step(state, iqp)
    else:
        init, step, mult = make_wfm_step(1e6, 250e3, 50e3)

        @jax.jit
        def run(state, iqp):
            return step(state, lax.complex(iqp[:, 0], iqp[:, 1]))

    iq = jax.jit(lambda: 0.5 * jax.random.normal(
        jax.random.PRNGKey(0), (n, 2), dtype="float32"))()
    st = jax.jit(init)()
    dt = time_fn_carry(run, st, iq, iters=10)
    return {"probe": f"wfm_{'fused' if fused else 'unfused'}_n{n}",
            "dt_ms": round(dt * 1e3, 3), "msps": round(n / dt / 1e6, 1)}


def check_parity(n=1 << 20):
    """On-chip numeric parity fused vs unfused (beyond interpret-mode QA)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax
    from gnuradio_tpu.models.wfm import make_wfm_step, make_wfm_step_fused
    init_u, step_u, _ = make_wfm_step(1e6, 250e3, 50e3)
    init_f, step_f, _ = make_wfm_step_fused(1e6, 250e3, 50e3)
    iq = jax.jit(lambda: 0.5 * jax.random.normal(
        jax.random.PRNGKey(7), (n, 2), dtype="float32"))()

    @jax.jit
    def du(state, iqp):
        return step_u(state, lax.complex(iqp[:, 0], iqp[:, 1]))

    su, ref = du(jax.jit(init_u)(), iq)
    sf, got = jax.jit(step_f)(jax.jit(init_f)(), iq)

    @jax.jit
    def maxdiff(a, b):
        return jnp.max(jnp.abs(a[64:] - b[64:])), jnp.max(jnp.abs(b[64:]))

    d, s = maxdiff(ref, got)
    return {"probe": "wfm_parity_onchip", "max_abs_diff": float(np.asarray(d)),
            "ref_scale": float(np.asarray(s))}


def main():
    setup_cache()
    jobs = [
        (probe, dict(n=1 << 25, fused=True)),
        (probe, dict(n=1 << 25, fused=False)),
        (probe, dict(n=1 << 26, fused=True)),
        (check_parity, {}),
    ]
    for fn, kw in jobs:
        t0 = time.time()
        try:
            r = fn(**kw)
        except Exception as e:
            r = {"probe": repr(kw), "error": repr(e)[:400]}
        r["wall_s"] = round(time.time() - t0, 1)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
