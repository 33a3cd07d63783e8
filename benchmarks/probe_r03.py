"""Round-3 perf probes on the real chip: multichannel tracking loops,
block-parallel single stream. Prints one JSON line per probe.

Run: nohup python -u benchmarks/probe_r03.py > /tmp/probe_r03.log 2>&1 &
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from benchmarks.bench_util import setup_cache, sync, time_fn_carry, time_fn


def probe_tracker(C=1024, K=4096, sps=2):
    import jax
    import jax.numpy as jnp
    from gnuradio_tpu.ops.multichannel_sync import (
        make_multichannel_tracking_step)
    init, step = make_multichannel_tracking_step(C, sps)
    n = K * sps

    @jax.jit
    def run(state, xp):
        return step(state, jax.lax.complex(xp[..., 0], xp[..., 1]))

    x = jax.jit(lambda: 0.3 * jax.random.normal(
        jax.random.PRNGKey(0), (n, C, 2), dtype="float32"))()
    st = jax.jit(init)()
    dt = time_fn_carry(run, st, x, iters=10)
    msps = n * C / dt / 1e6
    return {"probe": f"tracker_{C}ch_sps{sps}", "K": K, "dt_ms": dt * 1e3,
            "agg_msps": round(msps, 1), "us_per_symstep": dt / K * 1e6}


def probe_blockparallel(nsamp=1 << 22, sps=2, nblocks=1024):
    import jax
    import jax.numpy as jnp
    from gnuradio_tpu.models.qpsk import make_qpsk_rx_tracking_blockparallel
    run0 = make_qpsk_rx_tracking_blockparallel(sps, nblocks)

    @jax.jit
    def run(xp):
        return run0(jax.lax.complex(xp[:, 0], xp[:, 1]))

    x = jax.jit(lambda: 0.3 * jax.random.normal(
        jax.random.PRNGKey(1), (nsamp, 2), dtype="float32"))()
    dt = time_fn(run, x, iters=10)
    return {"probe": f"blockparallel_{nblocks}b_sps{sps}", "n": nsamp,
            "dt_ms": dt * 1e3, "msps": round(nsamp / dt / 1e6, 1)}


def main():
    setup_cache()
    for fn, kw in [
        (probe_tracker, dict(C=1024, K=4096, sps=2)),
        (probe_tracker, dict(C=1024, K=4096, sps=4)),
        (probe_tracker, dict(C=128, K=4096, sps=4)),
        (probe_blockparallel, dict(nsamp=1 << 22, sps=2, nblocks=1024)),
        (probe_blockparallel, dict(nsamp=1 << 23, sps=2, nblocks=2048)),
    ]:
        t0 = time.time()
        try:
            r = fn(**kw)
        except Exception as e:
            r = {"probe": repr(kw), "error": repr(e)[:300]}
        r["wall_s"] = round(time.time() - t0, 1)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
