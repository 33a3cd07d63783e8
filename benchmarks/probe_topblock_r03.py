"""Dissect the TopBlock composed-path overhead (212% vs bare step at 2^24).

Components timed separately on the real chip:
  1. jitted noise generation alone (threefry split+normal, 2^24 x 2)
  2. cg.step carried, NO host fetch of taps (pure device graph incl. noise)
  3. tb.run loop with flush excluded from timing
  4. single np.asarray fetch of a (1,) tap (tunnel latency)
  5. batched jax.device_get of N pending taps

Run: nohup python -u benchmarks/probe_topblock_r03.py > /tmp/probe_tb.log 2>&1 &
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from benchmarks.bench_util import setup_cache, sync, time_fn_carry


def J(**kw):
    print(json.dumps(kw), flush=True)


def main():
    setup_cache()
    import jax
    import jax.numpy as jnp
    from gnuradio_tpu.core.runtime import TopBlock
    from gnuradio_tpu.models.wfm import WfmRcvFull
    from gnuradio_tpu.ops.analog import noise_source_c
    from gnuradio_tpu.ops.blocks import null_sink
    from gnuradio_tpu.core.stream import F, PortSpec

    n = 1 << 24

    # 1. noise gen alone
    @jax.jit
    def gen(key):
        key, sub = jax.random.split(key)
        v = jax.random.normal(sub, (n, 2), jnp.float32)
        y = (v[:, 0] + 1j * v[:, 1]) * (0.5 / np.sqrt(2))
        return key, y.astype(jnp.complex64)

    key = jax.jit(lambda: jax.random.key(1))()
    dt = time_fn_carry(lambda k, _x: (gen(k)[0], None)[0:1] + (None,), key,
                       None, iters=10) if False else None
    # simpler: manual carry timing
    k, y = gen(key); jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(10):
        k, y = gen(k)
    jax.block_until_ready(y)
    J(stage="noisegen_2e24", dt_ms=round((time.perf_counter() - t0) / 10 * 1e3, 3))

    # 2. graph step carried, no fetch
    src = noise_source_c("gaussian", 0.5, seed=1)
    rcv = WfmRcvFull(1e6, 250e3, 50e3)
    snk = null_sink(F)
    tb = TopBlock(chunk_mult=None, target_items=n)
    tb.connect(src, rcv, snk)
    cg = tb.compile()
    state = cg.init_state()
    state, taps = cg.step(state, {})
    jax.block_until_ready(taps)
    t0 = time.perf_counter()
    for _ in range(10):
        state, taps = cg.step(state, {})
    jax.block_until_ready(taps)
    J(stage="cg_step_nofetch", dt_ms=round((time.perf_counter() - t0) / 10 * 1e3, 3))

    # 4. single (1,) tap fetch latency
    t0 = time.perf_counter()
    for _ in range(10):
        _ = np.asarray(taps[snk.name])
    J(stage="tap1_fetch", dt_ms=round((time.perf_counter() - t0) / 10 * 1e3, 3))

    # 5. batched device_get of 16 pending tap dicts
    pending = []
    for _ in range(16):
        state, taps = cg.step(state, {})
        pending.append(taps)
    jax.block_until_ready(pending[-1])
    t0 = time.perf_counter()
    host = jax.device_get(pending)
    J(stage="batched_get_16taps", dt_ms=round((time.perf_counter() - t0) * 1e3, 3))

    # 3. tb.run loop, flush inside (as benched) then effectively idle run
    tb2 = TopBlock(chunk_mult=None, target_items=n)
    tb2.connect(noise_source_c("gaussian", 0.5, seed=1),
                WfmRcvFull(1e6, 250e3, 50e3), null_sink(F))
    tb2.compile()
    tb2.run(n_steps=2)
    sync(tb2.state)
    t0 = time.perf_counter()
    tb2.run(n_steps=10)
    sync(tb2.state)
    J(stage="tb_run_asbenched", dt_ms=round((time.perf_counter() - t0) / 10 * 1e3, 3))


if __name__ == "__main__":
    main()
