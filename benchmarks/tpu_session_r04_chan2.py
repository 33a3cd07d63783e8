"""Fused-channelizer TPU probe: full step + TB sweep."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
from benchmarks.bench_util import setup_cache, time_fn_carry
setup_cache()
import jax
import jax.numpy as jnp


def main():
    from gnuradio_tpu.models.channelize import make_channelizer_step_fused
    for TB in (1024, 2048):
        init, step, meta = make_channelizer_step_fused(
            6_400_000.0, 64, 0.9375, TB=TB, interpret=False)
        n = (1 << 22)
        n = (n // meta["in_multiple"]) * meta["in_multiple"]
        run = jax.jit(step)
        iq = jax.jit(lambda: 0.5 * jax.random.normal(
            jax.random.PRNGKey(1), (n, 2), dtype="float32"))()
        st = jax.jit(init)()
        dt = time_fn_carry(run, st, iq, iters=10)
        print(f"TB={TB}: {n/dt/1e6:.1f} Msps ({dt*1e3:.2f} ms)", flush=True)
    # channelizer-only (no resampler)
    init, step, meta = make_channelizer_step_fused(
        6_400_000.0, 64, None, TB=2048, interpret=False)
    n = (1 << 22)
    run = jax.jit(step)
    iq = jax.jit(lambda: 0.5 * jax.random.normal(
        jax.random.PRNGKey(1), (n, 2), dtype="float32"))()
    st = jax.jit(init)()
    dt = time_fn_carry(run, st, iq, iters=10)
    print(f"no-rs TB=512: {n/dt/1e6:.1f} Msps ({dt*1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
