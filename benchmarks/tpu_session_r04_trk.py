"""Tracking-loop S-batching probe: 1024ch aggregate + blockparallel."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
from benchmarks.bench_util import setup_cache, time_fn, time_fn_carry
setup_cache()
import jax
import jax.numpy as jnp


def main():
    from gnuradio_tpu.ops.multichannel_sync import make_multichannel_tracking_step
    C, sps, K = 1024, 4, 4096
    n = K * sps
    for S in (1, 8, 16, 32):
        init, step = make_multichannel_tracking_step(C, sps)
        run = jax.jit(lambda st, xp, S=S, step=step: step(
            st, jax.lax.complex(xp[..., 0], xp[..., 1]), S))
        x = jax.jit(lambda: 0.3 * jax.random.normal(
            jax.random.PRNGKey(0), (n, C, 2), dtype="float32"))()
        st = jax.jit(init)()
        dt = time_fn_carry(run, st, x, iters=10)
        print(f"1024ch S={S}: {n*C/dt/1e6:.1f} Msps agg ({dt*1e3:.2f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
