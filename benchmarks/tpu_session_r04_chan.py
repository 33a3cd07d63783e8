"""Round-4 channelizer probe: DFT-as-matmul + batched fast path, and a
per-stage decomposition to find the next binding constraint.

Run: nohup python -u benchmarks/tpu_session_r04_chan.py > /tmp/chan_r04.log 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
from benchmarks.bench_util import setup_cache, sync, time_fn_carry, time_fn

setup_cache()

import jax
import jax.numpy as jnp
from jax import lax


def main():
    from gnuradio_tpu.models.channelize import (channelizer_taps,
                                                make_channelizer_step,
                                                resampler_taps)
    init, step, meta = make_channelizer_step(6_400_000.0, 64,
                                             resample_rate=0.9375)
    n = (1 << 22)
    n = (n // meta["in_multiple"]) * meta["in_multiple"]

    @jax.jit
    def run(state, iq):
        return step(state, lax.complex(iq[:, 0], iq[:, 1]))

    iq = jax.jit(lambda: 0.5 * jax.random.normal(
        jax.random.PRNGKey(1), (n, 2), dtype="float32"))()
    st = jax.jit(init)()
    dt = time_fn_carry(run, st, iq, iters=10)
    print(f"full step: {n/dt/1e6:.1f} Msps ({dt*1e3:.2f} ms)", flush=True)

    # ---- stage decomposition ----
    from gnuradio_tpu.ops.pfb import PfbChannelizer, PfbArbResampler, _arm_rows
    from gnuradio_tpu.kernels.fir_xla import fir_apply_batched
    chan = PfbChannelizer(64, channelizer_taps(6_400_000.0, 64))
    M, L = chan.M, chan.L
    print("arm len L =", L, "ntaps =", chan.ntaps, flush=True)
    xp = jax.jit(lambda: 0.5 * jax.random.normal(
        jax.random.PRNGKey(2), (L * M - 1 + n,), dtype="float32")
        .astype(jnp.complex64))()

    @jax.jit
    def stage_arms(xp):
        return _arm_rows(xp, M, L - 1 + n // M)

    U = stage_arms(xp)
    t = time_fn(stage_arms, xp, iters=10)
    print(f"arm relayout: {t*1e3:.2f} ms", flush=True)

    arms = jnp.asarray(chan.arms)

    @jax.jit
    def stage_conv(U):
        return fir_apply_batched(U, arms, 1)

    V = stage_conv(U)
    t = time_fn(stage_conv, U, iters=10)
    print(f"arm conv: {t*1e3:.2f} ms", flush=True)

    @jax.jit
    def stage_dft(V):
        return chan._ifft_rows(V)

    Y = stage_dft(V)
    t = time_fn(stage_dft, V, iters=10)
    print(f"dft matmul: {t*1e3:.2f} ms", flush=True)

    @jax.jit
    def stage_fft(V):
        return (jnp.fft.ifft(V, axis=0) * M).astype(jnp.complex64)

    stage_fft(V)
    t = time_fn(stage_fft, V, iters=10)
    print(f"xla ifft (old): {t*1e3:.2f} ms", flush=True)

    rs = PfbArbResampler(0.9375, resampler_taps(1e5, 0.9375, 32), 32)
    Yp = jnp.concatenate([jnp.zeros((64, rs.L), jnp.complex64), Y], axis=1)

    @jax.jit
    def stage_rs(Yp):
        return rs.resample_batched(Yp)

    stage_rs(Yp)
    t = time_fn(stage_rs, Yp, iters=10)
    print(f"resampler: {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
