"""Decompose the fused channelizer step: prep, kernel, transpose, resampler."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
from benchmarks.bench_util import setup_cache, time_fn
setup_cache()
import jax
import jax.numpy as jnp
from jax import lax


def main():
    from gnuradio_tpu.models.channelize import channelizer_taps, resampler_taps
    from gnuradio_tpu.kernels.pfb_pallas import chan_fused_consts, pfb_channelize_fused
    from gnuradio_tpu.ops.pfb import PfbChannelizer, PfbArbResampler
    chan = PfbChannelizer(64, channelizer_taps(6_400_000.0, 64))
    M, L = chan.M, chan.L
    Hm, Er, Ei = chan_fused_consts(chan.arms, M)
    n = 1 << 22
    hist = L * M - 1
    T = n // M
    xr = jax.jit(lambda: 0.5 * jax.random.normal(
        jax.random.PRNGKey(0), (hist + n,), dtype="float32"))()
    xi = jax.jit(lambda: 0.5 * jax.random.normal(
        jax.random.PRNGKey(1), (hist + n,), dtype="float32"))()

    for dense in (True, False):
        for TB in (256, 512, 1024):
            fn = jax.jit(lambda a, b, TB=TB, dense=dense: pfb_channelize_fused(
                a, b, jnp.asarray(Hm), jnp.asarray(Er), jnp.asarray(Ei),
                M, L, TB, False, dense))
            fn(xr, xi)
            t = time_fn(fn, xr, xi, iters=10)
            print(f"kernel dense={dense} TB={TB}: {t*1e3:.2f} ms", flush=True)

    yr, yi = fn(xr, xi)

    tr = jax.jit(lambda a, b: lax.complex(a.T, b.T).astype(jnp.complex64))
    tr(yr, yi)
    t = time_fn(tr, yr, yi, iters=10)
    print(f"transpose+complex: {t*1e3:.2f} ms", flush=True)

    rs = PfbArbResampler(0.9375, resampler_taps(1e5, 0.9375, 32), 32)
    ypr = jnp.concatenate([jnp.zeros((rs.L, 64), jnp.float32), yr])
    ypi = jnp.concatenate([jnp.zeros((rs.L, 64), jnp.float32), yi])
    rsf = jax.jit(lambda a, b: rs.resample_batched_tc(a, b))
    rsf(ypr, ypi)
    t = time_fn(rsf, ypr, ypi, iters=10)
    print(f"resampler tc: {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
