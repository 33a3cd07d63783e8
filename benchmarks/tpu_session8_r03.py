"""TPU session 8: OFDM demod-path micro-dissection.

Run: nohup python -u benchmarks/tpu_session8_r03.py > /tmp/tpu_s8.log 2>&1 &
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
from benchmarks.bench_util import setup_cache, time_fn


def J(**kw):
    print(json.dumps(kw), flush=True)


def main():
    setup_cache()
    import jax
    import jax.numpy as jnp
    from gnuradio_tpu.models.ofdm import ofdm_tx_burst
    from gnuradio_tpu.ops import ofdm as O

    n_occ = len(O.default_occupied_carriers(64))
    nf = 8
    B = 4096
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 4, (B, nf * n_occ)).astype(np.int32))

    @jax.jit
    def tx_only(si):
        return jax.vmap(lambda s: ofdm_tx_burst(s, 64, 16, pad=32)[0])(si)

    iq = tx_only(idx)          # (B, 864) complex64
    n = iq.shape[1]

    # a. rotate only (random per-burst fine)
    fines = jnp.asarray(rng.standard_normal(B).astype(np.float32) * 1e-3)

    @jax.jit
    def rotate_only(x, f):
        ramp = jnp.arange(n, dtype=jnp.float32)
        return x * jnp.exp(-1j * f[:, None] * ramp[None, :])

    dt = time_fn(rotate_only, iq, fines, iters=10)
    J(stage="rotate_only", dt_ms=round(dt * 1e3, 3))

    # a2. rotate via cos/sin planes (no complex exp)
    @jax.jit
    def rotate_planes(x, f):
        ramp = jnp.arange(n, dtype=jnp.float32)
        ph = f[:, None] * ramp[None, :]
        c, s = jnp.cos(ph), jnp.sin(ph)
        return jax.lax.complex(x.real * c + x.imag * s,
                               x.imag * c - x.real * s)

    dt = time_fn(rotate_planes, iq, fines, iters=10)
    J(stage="rotate_planes", dt_ms=round(dt * 1e3, 3))

    # b. detect + row slice only (no rotate)
    @jax.jit
    def slice_only(x):
        def one(v):
            d, fine = O.schmidl_cox_detect(v, 64, 16)
            sym_len = 80
            need = nf + 2
            pad_rows = -((-(n + 8 * 16)) // 8)
            x8 = jnp.pad(v, (0, max(0, pad_rows * 8 - n))).reshape(-1, 8)
            seg = jax.lax.dynamic_slice(
                x8, (d // 8, 0), (need * sym_len // 8, 8))
            return seg
        return jax.vmap(one)(x)

    segs = slice_only(iq)
    dt = time_fn(slice_only, iq, iters=10)
    J(stage="detect_plus_slice", dt_ms=round(dt * 1e3, 3))

    # c. fft only on pre-sliced segments
    @jax.jit
    def fft_only(s):
        fr = s.reshape(B, nf + 2, 80)[:, :, 16:]
        return jnp.fft.fft(fr, axis=2)

    dt = time_fn(fft_only, segs, iters=10)
    J(stage="fft_only", dt_ms=round(dt * 1e3, 3))

    # c2. fft via one-hot DFT matmul (64-point, batch 40960)
    Wdft = jnp.asarray(np.exp(-2j * np.pi * np.outer(np.arange(64),
                                                     np.arange(64)) / 64
                              ).astype(np.complex64))

    @jax.jit
    def fft_matmul(s):
        fr = s.reshape(B, nf + 2, 80)[:, :, 16:]
        frr, fri = fr.real, fr.imag
        Wr, Wi = Wdft.real, Wdft.imag
        yr = frr @ Wr - fri @ Wi
        yi = frr @ Wi + fri @ Wr
        return jax.lax.complex(yr, yi)

    dt = time_fn(fft_matmul, segs, iters=10)
    J(stage="fft_matmul", dt_ms=round(dt * 1e3, 3))


if __name__ == "__main__":
    main()
