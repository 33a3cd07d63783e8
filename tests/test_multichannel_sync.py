"""QA: multi-channel vectorized tracking loops (ops/multichannel_sync.py).

Mirrors the reference's symbol_sync/clock-recovery QA pattern
(gr-digital/python/digital/qa_symbol_sync_cc.py: impaired shaped stream in,
steady-state decisions checked after the pull-in transient)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnuradio_tpu.models.qpsk import rrc_taps
from gnuradio_tpu.ops.multichannel_sync import (
    MultiChannelTracker, block_parallel_tracker,
    make_multichannel_tracking_step)

SPS = 4
_PTS = np.exp(1j * (np.pi / 4 + np.pi / 2 * np.arange(4))).astype(np.complex64)


def _frac_delay(x, tau):
    """Frequency-domain fractional delay by tau samples (numpy, f64)."""
    n = len(x)
    f = np.fft.fftfreq(n)
    return np.fft.ifft(np.fft.fft(x) * np.exp(-2j * np.pi * f * tau))


def _make_channel(rng, nsym, tau, phase, cfo, snr_db=25.0):
    """One QPSK channel: RRC-shaped, delayed, rotated, noisy. Returns
    (matched-filtered samples (nsym*SPS,), tx symbol indices (nsym,))."""
    sym = rng.integers(0, 4, nsym)
    up = np.zeros(nsym * SPS, np.complex128)
    up[::SPS] = _PTS[sym]
    taps = rrc_taps(SPS).astype(np.float64)
    x = np.convolve(up, taps, mode="full")[: len(up)]
    x = _frac_delay(x, tau)
    n = np.arange(len(x))
    x = x * np.exp(1j * (phase + cfo * n))
    p_sig = np.mean(np.abs(x) ** 2)
    sigma = np.sqrt(p_sig / (2 * 10 ** (snr_db / 10)))
    x = x + sigma * (rng.standard_normal(len(x))
                     + 1j * rng.standard_normal(len(x)))
    mf = taps / SPS
    y = np.convolve(x, mf, mode="full")[: len(x)]
    return y.astype(np.complex64), sym


def _decide(z):
    ang = np.angle(z)
    return np.floor(ang / (np.pi / 2)).astype(np.int64) % 4


def _best_err(dec, sym, skip, max_lag=24):
    """Min error rate over symbol lag x pi/2 rotation ambiguity."""
    best = 1.0
    for lag in range(max_lag):
        d = dec[skip + lag:]
        t = sym[skip: skip + len(d)]
        m = min(len(d), len(t))
        if m < 200:
            continue
        for rot in range(4):
            errs = np.count_nonzero((d[:m] + rot) % 4 != t[:m])
            best = min(best, errs / m)
    return best


def test_multichannel_convergence(rng):
    C, nsym = 16, 2500
    ys, syms, taus = [], [], []
    for c in range(C):
        tau = rng.uniform(-5.0, 5.0)
        y, sym = _make_channel(rng, nsym, tau, rng.uniform(0, 2 * np.pi),
                               cfo=rng.uniform(-3e-4, 3e-4))
        ys.append(y)
        syms.append(sym)
        taus.append(tau)
    x = jnp.asarray(np.stack(ys, axis=1))           # (n, C)
    init, step = make_multichannel_tracking_step(C, SPS)
    st = init()
    st, z = jax.jit(step)(st, x)
    z = np.asarray(z)                               # (K, C)
    skip = 600
    for c in range(C):
        err = _best_err(_decide(z[:, c]), syms[c], skip)
        assert err < 5e-3, f"channel {c} (tau={taus[c]:.2f}): err={err}"


def test_multichannel_chunk_invariance(rng):
    C, nsym = 4, 1200
    ys = []
    for c in range(C):
        y, _ = _make_channel(rng, nsym, rng.uniform(-3, 3),
                             rng.uniform(0, 2 * np.pi), cfo=1e-4)
        ys.append(y)
    x = jnp.asarray(np.stack(ys, axis=1))
    trk = MultiChannelTracker(C, SPS)
    st = trk.init_state()
    stA, zA = jax.jit(trk.step)(st, x)
    half = (x.shape[0] // (2 * SPS)) * SPS
    st = trk.init_state()
    st, z1 = jax.jit(trk.step)(st, x[:half])
    st, z2 = jax.jit(trk.step)(st, x[half:])
    zB = jnp.concatenate([z1, z2], axis=0)
    np.testing.assert_allclose(np.asarray(zA), np.asarray(zB),
                               rtol=1e-4, atol=1e-4)


def test_block_parallel_single_stream(rng):
    nsym = 8192
    y, sym = _make_channel(rng, nsym, tau=1.3, phase=0.7, cfo=1e-4)
    nblocks = 8
    run = block_parallel_tracker(SPS, nblocks, overlap_syms=192)
    n = (len(y) // (nblocks * SPS)) * (nblocks * SPS)
    z = np.asarray(jax.jit(run)(jnp.asarray(y[:n])))
    # steady state: skip the stream head (segment 0 has no real warmup
    # context, its first kept symbols are still converging)
    err = _best_err(_decide(z), sym, skip=len(z) // 4)
    assert err < 5e-3, f"stitched stream err={err}"
