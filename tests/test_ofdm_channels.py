"""OFDM loopback (config #4) and channel-model QA."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnuradio_tpu.models.ofdm import ofdm_tx_burst, ofdm_rx_burst
from gnuradio_tpu.ops.ofdm import (default_occupied_carriers,
                                   schmidl_cox_metric)
from gnuradio_tpu.ops.channels import (ChannelModel, FadingModel,
                                       SelectiveFadingModel, SroModel)


def _burst(rng, nframes=20):
    n_occ = len(default_occupied_carriers())
    sym = rng.integers(0, 4, n_occ * nframes).astype(np.int32)
    iq, nf = ofdm_tx_burst(sym)
    return np.asarray(iq), sym, nf


def test_ofdm_loopback_clean(rng):
    iq, sym, nf = _burst(rng)
    idx, diag = ofdm_rx_burst(jnp.asarray(iq), nf)
    assert np.mean(np.asarray(idx) != sym) == 0.0


def test_ofdm_loopback_impaired(rng):
    iq, sym, nf = _burst(rng)
    t = np.arange(len(iq))
    ch = np.convolve(iq, [1.0, 0.0, 0.15 + 0.1j], mode="full")[: len(iq)]
    ch = ch * np.exp(1j * (0.005 * t + 0.3))
    ch = ch + (rng.standard_normal(len(iq))
               + 1j * rng.standard_normal(len(iq))) * 0.02
    idx, diag = ofdm_rx_burst(jnp.asarray(ch.astype(np.complex64)), nf)
    assert np.mean(np.asarray(idx) != sym) < 0.005
    assert abs(float(diag["fine_cfo"]) - 0.005) < 2e-3


def test_ofdm_through_channel_model_block(rng):
    """Loopback via the gr-channels ChannelModel block (reference's
    ofdm_loopback.grc wiring)."""
    iq, sym, nf = _burst(rng)
    cm = ChannelModel(noise_voltage=0.01, frequency_offset=0.001,
                      taps=(1.0, 0.0, 0.1 + 0.05j), noise_seed=3)
    st = cm.init_state()
    st, y = cm.work(st, jnp.asarray(iq))
    idx, _ = ofdm_rx_burst(y, nf)
    assert np.mean(np.asarray(idx) != sym) < 0.005


def test_schmidl_cox_plateau_position(rng):
    iq, sym, nf = _burst(rng)
    M, P = schmidl_cox_metric(jnp.asarray(iq))
    M = np.asarray(M)
    # plateau of ~CP length with M ~ 1 must sit at the padded signal start
    plateau = np.where(M > 0.9)[0]
    assert len(plateau) >= 8
    assert 80 <= plateau[0] <= 116


def test_fading_model_statistics():
    f = FadingModel(N=8, fDTs=0.01, LOS=False, seed=1)
    h = np.asarray(f.gains(jnp.zeros((), jnp.int32), 65536))
    # Rayleigh: E|h|^2 ~ 1, complex gaussian-ish
    assert abs(np.mean(np.abs(h) ** 2) - 1.0) < 0.3
    assert abs(np.mean(h.real)) < 0.1
    # time-varying (doppler): autocorrelation decays
    ac = np.abs(np.vdot(h[:-500], h[500:]) / np.vdot(h[:-500], h[:-500]))
    assert ac < 0.9


def test_fading_chunk_invariance():
    f = FadingModel(N=8, fDTs=0.002, seed=2)
    x = jnp.ones(4096, jnp.complex64)
    st = f.init_state()
    st, y1 = f.work(st, x)
    st2 = f.init_state()
    outs = []
    for k in range(4):
        st2, y = f.work(st2, x[k * 1024:(k + 1) * 1024])
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.asarray(y1), np.concatenate(outs),
                               rtol=0, atol=1e-4)


def test_selective_fading_runs(rng):
    f = SelectiveFadingModel(N=8, fDTs=0.005, seed=4,
                             delays=(0.0, 1.5, 3.0), mags=(1.0, 0.4, 0.2))
    x = (rng.standard_normal(2048) + 1j * rng.standard_normal(2048)
         ).astype(np.complex64)
    st = f.init_state()
    st, y = f.work(st, jnp.asarray(x))
    y = np.asarray(y)
    assert y.shape == x.shape
    assert np.all(np.isfinite(y))


def test_sro_model_resamples(rng):
    eps = 1.0005
    f0 = 0.01  # cycles/sample
    n = 8192
    x = np.exp(2j * np.pi * f0 * np.arange(n)).astype(np.complex64)
    b = SroModel(epsilon=eps)
    st = b.init_state()
    st, y = b.work(st, jnp.asarray(x))
    y = np.asarray(y)[100:]
    # output tone frequency scales by eps
    ph = np.unwrap(np.angle(y))
    f_meas = (ph[-1] - ph[0]) / (len(ph) - 1) / (2 * np.pi)
    assert abs(f_meas - f0 * eps) < 1e-5
