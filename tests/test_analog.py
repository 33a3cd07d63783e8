"""gr-analog op golden tests (qa_quadrature_demod.py / qa_agc.py /
qa_sig_source.py analogs) + WBFM loopback."""
import numpy as np
import pytest

from gnuradio_tpu.core.graph import Flowgraph
from gnuradio_tpu.core.runtime import TopBlock
from gnuradio_tpu.ops import analog, blocks
from gnuradio_tpu.models import wfm

from gr_testing import assert_snr, assert_tuples_almost_equal


def run_graph(src, *chain):
    fg = Flowgraph()
    last = chain[-1]
    snk = blocks.vector_sink(dtype=last.out_ports[0].dtype,
                             vlen=last.out_ports[0].vlen)
    fg.connect(src, *chain, snk)
    TopBlock(fg).run()
    return snk.data()


def test_sig_source_sin_freq():
    """sig_source_f produces the requested tone (qa_sig_source analog)."""
    fs, f0, n = 8000.0, 440.0, 4096
    fg = Flowgraph()
    src = analog.sig_source_f(fs, analog.GR_SIN_WAVE, f0, 1.0)
    hd = blocks.head(n, np.float32)
    snk = blocks.vector_sink_f()
    fg.connect(src, hd, snk)
    TopBlock(fg).run()
    y = snk.data()
    assert len(y) == n
    t = np.arange(n) / fs
    ref = np.sin(2 * np.pi * f0 * t)
    # fxpt phase quantization: freq accurate to 2^-32*fs
    assert_snr(y, ref, 80)


def test_sig_source_complex_const():
    fg = Flowgraph()
    src = analog.sig_source_c(8000, analog.GR_CONST_WAVE, 0, 1.5)
    hd = blocks.head(100, np.complex64)
    snk = blocks.vector_sink_c()
    fg.connect(src, hd, snk)
    TopBlock(fg).run()
    assert_tuples_almost_equal(snk.data(), np.full(100, 1.5 + 0j), 5)


def test_quadrature_demod(rng):
    """qa_quadrature_demod.py analog: known frequency ramp."""
    fs = 8000.0
    f0 = 1000.0
    n = 1000
    t = np.arange(n)
    x = np.exp(1j * 2 * np.pi * f0 / fs * t).astype(np.complex64)
    gain = 1.0
    y = run_graph(blocks.vector_source_c(x), analog.quadrature_demod_cf(gain))
    # steady-state: arg(x[n] conj(x[n-1])) = 2*pi*f0/fs
    expected = 2 * np.pi * f0 / fs
    assert_tuples_almost_equal(y[2:], np.full(n - 2, expected, np.float32), 4)


def test_frequency_modulator_roundtrip(rng):
    """fm mod -> quadrature demod recovers the message."""
    n = 5000
    msg = np.sin(2 * np.pi * 3.0 * np.arange(n) / n).astype(np.float32) * 0.7
    sens = 0.5
    fg = Flowgraph()
    src = blocks.vector_source_f(msg)
    mod = analog.frequency_modulator_fc(sens)
    dem = analog.quadrature_demod_cf(1.0 / sens)
    snk = blocks.vector_sink_f()
    fg.connect(src, mod, dem, snk)
    TopBlock(fg).run()
    y = snk.data()
    # demod output lags by one sample (uses x[n]*conj(x[n-1]))
    assert_snr(y[1:], msg[:-1], 40)


def test_agc_converges(rng):
    """qa_agc.py analog: steady-state amplitude hits the reference level."""
    n = 4000
    x = (0.25 * np.exp(1j * 2 * np.pi * 0.01 * np.arange(n))).astype(np.complex64)
    y = run_graph(blocks.vector_source_c(x),
                  analog.agc_cc(rate=1e-2, reference=1.0, gain=1.0))
    mag = np.abs(y[-500:])
    np.testing.assert_allclose(mag, 1.0, atol=0.02)


def test_agc2_converges(rng):
    n = 4000
    x = (3.0 * np.exp(1j * 2 * np.pi * 0.01 * np.arange(n))).astype(np.complex64)
    y = run_graph(blocks.vector_source_c(x),
                  analog.agc2_cc(attack_rate=1e-1, decay_rate=1e-2,
                                 reference=1.0, gain=1.0))
    mag = np.abs(y[-500:])
    np.testing.assert_allclose(mag, 1.0, atol=0.05)


def test_noise_source_stats():
    fg = Flowgraph()
    src = analog.noise_source_c("gaussian", amplitude=2.0, seed=7)
    hd = blocks.head(50000, np.complex64)
    snk = blocks.vector_sink_c()
    fg.connect(src, hd, snk)
    TopBlock(fg).run()
    y = snk.data()
    # complex amplitude a -> E|y|^2 = a^2
    assert abs(np.mean(np.abs(y) ** 2) - 4.0) < 0.2
    assert abs(np.mean(y)) < 0.05


def test_wbfm_loopback():
    """End-to-end: synthesize WBFM at 1 Msps, receive with the full chain,
    compare recovered audio to the message (BASELINE config #1 QA)."""
    samp_rate = 1_000_000.0
    quad_rate = 250_000.0
    audio_rate = 50_000.0
    max_dev = 75_000.0
    dur = 0.05
    n = int(samp_rate * dur)
    t = np.arange(n) / samp_rate
    msg = (0.5 * np.sin(2 * np.pi * 1000 * t)
           + 0.3 * np.sin(2 * np.pi * 2500 * t)).astype(np.float64)
    # FM modulate at samp_rate (float64 host reference modulator)
    sens = 2 * np.pi * max_dev / samp_rate
    phase = np.cumsum(msg) * sens
    iq = np.exp(1j * phase).astype(np.complex64)

    tb, snk = wfm.wfm_rcv_graph(iq, samp_rate, quad_rate, audio_rate,
                                center_freq=0.0, max_dev=max_dev)
    tb.run()
    audio = snk.data()
    decim = int(samp_rate / audio_rate)
    expect_n = n // decim
    assert abs(len(audio) - expect_n) <= 1

    # reference audio: the message lowpassed+deemphasized; instead of exact
    # filter modeling, correlate against the decimated message and require
    # high correlation (group-delay aligned)
    m_dec = msg[::decim][: len(audio)]
    a = audio - audio.mean()
    b = m_dec - m_dec.mean()
    lags = np.arange(-50, 51)
    corr = max(abs(np.corrcoef(np.roll(a, k)[100:-100], b[100:-100])[0, 1])
               for k in lags)
    assert corr > 0.95, f"audio correlation {corr:.3f}"
