"""QA for analog_extra: PLLs, squelch, probes, CPFSK (gr-analog QA style:
synthesize signals, check tracking/gating behavior numerically)."""
import numpy as np
import jax.numpy as jnp

from gnuradio_tpu import Flowgraph, TopBlock
from gnuradio_tpu.ops import blocks as blk
from gnuradio_tpu.ops import analog_extra as ax


def run_graph(*chain, target_items=16384):
    fg = Flowgraph()
    fg.connect(*chain)
    TopBlock(fg, target_items=target_items).run()


def test_pll_freqdet_tracks_carrier():
    """qa_pll_freqdet analog: feed a pure carrier, freq output converges to
    the true per-sample phase increment."""
    w = 0.2  # rad/sample
    n = 20000
    x = np.exp(1j * w * np.arange(n)).astype(np.complex64)
    src = blk.vector_source(x)
    pll = ax.pll_freqdet_cf(2 * np.pi / 100, 0.5, -0.5)
    snk = blk.vector_sink_f()
    run_graph(src, pll, snk)
    out = snk.data()
    assert abs(np.mean(out[-2000:]) - w) < 1e-3


def test_pll_carriertracking_derotates():
    w = 0.1
    n = 20000
    x = np.exp(1j * (w * np.arange(n) + 0.7)).astype(np.complex64)
    src = blk.vector_source(x)
    pll = ax.pll_carriertracking_cc(2 * np.pi / 100, 0.5, -0.5)
    snk = blk.vector_sink_c()
    run_graph(src, pll, snk)
    out = snk.data()
    # after lock the output should sit near a constant (angle variance -> 0)
    ang = np.angle(out[-2000:])
    assert np.std(ang) < 0.05


def test_pll_refout_reproduces_carrier():
    w = 0.15
    n = 20000
    x = np.exp(1j * w * np.arange(n)).astype(np.complex64)
    src = blk.vector_source(x)
    pll = ax.pll_refout_cc(2 * np.pi / 100, 0.5, -0.5)
    snk = blk.vector_sink_c()
    run_graph(src, pll, snk)
    out = snk.data()
    d = out[-2000:] * np.conj(x[-2000:])
    assert np.std(np.angle(d)) < 0.05


def test_simple_squelch_gates_noise_floor(rng):
    strong = np.exp(1j * 0.1 * np.arange(5000)).astype(np.complex64)
    weak = (0.001 * (rng.standard_normal(5000) + 1j * rng.standard_normal(5000))
            ).astype(np.complex64)
    x = np.concatenate([strong, weak])
    src = blk.vector_source(x)
    sq = ax.simple_squelch_cc(-20.0, alpha=0.01)
    snk = blk.vector_sink_c()
    run_graph(src, sq, snk)
    out = snk.data()
    assert np.abs(out[2000:5000]).mean() > 0.9   # open on carrier
    assert np.abs(out[7000:]).mean() < 1e-6      # closed on noise floor


def test_pwr_squelch_ramp(rng):
    x = np.concatenate([np.zeros(5000), np.ones(5000)]).astype(np.float32)
    src = blk.vector_source(x, dtype=jnp.float32)
    sq = ax.pwr_squelch_ff(-10.0, alpha=0.01, ramp=100)
    snk = blk.vector_sink_f()
    run_graph(src, sq, snk)
    out = snk.data()
    assert np.all(out[:4000] == 0)
    assert out[-1] > 0.95  # fully open at the end


def test_ctcss_squelch():
    fs = 8000.0
    tone = np.sin(2 * np.pi * 100.0 * np.arange(8192) / fs)
    audio = 0.3 * np.sin(2 * np.pi * 1000.0 * np.arange(8192) / fs)
    with_tone = (audio + 0.15 * tone).astype(np.float32)
    without = audio.astype(np.float32)
    for x, should_pass in [(with_tone, True), (without, False)]:
        src = blk.vector_source(x, dtype=jnp.float32)
        sq = ax.ctcss_squelch_ff(fs, 100.0, level=0.01)
        snk = blk.vector_sink_f()
        run_graph(src, sq, snk, target_items=8192)
        out = snk.data()
        if should_pass:
            assert np.abs(out).max() > 0.1
        else:
            assert np.abs(out).max() == 0.0


def test_probe_avg_mag_sqrd():
    x = (0.5 * np.ones(10000)).astype(np.complex64)
    src = blk.vector_source(x)
    probe = ax.probe_avg_mag_sqrd_c(threshold_db=-10, alpha=0.01)
    fg = Flowgraph()
    fg.connect(src, probe)
    TopBlock(fg, target_items=10000).run()  # chunks divide the stream
    assert abs(probe.level() - 0.25) < 0.01
    assert probe.unmuted()


def test_fmdet_recovers_tone():
    fs = 48000.0
    tone = 0.8 * np.sin(2 * np.pi * 1000 * np.arange(48000) / fs)
    dev = 5000.0
    phase = 2 * np.pi * dev * np.cumsum(tone) / fs
    iq = np.exp(1j * phase).astype(np.complex64)
    src = blk.vector_source(iq)
    det = ax.fmdet_cf(fs, -dev, dev)
    snk = blk.vector_sink_f()
    run_graph(src, det, snk)
    out = snk.data()[1000:]
    ref = tone[1000:]
    # correlation with the original tone should be ~1
    c = np.corrcoef(out, ref)[0, 1]
    assert c > 0.99


def test_cpfsk_constant_envelope_and_phase_steps(rng):
    bits = rng.integers(0, 2, 64).astype(np.int8)
    src = blk.vector_source(bits, dtype=jnp.int8)
    mod = ax.cpfsk_bc(1.0, 1.0, 4)
    snk = blk.vector_sink_c()
    run_graph(src, mod, snk)
    out = snk.data()
    assert len(out) == 64 * 4
    np.testing.assert_allclose(np.abs(out), 1.0, atol=1e-5)
    # phase advances pi*k/(2*sps) per sample, sign per bit
    dph = np.angle(out[1:] * np.conj(out[:-1]))
    step = np.pi / 8
    signs = np.where(np.repeat(bits, 4)[1:] == 1, 1.0, -1.0)
    np.testing.assert_allclose(dph, signs * step, atol=1e-4)


def test_feedforward_agc(rng):
    x = (0.1 * np.exp(1j * 0.05 * np.arange(4096))).astype(np.complex64)
    src = blk.vector_source(x)
    agc = ax.feedforward_agc_cc(16, reference=1.0)
    snk = blk.vector_sink_c()
    run_graph(src, agc, snk)
    out = snk.data()
    np.testing.assert_allclose(np.abs(out[:-16]), 1.0, atol=1e-4)


def test_fastnoise_and_random_sources():
    src = ax.fastnoise_source_c(ampl=2.0, seed=1)
    hd = blk.head(20000, jnp.complex64)
    snk = blk.vector_sink_c()
    run_graph(src, hd, snk)
    out = snk.data()
    assert len(out) == 20000
    assert abs(np.std(out) - 2.0) < 0.15

    rsrc = ax.random_uniform_source_b(0, 4, seed=2)
    hd2 = blk.head(5000, jnp.int8)
    snk2 = blk.vector_sink_b()
    run_graph(rsrc, hd2, snk2)
    vals = snk2.data()
    assert set(np.unique(vals)) <= {0, 1, 2, 3}
    assert len(np.unique(vals)) == 4
