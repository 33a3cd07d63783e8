"""Round-4 hier/catalog fills QA: analog hiers (am/fm/nbfm/wfm_pll/
squelch), generic PSK/QAM mod-demod loopbacks, GFSK/GMSK loopbacks, and
the new small blocks (converts, correctiq, descramble-phase etc.)."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnuradio_tpu.core.graph import Flowgraph
from gnuradio_tpu.core.runtime import TopBlock
from gnuradio_tpu.core.stream import PortSpec
from gnuradio_tpu.ops.blocks import StreamSource, vector_sink_b, vector_sink_f


def _run_chain(src_data, src_port, *blocks, sink):
    fg = Flowgraph()
    src = StreamSource(src_data, out_port=src_port)
    prev = src
    for b in blocks:
        fg.connect(prev, b)
        prev = b
    fg.connect(prev, sink)
    TopBlock(fg).run()
    return np.asarray(sink.data())


def _tone_snr(out, tone, fs, skip):
    seg = out[skip:]
    t = np.arange(skip, skip + len(seg)) / fs
    A = np.stack([np.sin(2 * np.pi * tone * t),
                  np.cos(2 * np.pi * tone * t), np.ones_like(t)], 1)
    c, *_ = np.linalg.lstsq(A, seg, rcond=None)
    fit = A @ c
    return (10 * np.log10(np.mean(fit ** 2)
                          / np.mean((seg - fit) ** 2) + 1e-30),
            np.hypot(c[0], c[1]))


def test_am_demod_tone():
    from gnuradio_tpu.ops.analog_hier import am_demod_cf
    fs, tone = 200e3, 1000.0
    n = 1 << 17
    t = np.arange(n) / fs
    audio = 0.5 * np.sin(2 * np.pi * tone * t)
    iq = ((1.0 + audio) * np.exp(2j * np.pi * 0.0 * t)).astype(np.complex64)
    out = _run_chain(iq, PortSpec(), am_demod_cf(fs, 4, 5000, 5500),
                     sink=vector_sink_f())
    snr, amp = _tone_snr(out, tone, fs / 4, 2000)
    assert snr > 40, snr
    assert 0.15 < amp < 0.4, amp   # gain 0.5 LPF on 0.5 modulation


def test_fm_demod_and_nbfm_loopback():
    from gnuradio_tpu.ops.analog_hier import nbfm_rx, nbfm_tx
    audio_rate, quad_rate = 16000, 64000
    tone = 800.0
    n = 1 << 15
    t = np.arange(n) / audio_rate
    audio = (0.4 * np.sin(2 * np.pi * tone * t)).astype(np.float32)
    fg = Flowgraph()
    src = StreamSource(audio, out_port=PortSpec(jnp.float32))
    tx = nbfm_tx(audio_rate, quad_rate)
    rx = nbfm_rx(audio_rate, quad_rate)
    snk = vector_sink_f()
    fg.connect(src, tx, rx, snk)
    TopBlock(fg).run()
    out = np.asarray(snk.data())
    snr, amp = _tone_snr(out, tone, audio_rate, 2000)
    assert snr > 25, snr


def test_standard_squelch_gates_silence():
    from gnuradio_tpu.ops.analog_hier import standard_squelch
    fs = 32000
    n = 1 << 15
    t = np.arange(n) / fs
    x = np.where(t < n / fs / 2, 0.5 * np.sin(2 * np.pi * 700 * t),
                 0.002 * np.sin(2 * np.pi * 3500 * t)).astype(np.float32)
    out = _run_chain(x, PortSpec(jnp.float32), standard_squelch(fs),
                     sink=vector_sink_f())
    # voiced half passes (low-band dominant), weak high-band tail gated
    assert np.abs(out[n // 4: n // 2 - 1000]).mean() > 0.05
    assert np.abs(out[-2000:]).mean() < 0.01


def test_wfm_rcv_pll_stereo_tone():
    """Stereo FM: L=1kHz, R=0 -> pilot+DSBSC composite -> wfm_rcv_pll must
    put the tone in BOTH outputs with L-R separation visible."""
    from gnuradio_tpu.ops.analog_hier import WfmRcvPll
    fs = 480e3
    decim = 10
    n = 1 << 19
    t = np.arange(n) / fs
    tone = 1000.0
    left = 0.8 * np.sin(2 * np.pi * tone * t)
    right = np.zeros_like(left)
    pilot = 0.1 * np.sin(2 * np.pi * 19000 * t)
    sub = 0.5 * (left - right) * np.sin(2 * np.pi * 38000 * t)
    comp = 0.5 * (left + right) + pilot + sub
    # FM modulate at 75 kHz deviation
    dev = 75e3
    ph = 2 * np.pi * dev * np.cumsum(comp) / fs
    iq = np.exp(1j * ph).astype(np.complex64)
    fg = Flowgraph()
    src = StreamSource(iq, out_port=PortSpec())
    rx = WfmRcvPll(fs, decim)
    snl, snr_ = vector_sink_f(), vector_sink_f()
    fg.connect(src, rx)
    fg.connect((rx, 0), snl)
    fg.connect((rx, 1), snr_)
    TopBlock(fg).run()
    L = np.asarray(snl.data())
    R = np.asarray(snr_.data())
    sL, aL = _tone_snr(L, tone, fs / decim, 4000)
    sR, aR = _tone_snr(R, tone, fs / decim, 4000)
    assert sL > 20, sL
    # stereo separation: left channel tone clearly stronger than right
    assert aL > 1.5 * aR, (aL, aR)


@pytest.mark.parametrize("m", [2, 4, 8])
def test_generic_psk_mod_demod_loopback(m):
    from gnuradio_tpu.ops.digital_hier import (GenericDemod, GenericMod,
                                               psk_constellation)
    rng = np.random.default_rng(m)
    data = rng.integers(0, 256, 8192).astype(np.uint8).view(np.int8)
    c = psk_constellation(m)
    fg = Flowgraph()
    src = StreamSource(data, out_port=PortSpec(jnp.int8))
    mod = GenericMod(c, True, 4)
    dem = GenericDemod(c, True, 4)
    snk = vector_sink_b()
    fg.connect(src, mod, dem, snk)
    TopBlock(fg).run()
    out = np.asarray(snk.data()).astype(np.int64) & 1
    txb = np.unpackbits(data.view(np.uint8).reshape(-1, 1),
                        axis=1).reshape(-1)
    skip = len(out) // 2
    best = 1.0
    for lag in range(-40, 200):
        t = txb[skip + lag: skip + lag + len(out) - skip]
        r = out[skip: skip + len(t)]
        mm = min(len(t), len(r))
        best = min(best, float(np.mean(r[:mm] != t[:mm])))
    assert best < 0.005, best


def test_qam16_mod_demod_loopback():
    """Non-differential 16QAM locks modulo pi/2 (quadrant ambiguity is the
    packet layer's job — qam_mod docstring), so BER is scored over the 4
    rotation hypotheses applied at symbol level."""
    from gnuradio_tpu.ops.digital_hier import (qam_constellation, qam_demod,
                                               qam_mod)
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, 8192).astype(np.uint8).view(np.int8)
    fg = Flowgraph()
    src = StreamSource(data, out_port=PortSpec(jnp.int8))
    mod = qam_mod(16, samples_per_symbol=4)
    dem = qam_demod(16, samples_per_symbol=4)
    snk = vector_sink_b()
    fg.connect(src, mod, dem, snk)
    TopBlock(fg).run()
    out = np.asarray(snk.data()).astype(np.int64) & 1
    txb = np.unpackbits(data.view(np.uint8).reshape(-1, 1),
                        axis=1).reshape(-1)
    c = qam_constellation(16)
    pts = np.asarray(c.points)
    # label permutation for each pi/2 rotation
    perms = []
    for r in range(4):
        rot = pts * np.exp(1j * np.pi / 2 * r)
        perms.append(np.argmin(np.abs(pts[None, :] - rot[:, None]) ** 2,
                               axis=1))
    nsym = len(out) // 4
    rx_sym = (out[: nsym * 4].reshape(-1, 4)
              * np.array([8, 4, 2, 1])).sum(1)
    skip = nsym // 2
    best = 1.0
    for perm in perms:
        rs = perm[rx_sym]
        rb = np.unpackbits(rs.astype(np.uint8).reshape(-1, 1),
                           axis=1)[:, 4:].reshape(-1)
        for lag in range(-80, 200):
            t = txb[4 * skip + lag: 4 * skip + lag + len(rb) - 4 * skip]
            r = rb[4 * skip: 4 * skip + len(t)]
            mm = min(len(t), len(r))
            best = min(best, float(np.mean(r[:mm] != t[:mm])))
    assert best < 0.01, best


@pytest.mark.parametrize("kind", ["gfsk", "gmsk"])
def test_gfsk_gmsk_mod_demod_loopback(kind):
    from gnuradio_tpu.ops.digital_hier import (gfsk_demod, gfsk_mod,
                                               gmsk_demod, gmsk_mod)
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, 2048).astype(np.uint8).view(np.int8)
    fg = Flowgraph()
    src = StreamSource(data, out_port=PortSpec(jnp.int8))
    mod = gfsk_mod() if kind == "gfsk" else gmsk_mod()
    dem = gfsk_demod() if kind == "gfsk" else gmsk_demod()
    snk = vector_sink_b()
    fg.connect(src, mod, dem, snk)
    TopBlock(fg).run()
    out = np.asarray(snk.data()).astype(np.int64) & 1
    txb = np.unpackbits(data.view(np.uint8).reshape(-1, 1),
                        axis=1).reshape(-1)
    skip = len(out) // 2
    best = 1.0
    for lag in range(-40, 100):
        t = txb[skip + lag: skip + lag + len(out) - skip]
        r = out[skip: skip + len(t)]
        mm = min(len(t), len(r))
        e = float(np.mean(r[:mm] != t[:mm]))
        best = min(best, e, 1 - e)   # slicer polarity ambiguity
    assert best < 0.01, best


def test_converts_roundtrip():
    from gnuradio_tpu.ops.catalog_fills_r4 import (
        char_to_short, complex_to_float, complex_to_interleaved_char,
        interleaved_char_to_complex, short_to_char, swapiq)
    rng = np.random.default_rng(0)
    b = rng.integers(-100, 100, 256).astype(np.int8)
    c2s = char_to_short()
    s, (y,) = c2s.apply(None, (jnp.asarray(b),), None)
    np.testing.assert_array_equal(np.asarray(y), b.astype(np.int32) * 256)
    s2c = short_to_char()
    s, (z,) = s2c.apply(None, (y,), None)
    np.testing.assert_array_equal(np.asarray(z), b)
    x = (rng.standard_normal(64) + 1j * rng.standard_normal(64)
         ).astype(np.complex64) * 30
    ci = complex_to_interleaved_char(scale_factor=1.0)
    s, (ic,) = ci.apply(None, (jnp.asarray(x),), None)
    ic2 = interleaved_char_to_complex(scale_factor=1.0)
    s, (xr,) = ic2.apply(None, (ic,), None)
    assert np.max(np.abs(np.asarray(xr) - np.round(x.real)
                         - 1j * np.round(x.imag))) <= 0.5 + 1e-6
    sw = swapiq()
    s, (y,) = sw.apply(None, (jnp.asarray(x),), None)
    np.testing.assert_allclose(np.asarray(y),
                               x.imag + 1j * x.real, rtol=1e-6)
    cf = complex_to_float()
    s, (re, im) = cf.apply(None, (jnp.asarray(x),), None)
    np.testing.assert_allclose(np.asarray(re), x.real, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(im), x.imag, rtol=1e-6)


def test_correctiq_auto_freezes():
    from gnuradio_tpu.ops.catalog_fills_r4 import CorrectIQAuto
    rng = np.random.default_rng(1)
    dc = 0.7 - 0.3j
    x = (0.1 * (rng.standard_normal(60000)
                + 1j * rng.standard_normal(60000)) + dc
         ).astype(np.complex64)
    b = CorrectIQAuto(samp_rate=1e6, sync_window=0.02)  # settle = 20k
    st = b.init_state()
    st, y = b.work(st, jnp.asarray(x))
    tail = np.asarray(y)[40000:]
    assert abs(tail.mean()) < 0.05, tail.mean()


def test_ber_bf_counts():
    from gnuradio_tpu.ops.catalog_fills_r4 import BerBf
    rng = np.random.default_rng(2)
    a = rng.integers(0, 256, 4096).astype(np.uint8)
    b = a.copy()
    flips = rng.choice(4096, 41, replace=False)
    b[flips] ^= 1                      # 41 single-bit errors
    blk = BerBf()
    st = blk.init_state()
    st, (out,) = blk.apply(st, (jnp.asarray(a.view(np.int8)),
                                jnp.asarray(b.view(np.int8))), None)
    ber = 10 ** float(np.asarray(out)[-1])
    assert abs(ber - 41 / (4096 * 8)) / (41 / (4096 * 8)) < 0.05
