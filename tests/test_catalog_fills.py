"""QA for the catalog gap fills: blocks_extra3, filter_extra,
digital_packet2, trellis_turbo — golden-vector pattern per SURVEY.md §4."""
import numpy as np
import pytest

from gnuradio_tpu.core.runtime import TopBlock
from gnuradio_tpu.core.stream import PortSpec, B, S, F, C
from gnuradio_tpu.core.tags import Tag
from gnuradio_tpu.ops import blocks as blk
from gnuradio_tpu.ops import blocks_extra3 as bx3
from gnuradio_tpu.ops import filter_extra as fx
from gnuradio_tpu.ops import digital_packet2 as dp2
from gnuradio_tpu.ops import trellis as tr
from gnuradio_tpu.ops import trellis_turbo as tt
from gnuradio_tpu.ops import firdes


def run_chain(data, *mid, dtype=C, out_sink=None, tags=None):
    src = blk.StreamSource(np.asarray(data), PortSpec(dtype), tags=tags)
    snk = out_sink or blk.VectorSink(mid[-1].out_ports[0])
    tb = TopBlock()
    tb.connect(src, *mid, snk)
    tb.run()
    return snk


# ---------------------------------------------------------------------------
# blocks_extra3
# ---------------------------------------------------------------------------

def test_uchar_to_float():
    x = np.arange(256, dtype=np.uint8).view(np.int8)
    snk = run_chain(x, bx3.uchar_to_float(), dtype=B)
    np.testing.assert_allclose(snk.data(), np.arange(256, dtype=np.float32))


def test_vector_map():
    x = np.arange(32, dtype=np.float32).reshape(8, 4)
    vm = bx3.vector_map(F, 4, [3, 0])
    src = blk.StreamSource(x, PortSpec(F, 4))
    snk = blk.VectorSink(PortSpec(F, 2))
    tb = TopBlock()
    tb.connect(src, vm, snk)
    tb.run()
    np.testing.assert_allclose(snk.data(), x[:, [3, 0]])


def test_vector_insert():
    ins = np.array([9, 9, 9], dtype=np.float32)
    vi = bx3.vector_insert_f(ins, periodicity=8, offset=2)
    x = np.arange(20, dtype=np.float32)
    snk = run_chain(x, vi, dtype=F)
    got = snk.data()
    # frames of 8: [x0 x1 9 9 9 x2 x3 x4] ...
    assert len(got) == 32
    np.testing.assert_allclose(got[:8], [0, 1, 9, 9, 9, 2, 3, 4])
    np.testing.assert_allclose(got[8:16], [5, 6, 9, 9, 9, 7, 8, 9])


def test_annotator_tags_propagate():
    ann = bx3.annotator_alltoall(when=100, dtype=F)
    x = np.zeros(1000, dtype=np.float32)
    snk = run_chain(x, ann, dtype=F)
    keys = [t for t in snk.tags() if t.key == ann.name]
    assert len(keys) == 10
    assert [t.offset for t in keys] == list(range(0, 1000, 100))
    assert [t.value for t in keys] == list(range(10))


def test_annotator_raw_inserts_at_offsets():
    ann = bx3.annotator_raw(F)
    ann.add_tag(7, "mark", 42)
    snk = run_chain(np.zeros(64, np.float32), ann, dtype=F)
    got = [t for t in snk.tags() if t.key == "mark"]
    assert len(got) == 1 and got[0].offset == 7 and got[0].value == 42


def test_lfsr_32k_roundtrip():
    src = bx3.lfsr_32k_source_s(repeat=True)
    head = blk.Head(5000, PortSpec(S))
    chk = bx3.check_lfsr_32k_s()
    tb = TopBlock()
    tb.connect(src, head, chk)
    tb.run()
    st = chk.stats()
    assert st["ntotal"] == 5000
    assert st["nright"] == 5000  # clean channel: every word right


def test_multiply_by_tag_value():
    n = 4096
    x = np.ones(n, dtype=np.complex64)
    tags = [Tag(0, "gain", 2.0, "t"), Tag(1000, "gain", 0.5, "t"),
            Tag(3000, "gain", 4.0, "t")]
    m = bx3.multiply_by_tag_value_cc("gain", initial=1.0)
    snk = run_chain(x, m, dtype=C, tags=tags)
    y = snk.data()
    np.testing.assert_allclose(y[:1000], 2.0)
    np.testing.assert_allclose(y[1000:3000], 0.5)
    np.testing.assert_allclose(y[3000:], 4.0)


def test_tagged_stream_multiply_length_and_tsb_sink():
    n = 64
    x = np.arange(n, dtype=np.complex64)
    tags = [Tag(0, "packet_len", 8, "s"), Tag(16, "packet_len", 8, "s")]
    tsml = bx3.tagged_stream_multiply_length(2.0)
    sink = bx3.tsb_vector_sink(C)
    run_chain(x, tsml, dtype=C, out_sink=sink, tags=tags)
    pkts = sink.packets()
    assert len(pkts) == 2 and len(pkts[0]) == 16
    np.testing.assert_allclose(pkts[1], x[16:32])


def test_tagged_stream_mux_host():
    a = np.arange(8, dtype=np.complex64)
    b = 100 + np.arange(8, dtype=np.complex64)
    ta = [Tag(0, "packet_len", 4, ""), Tag(4, "packet_len", 4, "")]
    data, tags = bx3.tagged_stream_mux([(a, ta), (b, ta)])
    np.testing.assert_allclose(data[:8],
                               np.r_[a[:4], b[:4]])
    assert [t.offset for t in tags] == [0, 4, 8, 12]


def test_tags_strobe():
    src = bx3.tags_strobe(nsamps=256, key="k", value=7, dtype=F)
    head = blk.Head(1024, PortSpec(F))
    snk = blk.VectorSink(PortSpec(F))
    tb = TopBlock()
    tb.connect(src, head, snk)
    tb.run()
    got = [t for t in snk.tags() if t.key == "k"]
    assert [t.offset for t in got] == [0, 256, 512, 768]


def test_random_pdu_and_socket_pdu_loopback():
    srv = bx3.socket_pdu("TCP_SERVER")
    cli = bx3.socket_pdu("TCP_CLIENT", port=srv.port)
    payload = np.arange(32, dtype=np.uint8)
    import gnuradio_tpu.core.pmt as pmt
    cli._send(pmt.make_pdu({}, payload))
    # poll server for delivery
    import time
    for _ in range(100):
        srv.msg_work(0)
        if srv._msg_outbox:
            break
        time.sleep(0.02)
    out = srv.drain_outbox()
    assert out, "server received nothing"
    _, data = out[0][1]
    np.testing.assert_array_equal(data, payload)
    srv.close(), cli.close()

    rp = bx3.random_pdu(10, 20, seed=1)
    rp._on(None)
    (_, msg), = [m for _, m in rp.drain_outbox()]
    assert 10 <= len(msg) <= 20


def test_bin_statistics():
    x = np.random.default_rng(0).standard_normal((64, 16)).astype(np.float32)
    src = blk.StreamSource(x, PortSpec(F, 16))
    bs = bx3.bin_statistics_f(16)
    tb = TopBlock()
    tb.connect(src, bs)
    tb.run()
    np.testing.assert_allclose(bs.max_bins(), x.max(axis=0), rtol=1e-6)


# ---------------------------------------------------------------------------
# filter_extra
# ---------------------------------------------------------------------------

def test_filter_delay_matches_hilbert_pair():
    taps = firdes.hilbert(31)
    fd = fx.filter_delay_fc(taps)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(512).astype(np.float32)
    snk = run_chain(x, fd, dtype=F)
    y = snk.data()
    d = (len(taps) - 1) // 2
    # real part: input delayed by group delay
    np.testing.assert_allclose(y.real[d:400], x[:400 - d], atol=1e-5)
    # imag part: hilbert FIR of input
    ref = np.convolve(np.r_[np.zeros(len(taps) - 1), x], taps,
                      "valid")[: len(x)]
    np.testing.assert_allclose(y.imag, ref, atol=1e-4)


def test_ival_decimator():
    # flat interleaved I/Q short stream (the reference block's plain
    # char/short ports): keep the first pair of every D pairs
    x = np.arange(40, dtype=np.int16)
    src = blk.StreamSource(x, PortSpec(S))
    snk = blk.VectorSink(PortSpec(S))
    tb = TopBlock()
    tb.connect(src, fx.ival_decimator(4), snk)
    tb.run()
    np.testing.assert_array_equal(snk.data(),
                                  x.reshape(-1, 8)[:, :2].reshape(-1))


def test_freq_xlating_fft_filter_matches_fir_version():
    from gnuradio_tpu.ops.filter import freq_xlating_fir_filter_ccf
    fs, fc = 1e6, 100e3
    taps = firdes.low_pass(1.0, fs, 100e3, 40e3)
    rng = np.random.default_rng(5)
    x = (rng.standard_normal(8192) + 1j * rng.standard_normal(8192)
         ).astype(np.complex64)
    a = run_chain(x, fx.freq_xlating_fft_filter_ccc(4, taps, fc, fs)).data()
    b = run_chain(x, freq_xlating_fir_filter_ccf(4, taps, fc, fs)).data()
    assert len(a) == len(b)
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_filterbank_vcvcf():
    taps = [np.array([1.0]), np.array([0.0, 1.0]), np.array([0.5, 0.5])]
    fb = fx.filterbank_vcvcf(taps)
    rng = np.random.default_rng(7)
    x = (rng.standard_normal((64, 3)) + 1j * rng.standard_normal((64, 3))
         ).astype(np.complex64)
    src = blk.StreamSource(x, PortSpec(C, 3))
    snk = blk.VectorSink(PortSpec(C, 3))
    tb = TopBlock()
    tb.connect(src, fb, snk)
    tb.run()
    y = snk.data()
    np.testing.assert_allclose(y[:, 0], x[:, 0], atol=1e-5)          # identity
    np.testing.assert_allclose(y[1:, 1], x[:-1, 1], atol=1e-5)       # delay 1
    np.testing.assert_allclose(y[1:, 2], 0.5 * (x[1:, 2] + x[:-1, 2]),
                               atol=1e-5)


# ---------------------------------------------------------------------------
# digital_packet2
# ---------------------------------------------------------------------------

def test_pn_correlator_peaks_on_matched_slipping_pn():
    # The reference retards the PN one chip per output period
    # (pn_correlator_cc_impl.cc work: generator held at j==0), so period k
    # correlates against roll(pn, 1+k) with bits mapped 2b-1. Feed exactly
    # that slipping sequence -> every output is a perfect +1 correlation.
    deg = 5
    L = (1 << deg) - 1
    bits = dp2.glfsr_bits(deg)
    pn = (2.0 * bits - 1.0).astype(np.complex64)
    x = np.concatenate([np.roll(pn, 1 + k) for k in range(8)])
    snk = run_chain(x, dp2.pn_correlator_cc(deg), dtype=C)
    y = snk.data()
    np.testing.assert_allclose(y, 1.0, atol=1e-5)  # perfect correlation


def test_pn_correlator_fixed_input_decorrelates():
    # A non-slipping (fixed-phase) PN input must NOT stay at +1: the
    # correlator's reference slides one chip per period (m-sequence
    # autocorrelation off-peak = -1/L).
    deg = 5
    L = (1 << deg) - 1
    bits = dp2.glfsr_bits(deg)
    pn = (2.0 * bits - 1.0).astype(np.complex64)
    x = np.tile(np.roll(pn, 1), 4)  # aligned with period 0 only
    snk = run_chain(x, dp2.pn_correlator_cc(deg), dtype=C)
    y = snk.data()
    np.testing.assert_allclose(y[0], 1.0, atol=1e-5)
    np.testing.assert_allclose(y[1:].real, -1.0 / L, atol=1e-5)


def test_simple_framer_correlator_roundtrip():
    P = 16
    rng = np.random.default_rng(11)
    payload = rng.integers(0, 256, 4 * P, dtype=np.uint8)
    fr = dp2.simple_framer(P)
    corr = dp2.simple_correlator(P)
    run_chain(payload.view(np.int8), fr, dtype=B, out_sink=corr)
    frames, seqs = corr.frames()
    assert len(frames) == 4
    assert seqs == [0, 1, 2, 3]
    np.testing.assert_array_equal(np.concatenate(frames), payload)


def test_packet_sink_finds_packets():
    payload = np.arange(5, dtype=np.uint8)
    code = np.unpackbits(np.frombuffer(
        (0xACDDA4E2F28C20FC).to_bytes(8, "big"), np.uint8))
    hdr = (len(payload) << 16) | len(payload)
    hdr_bits = np.array([(hdr >> i) & 1 for i in range(31, -1, -1)], np.uint8)
    pl_bits = np.unpackbits(payload)
    stream = np.r_[np.zeros(13, np.uint8), code, hdr_bits, pl_bits,
                   np.zeros(40, np.uint8)]
    ps = dp2.packet_sink()
    ps.collect(stream)
    pkts = ps.decode()
    assert len(pkts) == 1
    np.testing.assert_array_equal(pkts[0], payload)


def test_framer_sink_1():
    payload = np.array([1, 2, 3], dtype=np.uint8)
    hdr = (3 << 16) | 3
    bits = np.r_[
        np.array([(hdr >> i) & 1 for i in range(31, -1, -1)], np.uint8),
        np.unpackbits(payload)]
    flagged = bits.copy()
    stream = np.r_[np.zeros(5, np.uint8), flagged]
    stream[5] |= 2  # access-code flag on the first header bit
    fs = dp2.framer_sink_1()
    fs.collect(stream)
    pkts = fs.decode()
    assert len(pkts) == 1
    np.testing.assert_array_equal(pkts[0], payload)


def test_header_format_family():
    f = dp2.HeaderFormatDefault()
    bits = f.format(100)
    plen, ok = f.parse(bits)
    assert ok and plen == 100

    c = dp2.HeaderFormatCounter(bps=2)
    b0, b1 = c.format(10), c.format(10)
    d0, ok0 = c.parse(b0)
    d1, ok1 = c.parse(b1)
    assert ok0 and ok1 and d0["counter"] == 0 and d1["counter"] == 1
    assert d0["bps"] == 2 and d0["payload_bytes"] == 10

    h = dp2.HeaderFormatCrc()
    bits = h.format(77)
    d, ok = dp2.HeaderFormatCrc.parse(bits)
    assert ok and d["payload_bytes"] == 77
    bits2 = np.array(bits).copy()
    bits2[0] ^= 1
    _, ok2 = dp2.HeaderFormatCrc.parse(bits2)
    assert not ok2


def test_protocol_formatter_async():
    import gnuradio_tpu.core.pmt as pmt
    pf = dp2.protocol_formatter_async(dp2.HeaderFormatCrc())
    pf._on(pmt.make_pdu({}, np.arange(9, dtype=np.uint8)))
    msgs = dict()
    for port, (meta, data) in pf.drain_outbox():
        msgs[port] = data
    assert set(msgs) == {"header", "payload"}
    d, ok = dp2.HeaderFormatCrc.parse(np.unpackbits(msgs["header"]))
    assert ok and d["payload_bytes"] == 9


def test_protocol_formatter_bb_stream():
    fmt = dp2.HeaderFormatCrc()
    pf = dp2.protocol_formatter_bb(fmt, payload_bytes=8)
    data = np.zeros(32, dtype=np.int8)
    snk = run_chain(data, pf, dtype=B)
    hdrs = snk.data().view(np.uint8)
    assert len(hdrs) == 16  # 4 packets x 4 header bytes
    d, ok = dp2.HeaderFormatCrc.parse(np.unpackbits(hdrs[:4]))
    assert ok and d["payload_bytes"] == 8 and d["number"] == 0
    d2, _ = dp2.HeaderFormatCrc.parse(np.unpackbits(hdrs[4:8]))
    assert d2["number"] == 1


def test_kurtotic_equalizer_stable_on_qpsk():
    rng = np.random.default_rng(17)
    sym = (rng.integers(0, 2, 4096) * 2 - 1 +
           1j * (rng.integers(0, 2, 4096) * 2 - 1)).astype(np.complex64)
    sym /= np.sqrt(2)
    eq = dp2.kurtotic_equalizer_cc(num_taps=5, mu=0.002)
    snk = run_chain(sym, eq, dtype=C)
    y = snk.data()[2048:]
    # converged: unit modulus preserved within a loose bound, no blow-up
    assert np.all(np.isfinite(y))
    assert abs(np.mean(np.abs(y) ** 2) - 1.0) < 0.3


def test_probe_density():
    pd = dp2.probe_density_b(0.9)
    pd.collect(np.ones(200, dtype=np.uint8))
    assert pd.density() > 0.99


def test_modulate_vector():
    from gnuradio_tpu.ops.digital import chunks_to_symbols_bc
    pts = np.array([1 + 0j, -1 + 0j], dtype=np.complex64)
    data = np.array([0, 1, 1, 0], dtype=np.int8)
    y = dp2.modulate_vector_bc(chunks_to_symbols_bc(pts), data)
    np.testing.assert_allclose(y, pts[[0, 1, 1, 0]])


# ---------------------------------------------------------------------------
# trellis_turbo
# ---------------------------------------------------------------------------

def _awgn(sym, snr_db, rng):
    p = np.mean(np.abs(sym) ** 2)
    n0 = p / (10 ** (snr_db / 10))
    return sym + np.sqrt(n0 / 2) * (rng.standard_normal(len(sym)) +
                                    1j * rng.standard_normal(len(sym)))


def test_sccc_pccc_loopback():
    # small FSM: I=2, S=2, O=2 accumulator (differential) code
    NS = np.array([[0, 1], [1, 0]])
    OS = np.array([[0, 1], [1, 0]])
    f = tr.FSM(2, 2, 2, NS, OS)
    K = 128
    rng = np.random.default_rng(23)
    data = rng.integers(0, 2, K).astype(np.int32)
    perm = np.asarray(tr.make_interleaver(K, seed=1))

    # SCCC: encode, map O=2 -> BPSK, add light noise, decode
    enc = np.asarray(tt.sccc_encode(f, f, perm, data))
    tx = (1.0 - 2.0 * enc).astype(np.complex64)
    rx = _awgn(tx, 10.0, rng).astype(np.complex64)
    table = np.array([[1.0 + 0j], [-1.0 + 0j]], np.complex64)
    dec = np.asarray(tt.sccc_decode_combined(f, f, perm, rx, table, 1,
                                             niterations=4))
    assert (dec == data).mean() > 0.95

    # PCCC
    enc2 = np.asarray(tt.pccc_encode(f, f, perm, data))
    pts = np.exp(2j * np.pi * np.arange(4) / 4).astype(np.complex64)
    tx2 = pts[enc2]
    rx2 = _awgn(tx2, 10.0, rng).astype(np.complex64)
    dec2 = np.asarray(tt.pccc_decode_combined(
        f, f, perm, rx2, pts.reshape(4, 1), 1, niterations=4))
    assert (dec2 == data).mean() > 0.95


def test_sccc_conv_outer_strong_code():
    """SCCC with a real rate-1/2 conv outer code + differential inner —
    the classic serially-concatenated convolutional structure; clean-channel
    decode must be exact."""
    fo = tr.FSM.from_generator(1, 2, [0o7, 0o5])   # I=2, O=4
    NSi = np.array([[0, 1], [1, 0]])
    OSi = np.array([[0, 1], [1, 0]])
    # inner must accept O=4 inputs: use a 4-ary accumulator FSM
    NS4 = np.array([[(s + i) % 4 for i in range(4)] for s in range(4)])
    OS4 = NS4.copy()
    fi = tr.FSM(4, 4, 4, NS4, OS4)
    K = 64
    rng = np.random.default_rng(31)
    data = rng.integers(0, 2, K).astype(np.int32)
    perm = np.asarray(tr.make_interleaver(K, seed=3))
    enc = np.asarray(tt.sccc_encode(fo, fi, perm, data))
    pts = np.exp(2j * np.pi * np.arange(4) / 4).astype(np.complex64)
    rx = pts[enc]  # noiseless
    dec = np.asarray(tt.sccc_decode_combined(
        fo, fi, perm, rx, pts.reshape(4, 1), 1, niterations=6))
    assert (dec == data).all()
