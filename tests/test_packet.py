"""QA for the packet layer: CRCs vs known-good references, header format
round trips, HDLC frame/deframe, PDU CRC blocks over the message plane."""
import binascii

import numpy as np
import jax.numpy as jnp

from gnuradio_tpu import Flowgraph, TopBlock
from gnuradio_tpu.core import pmt
from gnuradio_tpu.ops import blocks as blk
from gnuradio_tpu.ops import packet as pkt


def test_crc32_matches_zlib(rng):
    data = rng.integers(0, 256, 100).astype(np.uint8)
    assert pkt.crc32(data) == binascii.crc32(data.tobytes())


def test_crc32_append_check_roundtrip(rng):
    data = rng.integers(0, 256, 64).astype(np.uint8)
    framed = pkt.crc32_append(data)
    payload, ok = pkt.crc32_check(framed)
    assert ok and (payload == data).all()
    framed[10] ^= 0xFF
    _, ok2 = pkt.crc32_check(framed)
    assert not ok2


def test_crc16_ccitt_known_value():
    # X.25 check value for ASCII "123456789" is 0x906E
    assert pkt.crc16_ccitt(np.frombuffer(b"123456789", np.uint8)) == 0x906E


def test_header_format_parse_roundtrip():
    h = pkt.PacketHeaderDefault()
    bits = h.format(100)
    plen, num, ok = pkt.PacketHeaderDefault.parse(bits)
    assert ok and plen == 100 and num == 0
    bits2 = h.format(513)
    plen2, num2, ok2 = pkt.PacketHeaderDefault.parse(bits2)
    assert ok2 and plen2 == 513 and num2 == 1
    bits2[3] ^= 1
    assert pkt.PacketHeaderDefault.parse(bits2)[2] is False


def test_header_payload_split(rng):
    h = pkt.PacketHeaderDefault()
    payload = rng.integers(0, 2, 50).astype(np.int8)
    stream = np.concatenate([h.format(50), payload])
    got, plen, num = pkt.header_payload_split(stream)
    assert plen == 50 and (got == payload).all()


def test_hdlc_roundtrip(rng):
    payload = rng.integers(0, 256, 30).astype(np.uint8)
    bits = pkt.hdlc_frame(payload)
    frames = pkt.hdlc_deframe(bits)
    assert len(frames) == 1
    assert (frames[0] == payload).all()


def test_hdlc_rejects_corrupt(rng):
    payload = rng.integers(0, 256, 30).astype(np.uint8)
    bits = pkt.hdlc_frame(payload)
    bits[30] ^= 1  # corrupt inside the frame body
    frames = pkt.hdlc_deframe(bits)
    assert len(frames) == 0


def test_burst_shape():
    x = np.ones(20, np.complex64)
    up = np.array([0.25, 0.5, 0.75])
    dn = np.array([0.75, 0.5, 0.25])
    y = pkt.burst_shape(x, up, dn, pre_pad=2, post_pad=3)
    assert len(y) == 25
    assert (y[:2] == 0).all() and (y[-3:] == 0).all()
    np.testing.assert_allclose(y[2:5].real, up)
    np.testing.assert_allclose(y[-6:-3].real, dn)


def test_crc_pdu_blocks_over_message_plane(rng):
    """PDU path: strobe posts a PDU -> crc append -> crc check -> debug."""
    payload = rng.integers(0, 256, 32).astype(np.uint8)
    pdu = pmt.make_pdu({"id": 1}, payload)
    strobe = blk.message_strobe(pdu, period_steps=10**9)
    app = pkt.CrcAppendPdu()
    chk = pkt.CrcCheckPdu()
    dbg = blk.message_debug()
    data = np.zeros(256, np.float32)
    src = blk.vector_source(data, dtype=jnp.float32)
    snk = blk.null_sink(jnp.float32)
    fg = Flowgraph()
    fg.connect(src, snk)
    fg.msg_connect(strobe, "strobe", app, "in")
    fg.msg_connect(app, "out", chk, "in")
    fg.msg_connect(chk, "out", dbg, "store")
    TopBlock(fg).run()
    assert dbg.num_messages() == 1
    meta, out = dbg.get_message(0)
    assert meta == {"id": 1}
    assert (out == payload).all()
    assert chk.n_fail == 0
