"""QA for the GNU-Radio-compatible PMT wire codec (core/pmt_wire.py).

Golden byte strings are HAND-DERIVED from the reference source
(gnuradio-runtime/lib/pmt/pmt_serialize.cc opcode/field layout and
include/pmt/pmt_serial_tags.h values; gr-zeromq/lib/tag_headers.cc
header layout) — not captured from a run, so they independently pin the
format this implementation must speak."""
import struct

import numpy as np

from gnuradio_tpu.core import pmt_wire as W
from gnuradio_tpu.core.tags import Tag


def test_golden_scalars():
    assert W.serialize(True) == b"\x00"
    assert W.serialize(False) == b"\x01"
    assert W.serialize(None) == b"\x06"
    # PST_SYMBOL + u16 big-endian length + raw bytes
    assert W.serialize("abc") == b"\x02\x00\x03abc"
    # PST_INT32 + i32 BE
    assert W.serialize(7) == b"\x03\x00\x00\x00\x07"
    assert W.serialize(-1) == b"\x03\xff\xff\xff\xff"
    # values outside int32: PST_INT64 + i64 BE
    assert W.serialize(1 << 40) == b"\x0d" + struct.pack(">q", 1 << 40)
    # PST_DOUBLE + f64 BE: 1.5 = 0x3FF8000000000000
    assert W.serialize(1.5) == b"\x04\x3f\xf8\x00\x00\x00\x00\x00\x00"
    # PST_COMPLEX + two f64 BE
    assert W.serialize(1.5 + 0.5j) == (
        b"\x05\x3f\xf8\x00\x00\x00\x00\x00\x00"
        b"\x3f\xe0\x00\x00\x00\x00\x00\x00")


def test_golden_containers():
    # PST_TUPLE + u32 count
    assert W.serialize((True, False)) == b"\x0c\x00\x00\x00\x02\x00\x01"
    # PST_VECTOR + u32 count
    assert W.serialize([None]) == b"\x08\x00\x00\x00\x01\x06"
    # dict {'a': 1}: PST_DICT PST_PAIR sym(a) int(1) ... PST_NULL
    assert W.serialize({"a": 1}) == (
        b"\x09\x07" + b"\x02\x00\x01a" + b"\x03\x00\x00\x00\x01" + b"\x06")


def test_golden_uniform_vector():
    # PST_UNIFORM_VECTOR, UVI_U8=0x00, u32 n, npad=1, one zero, data
    a = np.array([1, 2, 3], np.uint8)
    assert W.serialize(a) == b"\x0a\x00\x00\x00\x00\x03\x01\x00\x01\x02\x03"
    # UVI_F32=0x08, big-endian floats: 1.0f = 0x3F800000
    f = np.array([1.0], np.float32)
    assert W.serialize(f) == (
        b"\x0a\x08\x00\x00\x00\x01\x01\x00" + b"\x3f\x80\x00\x00")
    # UVI_C32=0x0a: interleaved BE float pairs
    c = np.array([1 + 2j], np.complex64)
    assert W.serialize(c) == (
        b"\x0a\x0a\x00\x00\x00\x01\x01\x00"
        + b"\x3f\x80\x00\x00\x40\x00\x00\x00")


def test_roundtrip_values():
    vals = [True, False, None, "sym", 42, -42, 1 << 40, -(1 << 40),
            3.25, 2 - 3j, (1, 2.0, "x"), [1, [2, None]],
            {"freq": 100.5, "n": 3},
            np.arange(16, dtype=np.int16),
            np.arange(8, dtype=np.float64),
            (np.arange(4, dtype=np.complex64) * (1 + 1j)),
            ({"len": 4}, np.arange(4, dtype=np.uint8)),   # PDU pair
            ]
    for v in vals:
        got = W.deserialize(W.serialize(v))
        if isinstance(v, np.ndarray):
            assert got.dtype == v.dtype
            np.testing.assert_array_equal(got, v)
        elif isinstance(v, tuple) and len(v) == 2 \
                and isinstance(v[1], np.ndarray):
            assert got[0] == v[0]
            np.testing.assert_array_equal(got[1], v[1])
        else:
            assert got == v, v


def test_bytes_as_u8_vector():
    got = W.deserialize(W.serialize(b"\x01\x02"))
    np.testing.assert_array_equal(got, np.array([1, 2], np.uint8))


def test_tag_header_golden_and_roundtrip():
    tags = [Tag(5, "rx_time", 1.5, "src0")]
    blob = W.gen_tag_header(1000, tags)
    # native-endian u16 magic, u8 version, u64 offset, u64 ntags
    assert blob[:19] == struct.pack("=HBQQ", 0x5FF0, 1, 1000, 1)
    # first tag: native u64 offset then pmt symbol 'rx_time'
    assert blob[19:27] == struct.pack("=Q", 5)
    assert blob[27:37] == b"\x02\x00\x07rx_time"
    off, got, pos = W.parse_tag_header(blob + b"PAYLOAD")
    assert off == 1000 and pos == len(blob)
    assert got[0].offset == 5 and got[0].key == "rx_time"
    assert got[0].value == 1.5 and got[0].srcid == "src0"


def test_transport_gr_codec_hop():
    """Stream hop with codec='gr': the wire payload is exactly
    [tag_headers.cc header || raw samples] — what a GNU Radio ZMQ block
    puts in each message."""
    import threading

    from gnuradio_tpu.parallel import transport as T

    data = (np.arange(256) + 1j).astype(np.complex64)
    tags = [Tag(3, "start", True), Tag(100, "f", 1.25)]
    srv = T.StreamServer()

    def tx():
        srv.send_gr_message_frame(data, 0, tags)
        srv.close()

    t = threading.Thread(target=tx)
    t.start()
    cli = T.StreamClient("127.0.0.1", srv.port)
    arr, offset, rtags = cli.recv_gr_message_frame(np.complex64)
    t.join()
    np.testing.assert_array_equal(arr, data)
    assert offset == 0
    assert [(x.offset, x.key, x.value) for x in rtags] == \
        [(3, "start", True), (100, "f", 1.25)]
