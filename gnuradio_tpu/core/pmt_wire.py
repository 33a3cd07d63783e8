"""GNU-Radio-compatible PMT wire codec + gr-zeromq tag header.

Byte-for-byte implements the reference's serialization so a LIVE GNU Radio
peer can attach to the DCN seam unmodified:

  gnuradio-runtime/lib/pmt/pmt_serialize.cc:255-528 (serialize) /
  :530-780 (deserialize): one opcode byte per value
  (include/pmt/pmt_serial_tags.h: PST_TRUE=0x00 ... PST_INT64=0x0d), all
  multi-byte scalars BIG-endian; symbols = u16 length + raw bytes; dicts =
  a PST_DICT-tagged pair chain ending in PST_NULL; uniform vectors =
  PST_UNIFORM_VECTOR + UVI subtype + u32 nitems + u8 npad + npad zeros +
  big-endian element array.

  gr-zeromq/lib/tag_headers.cc:16-50: NATIVE-endian u16 magic 0x5FF0 +
  u8 version 1 + u64 stream offset + u64 ntags, then per tag a native u64
  offset and the pmt-serialized key / value / srcid.

Value model: the same host-side Python values core/pmt.py uses (None,
bool, int, float, complex, str symbols, tuples, lists, dicts, numpy
uniform vectors, bytes as u8 vectors). core/pmt.py's own TLV codec stays
the internal default; this module is the interop codec selected with
codec="gr" on parallel/transport endpoints.
"""
from __future__ import annotations

import struct
from typing import Any

import numpy as np

# pmt_serial_tags.h
PST_TRUE = 0x00
PST_FALSE = 0x01
PST_SYMBOL = 0x02
PST_INT32 = 0x03
PST_DOUBLE = 0x04
PST_COMPLEX = 0x05
PST_NULL = 0x06
PST_PAIR = 0x07
PST_VECTOR = 0x08
PST_DICT = 0x09
PST_UNIFORM_VECTOR = 0x0A
PST_UINT64 = 0x0B
PST_TUPLE = 0x0C
PST_INT64 = 0x0D

_UVI_OF_DTYPE = {
    np.dtype(np.uint8): 0x00, np.dtype(np.int8): 0x01,
    np.dtype(np.uint16): 0x02, np.dtype(np.int16): 0x03,
    np.dtype(np.uint32): 0x04, np.dtype(np.int32): 0x05,
    np.dtype(np.uint64): 0x06, np.dtype(np.int64): 0x07,
    np.dtype(np.float32): 0x08, np.dtype(np.float64): 0x09,
    np.dtype(np.complex64): 0x0A, np.dtype(np.complex128): 0x0B,
}
_DTYPE_OF_UVI = {v: k for k, v in _UVI_OF_DTYPE.items()}

GR_HEADER_MAGIC = 0x5FF0
GR_HEADER_VERSION = 1


class _Pair:
    """Explicit cons cell for values that must serialize as PST_PAIR."""

    __slots__ = ("car", "cdr")

    def __init__(self, car, cdr):
        self.car, self.cdr = car, cdr


def serialize(obj: Any) -> bytes:
    out = bytearray()
    _ser(obj, out)
    return bytes(out)


def _ser(o, out: bytearray):
    if o is None:
        out.append(PST_NULL)
    elif o is True:
        out.append(PST_TRUE)
    elif o is False:
        out.append(PST_FALSE)
    elif isinstance(o, str):
        b = o.encode()
        out.append(PST_SYMBOL)
        out += struct.pack(">H", len(b))
        out += b
    elif isinstance(o, (int, np.integer)):
        i = int(o)
        if -(1 << 31) <= i < (1 << 31):
            out.append(PST_INT32)
            out += struct.pack(">i", i)
        elif -(1 << 63) <= i < (1 << 63):
            out.append(PST_INT64)
            out += struct.pack(">q", i)
        else:
            out.append(PST_UINT64)
            out += struct.pack(">Q", i)
    elif isinstance(o, (float, np.floating)):
        out.append(PST_DOUBLE)
        out += struct.pack(">d", float(o))
    elif isinstance(o, (complex, np.complexfloating)):
        out.append(PST_COMPLEX)
        out += struct.pack(">dd", o.real, o.imag)
    elif isinstance(o, dict):
        # pmt dicts serialize as a PST_DICT-tagged chain of (key . value)
        # pairs terminated by PST_NULL (pmt_serialize.cc:282-289)
        for k, v in o.items():
            out.append(PST_DICT)
            out.append(PST_PAIR)
            _ser(k, out)
            _ser(v, out)
        out.append(PST_NULL)
    elif isinstance(o, _Pair):
        out.append(PST_PAIR)
        _ser(o.car, out)
        _ser(o.cdr, out)
    elif isinstance(o, bytes):
        _ser_uvec(np.frombuffer(o, np.uint8), out)
    elif isinstance(o, np.ndarray):
        _ser_uvec(o, out)
    elif isinstance(o, tuple):
        # a PDU (meta_dict, data_vector) is a pair in the reference
        if len(o) == 2 and isinstance(o[0], (dict, type(None))) \
                and isinstance(o[1], (np.ndarray, bytes)):
            out.append(PST_PAIR)
            _ser(o[0] if o[0] is not None else None, out)
            _ser(o[1], out)
        else:
            out.append(PST_TUPLE)
            out += struct.pack(">I", len(o))
            for v in o:
                _ser(v, out)
    elif isinstance(o, list):
        out.append(PST_VECTOR)
        out += struct.pack(">I", len(o))
        for v in o:
            _ser(v, out)
    else:
        raise TypeError(f"cannot gr-serialize {type(o)!r}")


def _ser_uvec(a: np.ndarray, out: bytearray):
    a = np.ascontiguousarray(a).reshape(-1)
    code = _UVI_OF_DTYPE.get(a.dtype)
    if code is None:
        raise TypeError(f"no UVI subtype for dtype {a.dtype}")
    out.append(PST_UNIFORM_VECTOR)
    out.append(code)
    out += struct.pack(">I", a.size)
    out.append(1)                                 # npad (reference: 1)
    out.append(0)
    out += a.astype(a.dtype.newbyteorder(">")).tobytes()


def deserialize(buf: bytes) -> Any:
    v, _ = _deser(buf, 0)
    return v


def _deser(buf: bytes, pos: int):
    tag = buf[pos]
    pos += 1
    if tag == PST_TRUE:
        return True, pos
    if tag == PST_FALSE:
        return False, pos
    if tag == PST_NULL:
        return None, pos
    if tag == PST_SYMBOL:
        (n,) = struct.unpack_from(">H", buf, pos)
        pos += 2
        return buf[pos:pos + n].decode(), pos + n
    if tag == PST_INT32:
        (v,) = struct.unpack_from(">i", buf, pos)
        return int(v), pos + 4
    if tag == PST_INT64:
        (v,) = struct.unpack_from(">q", buf, pos)
        return int(v), pos + 8
    if tag == PST_UINT64:
        (v,) = struct.unpack_from(">Q", buf, pos)
        return int(v), pos + 8
    if tag == PST_DOUBLE:
        (v,) = struct.unpack_from(">d", buf, pos)
        return float(v), pos + 8
    if tag == PST_COMPLEX:
        re, im = struct.unpack_from(">dd", buf, pos)
        return complex(re, im), pos + 16
    if tag == PST_TUPLE:
        (n,) = struct.unpack_from(">I", buf, pos)
        pos += 4
        items = []
        for _ in range(n):
            v, pos = _deser(buf, pos)
            items.append(v)
        return tuple(items), pos
    if tag == PST_VECTOR:
        (n,) = struct.unpack_from(">I", buf, pos)
        pos += 4
        items = []
        for _ in range(n):
            v, pos = _deser(buf, pos)
            items.append(v)
        return items, pos
    if tag == PST_DICT:
        # chain of PST_DICT nodes, each carrying a (key . value) pair
        d = {}
        while True:
            kv, pos = _deser(buf, pos)
            if isinstance(kv, _Pair):
                d[kv.car] = kv.cdr
            elif isinstance(kv, tuple) and len(kv) == 2:
                d[kv[0]] = kv[1]
            nxt = buf[pos]
            pos += 1
            if nxt == PST_NULL:
                return d, pos
            if nxt != PST_DICT:
                # improper chain: re-parse as the tail value
                v, pos = _deser(buf, pos - 1)
                d["__tail__"] = v
                return d, pos
    if tag == PST_PAIR:
        car, pos = _deser(buf, pos)
        cdr, pos = _deser(buf, pos)
        # PDU convention: (dict . uniform vector) comes back as a tuple
        if isinstance(cdr, np.ndarray) and isinstance(car, (dict,
                                                            type(None))):
            return (car if car is not None else {}, cdr), pos
        return _Pair(car, cdr), pos
    if tag == PST_UNIFORM_VECTOR:
        utag = buf[pos]
        pos += 1
        (n,) = struct.unpack_from(">I", buf, pos)
        pos += 4
        npad = buf[pos]
        pos += 1 + npad
        dt = _DTYPE_OF_UVI[utag & 0x7F]
        nbytes = n * dt.itemsize
        arr = np.frombuffer(buf[pos:pos + nbytes],
                            dt.newbyteorder(">")).astype(dt)
        return arr, pos + nbytes
    raise ValueError(f"unknown PST opcode 0x{tag:02x}")


# ---------------------------------------------------------------------------
# gr-zeromq tag header (tag_headers.cc)
# ---------------------------------------------------------------------------

def gen_tag_header(offset: int, tags) -> bytes:
    """gen_tag_header: native-endian header + per-tag pmt triples."""
    out = bytearray()
    out += struct.pack("=HBQQ", GR_HEADER_MAGIC, GR_HEADER_VERSION,
                       int(offset), len(tags))
    for t in tags:
        out += struct.pack("=Q", int(t.offset))
        out += serialize(t.key)
        out += serialize(t.value)
        out += serialize(str(getattr(t, "srcid", "") or ""))
    return bytes(out)


def parse_tag_header(buf: bytes):
    """-> (offset, [Tag...], payload_start_index)."""
    from .tags import Tag
    magic, ver, offset, ntags = struct.unpack_from("=HBQQ", buf, 0)
    if magic != GR_HEADER_MAGIC:
        raise ValueError("gr header magic does not match")
    if ver != GR_HEADER_VERSION:
        raise ValueError("gr header version too high")
    pos = struct.calcsize("=HBQQ")
    tags = []
    for _ in range(ntags):
        (toff,) = struct.unpack_from("=Q", buf, pos)
        pos += 8
        key, pos = _deser(buf, pos)
        value, pos = _deser(buf, pos)
        srcid, pos = _deser(buf, pos)
        tags.append(Tag(int(toff), key, value, srcid))
    return int(offset), tags, pos
