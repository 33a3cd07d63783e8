"""QA for the tag sideband, message plane, and PMT codec.

Mirrors the reference's qa_tag_utils / qa_pmt_prims / message QA patterns:
tags must survive rate changes with exact offset scaling
(block_executor.cc:139-153), messages must flow along msg_connect edges,
and PMT values must round-trip through serialization."""
import numpy as np
import jax.numpy as jnp
import pytest

from gnuradio_tpu import Flowgraph, TopBlock
from gnuradio_tpu.core import pmt
from gnuradio_tpu.core.tags import Tag
from gnuradio_tpu.ops import blocks as blk
from gnuradio_tpu.ops import filter as flt


# ---------------------------------------------------------------------------
# PMT codec
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("value", [
    None, True, False, 42, -7, 3.25, complex(1.5, -2.5), "symbol",
    b"\x00\x01\xff", (1, "two", 3.0), [1, 2, [3, 4]],
    {"freq": 99.5e6, "n": 7}, ("nested", {"a": (1, 2)}),
])
def test_pmt_roundtrip(value):
    assert pmt.deserialize(pmt.serialize(value)) == value


@pytest.mark.parametrize("dtype", ["u1", "i2", "i4", "f4", "f8", "c8"])
def test_pmt_uniform_vector_roundtrip(rng, dtype):
    a = (rng.standard_normal(37) * 10).astype(dtype)
    back = pmt.deserialize(pmt.serialize(a))
    assert back.dtype == a.dtype
    np.testing.assert_array_equal(back, a)


def test_pmt_pdu():
    p = pmt.make_pdu({"len": 8}, np.arange(8, dtype=np.uint8))
    assert pmt.is_pdu(p)
    meta, data = pmt.deserialize(pmt.serialize(p))
    assert meta == {"len": 8}
    np.testing.assert_array_equal(data, np.arange(8, dtype=np.uint8))


# ---------------------------------------------------------------------------
# stream tags
# ---------------------------------------------------------------------------

def test_tags_pass_through_sync_chain(rng):
    data = rng.standard_normal(4096).astype(np.float32)
    tags = [Tag(0, "start"), Tag(100, "mark", 1.5), Tag(4000, "end")]
    src = blk.vector_source(data, dtype=jnp.float32, tags=tags)
    c = blk.copy(jnp.float32)
    snk = blk.vector_sink(jnp.float32)
    fg = Flowgraph()
    fg.connect(src, c, snk)
    TopBlock(fg, target_items=1024).run()
    got = snk.tags()
    assert [(t.offset, t.key) for t in got] == [(0, "start"), (100, "mark"),
                                               (4000, "end")]
    assert got[1].value == 1.5


def test_tag_offsets_scale_through_decimator(rng):
    """Offsets through a D:1 block scale by 1/D with exact rational math."""
    D = 4
    data = rng.standard_normal(8192).astype(np.float32)
    taps = np.ones(1, np.float32)
    tags = [Tag(0, "a"), Tag(400, "b"), Tag(4001, "c")]
    src = blk.vector_source(data, dtype=jnp.float32, tags=tags)
    f = flt.fir_filter_fff(D, taps)
    snk = blk.vector_sink(jnp.float32)
    fg = Flowgraph()
    fg.connect(src, f, snk)
    TopBlock(fg, target_items=1024).run()
    got = {t.key: t.offset for t in snk.tags()}
    assert got == {"a": 0, "b": 100, "c": 1000}


def test_tag_gate_drops_tags(rng):
    data = rng.standard_normal(1024).astype(np.float32)
    src = blk.vector_source(data, dtype=jnp.float32, tags=[Tag(5, "x")])
    g = blk.tag_gate(jnp.float32)
    snk = blk.vector_sink(jnp.float32)
    fg = Flowgraph()
    fg.connect(src, g, snk)
    TopBlock(fg).run()
    assert snk.tags() == []


def test_stream_to_tagged_stream(rng):
    data = rng.standard_normal(1024).astype(np.float32)
    src = blk.vector_source(data, dtype=jnp.float32)
    tagger = blk.stream_to_tagged_stream(256, "packet_len", jnp.float32)
    snk = blk.vector_sink(jnp.float32)
    fg = Flowgraph()
    fg.connect(src, tagger, snk)
    TopBlock(fg, target_items=512).run()
    got = snk.tags()
    assert [t.offset for t in got] == [0, 256, 512, 768]
    assert all(t.key == "packet_len" and t.value == 256 for t in got)


def test_tag_debug_counts(rng):
    data = rng.standard_normal(512).astype(np.float32)
    src = blk.vector_source(data, dtype=jnp.float32,
                            tags=[Tag(1, "t1"), Tag(2, "t2")])
    dbg = blk.tag_debug(jnp.float32)
    fg = Flowgraph()
    fg.connect(src, dbg)
    TopBlock(fg).run()
    assert dbg.num_tags() == 2


# ---------------------------------------------------------------------------
# messages
# ---------------------------------------------------------------------------

def test_message_strobe_to_debug(rng):
    data = rng.standard_normal(4096).astype(np.float32)
    src = blk.vector_source(data, dtype=jnp.float32)
    snk = blk.null_sink(jnp.float32)
    strobe = blk.message_strobe({"cmd": "tick"})
    dbg = blk.message_debug()
    fg = Flowgraph()
    fg.connect(src, snk)
    fg.msg_connect(strobe, "strobe", dbg, "store")
    TopBlock(fg, target_items=1024).run()
    assert dbg.num_messages() >= 1
    assert dbg.get_message(0) == {"cmd": "tick"}


def test_message_chain_relay(rng):
    """Messages posted from a handler are delivered in the same dispatch
    round (the notify-neighbors semantics)."""
    from gnuradio_tpu.core.block import Block

    class Relay(Block):
        def __init__(self):
            super().__init__("relay")
            self.message_port_register_in("in", self._on)
            self.message_port_register_out("out")

        def _on(self, msg):
            self.post("out", {"relayed": msg})

    data = np.zeros(256, np.float32)
    src = blk.vector_source(data, dtype=jnp.float32)
    snk = blk.null_sink(jnp.float32)
    strobe = blk.message_strobe("ping", period_steps=10**9)  # fires at step 0
    relay = Relay()
    dbg = blk.message_debug()
    fg = Flowgraph()
    fg.connect(src, snk)
    fg.msg_connect(strobe, "strobe", relay, "in")
    fg.msg_connect(relay, "out", dbg, "store")
    TopBlock(fg).run()
    assert dbg.messages == [{"relayed": "ping"}]


def test_message_feedback_loop_converges(rng):
    """Cross-block feedback via MESSAGE ports (the reference's idiom for
    closed loops — stream cycles are forbidden in both frameworks): a power
    probe posts measurements, a msg-driven gain block steers toward unit
    power with one-step message latency."""
    from gnuradio_tpu.ops.blocks_extra3 import msg_gain, power_probe_msg
    n = 64 * 512
    x = (4.0 * np.exp(2j * np.pi * 0.05 * np.arange(n))).astype(np.complex64)
    src = blk.vector_source(x)
    g = msg_gain(gain=1.0, reference=1.0, rate=0.8)
    probe = power_probe_msg()
    snk = blk.vector_sink(jnp.complex64)
    fg = Flowgraph()
    fg.connect(src, g, snk)
    fg.connect(g, probe)
    fg.msg_connect(probe, "power", g, "set")
    TopBlock(fg, target_items=512).run()
    y = snk.data()
    # input power 16; closed loop must converge to |y| ~ 1
    tail = np.abs(y[-512:])
    np.testing.assert_allclose(tail, 1.0, atol=0.05)
    assert abs(np.abs(y[0]) - 4.0) < 1e-5  # first step ran at initial gain
