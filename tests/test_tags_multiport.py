"""Per-port tag engine QA — multi-input/multi-output, multi-rate blocks.

Mirrors the reference scheduler's per-port tag semantics
(block_executor.cc:86-214: per-port read counters, ONE_TO_ONE port mapping,
ALL_TO_ALL fan, exact rational offset scaling incl. interpolators) and the
gr-blocks tag QA scenarios (qa_tag_gate.py, qa_tag_share.py)."""
import numpy as np
import jax.numpy as jnp

from gnuradio_tpu import Flowgraph, TopBlock
from gnuradio_tpu.core.tags import Tag
from gnuradio_tpu.ops import blocks as blk
from gnuradio_tpu.ops import filter as flt
from gnuradio_tpu.ops.blocks_extra import stream_mux


def _tags(snk):
    return sorted((t.offset, t.key) for t in snk.tags())


def test_tag_share_unions_both_ports(rng):
    n = 512
    a = rng.standard_normal(n).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    s0 = blk.vector_source(a, dtype=jnp.float32, tags=[Tag(10, "p0")])
    s1 = blk.vector_source(b, dtype=jnp.float32, tags=[Tag(20, "p1")])
    ts = blk.tag_share(jnp.float32, jnp.float32)
    snk = blk.vector_sink(jnp.float32)
    fg = Flowgraph()
    fg.connect(s0, (ts, 0), snk)
    fg.connect(s1, (ts, 1))
    TopBlock(fg, target_items=128).run()
    np.testing.assert_allclose(snk.data(), a, rtol=1e-6)  # data = port 0
    assert _tags(snk) == [(10, "p0"), (20, "p1")]


def test_interleave_scales_tag_offsets_per_port():
    # interleave(2): in_rates (1,1), out_rate 2 — a tag at offset k on
    # EITHER input lands at offset 2k on the output (ALL_TO_ALL, rrate=2)
    n = 256
    a = np.arange(n, dtype=np.float32)
    b = -np.arange(n, dtype=np.float32)
    s0 = blk.vector_source(a, dtype=jnp.float32, tags=[Tag(7, "a7")])
    s1 = blk.vector_source(b, dtype=jnp.float32, tags=[Tag(12, "b12")])
    il = blk.interleave(2, jnp.float32)
    snk = blk.vector_sink(jnp.float32)
    fg = Flowgraph()
    fg.connect(s0, (il, 0), snk)
    fg.connect(s1, (il, 1))
    TopBlock(fg, target_items=64).run()
    assert _tags(snk) == [(14, "a7"), (24, "b12")]


def test_stream_mux_unequal_port_rates():
    # stream_mux([3, 1]): port 0 consumes 3/period, port 1 consumes 1/period,
    # output period 4. Tag on port0 at offset k -> k*4/3 (trunc); tag on
    # port1 at offset m -> m*4.
    n0, n1 = 384, 128
    a = np.ones(n0, np.float32)
    b = np.zeros(n1, np.float32)
    s0 = blk.vector_source(a, dtype=jnp.float32, tags=[Tag(9, "a")])
    s1 = blk.vector_source(b, dtype=jnp.float32, tags=[Tag(5, "b")])
    mux = stream_mux([3, 1], jnp.float32)
    snk = blk.vector_sink(jnp.float32)
    fg = Flowgraph()
    fg.connect(s0, (mux, 0), snk)
    fg.connect(s1, (mux, 1))
    TopBlock(fg, target_items=64).run()
    got = dict((t.key, t.offset) for t in snk.tags())
    assert got == {"a": 9 * 4 // 3, "b": 5 * 4}


def test_tag_offsets_scale_through_interpolator(rng):
    # 1:L interpolating FIR: offsets scale by L exactly
    # (block_executor.cc:139-153 rational scaling, interpolator direction)
    L = 4
    data = rng.standard_normal(512).astype(np.float32)
    src = blk.vector_source(data, dtype=jnp.float32,
                            tags=[Tag(3, "x"), Tag(100, "y")])
    f = flt.interp_fir_filter_fff(L, np.ones(1, np.float32))
    snk = blk.vector_sink(jnp.float32)
    fg = Flowgraph()
    fg.connect(src, f, snk)
    TopBlock(fg, target_items=256).run()
    got = {t.key: t.offset for t in snk.tags()}
    assert got == {"x": 12, "y": 400}


def test_deinterleave_one_to_one_drops_nothing_alltoall():
    # deinterleave(2) with default ALL_TO_ALL: a tag at input offset k lands
    # on BOTH outputs at k//2 (out_rate 1 / in_rate 2)
    n = 256
    data = np.arange(n, dtype=np.float32)
    src = blk.vector_source(data, dtype=jnp.float32, tags=[Tag(10, "t")])
    di = blk.deinterleave(2, jnp.float32)
    k0, k1 = blk.vector_sink(jnp.float32), blk.vector_sink(jnp.float32)
    fg = Flowgraph()
    fg.connect(src, di)
    fg.connect((di, 0), k0)
    fg.connect((di, 1), k1)
    TopBlock(fg, target_items=64).run()
    assert _tags(k0) == [(5, "t")]
    assert _tags(k1) == [(5, "t")]


def test_one_to_one_policy_port_mapped():
    # a 2-in/2-out passthrough with ONE_TO_ONE must keep port p tags on
    # output port p only
    from gnuradio_tpu.core.block import Block
    from gnuradio_tpu.core.stream import PortSpec, F

    class Pass2(Block):
        tag_policy = "one_to_one"

        def __init__(self):
            super().__init__()
            self.in_ports = (PortSpec(F), PortSpec(F))
            self.out_ports = (PortSpec(F), PortSpec(F))

        def apply(self, state, inputs, n_in):
            return state, inputs

    n = 128
    a, b = np.ones(n, np.float32), np.zeros(n, np.float32)
    s0 = blk.vector_source(a, dtype=jnp.float32, tags=[Tag(4, "p0")])
    s1 = blk.vector_source(b, dtype=jnp.float32, tags=[Tag(8, "p1")])
    p2 = Pass2()
    k0, k1 = blk.vector_sink(jnp.float32), blk.vector_sink(jnp.float32)
    fg = Flowgraph()
    fg.connect(s0, (p2, 0), k0)
    fg.connect(s1, (p2, 1), k1)
    TopBlock(fg, target_items=64).run()
    assert _tags(k0) == [(4, "p0")]
    assert _tags(k1) == [(8, "p1")]


def test_second_run_resets_offset_keyed_host_state(rng):
    # the reset_host_state() hook: a second TopBlock.run() on a fresh graph
    # with the same multiply_by_tag_value block must re-apply gains from
    # offset 0 (regression for cross-run tag-window desync)
    from gnuradio_tpu.ops.blocks_extra3 import multiply_by_tag_value_cc
    n = 256
    x = np.ones(n, np.complex64)
    tags = [Tag(0, "gain", 2.0), Tag(128, "gain", 3.0)]

    def run_once():
        src = blk.vector_source(x, dtype=jnp.complex64, tags=tags)
        m = mbv  # same block instance both runs
        snk = blk.vector_sink(jnp.complex64)
        fg = Flowgraph()
        fg.connect(src, m, snk)
        TopBlock(fg, target_items=64).run()
        return snk.data()

    mbv = multiply_by_tag_value_cc("gain", 1.0)
    y1 = run_once()
    y2 = run_once()
    expect = np.r_[np.full(128, 2.0), np.full(128, 3.0)].astype(np.complex64)
    np.testing.assert_allclose(y1, expect)
    np.testing.assert_allclose(y2, expect)
