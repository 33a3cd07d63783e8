"""Live reconfiguration QA — lock()/unlock() mid-stream graph edits with
state carry (reference: top_block_impl.cc:165-206, flat_flowgraph.cc
merge_connections, python qa_flowgraph.py reconnect tests)."""
import numpy as np
import jax.numpy as jnp

from gnuradio_tpu import Flowgraph, TopBlock
from gnuradio_tpu.core.stream import PortSpec, C, F
from gnuradio_tpu.ops import blocks as blk
from gnuradio_tpu.ops import filter as flt
from gnuradio_tpu.ops.analog import fm_deemph


def _deemph_ref(x, fs=50e3, tau=75e-6):
    """Run the whole stream through one unreconfigured graph."""
    src = blk.vector_source(x, dtype=jnp.float32)
    de = fm_deemph(fs, tau)
    snk = blk.vector_sink(jnp.float32)
    fg = Flowgraph()
    fg.connect(src, de, snk)
    TopBlock(fg, target_items=1024).run()
    return snk.data()


def test_insert_block_midstream_carries_state(rng):
    """Insert a pass-through block mid-stream; the IIR's carried state must
    survive the recompile so the full output equals an uninterrupted run."""
    n = 8192
    x = rng.standard_normal(2 * n).astype(np.float32)
    ref = _deemph_ref(x)

    de = fm_deemph(50e3, 75e-6)
    src1 = blk.vector_source(x[:n], dtype=jnp.float32, name="src")
    snk1 = blk.vector_sink(jnp.float32)
    fg = Flowgraph()
    fg.connect(src1, de, snk1)
    tb = TopBlock(fg, target_items=1024)
    tb.run()
    first = snk1.data()

    # --- reconfigure: wedge a copy block between deemph and a NEW sink,
    # feed the rest of the stream through a new source (same chain state) ---
    tb.lock()
    fg.remove_block(src1)
    fg.remove_block(snk1)
    src2 = blk.vector_source(x[n:], dtype=jnp.float32, name="src2")
    cp = blk.copy(jnp.float32)
    snk2 = blk.vector_sink(jnp.float32)
    fg.connect(src2, de, cp, snk2)
    tb.unlock()
    tb.run()
    second = snk2.data()

    got = np.concatenate([first, second])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_swap_taps_reinits_only_that_block(rng):
    """Swapping a FIR's taps (different length) restarts that block's tail
    from zeros but everything else continues: mirrors the reference
    reallocating only the changed connection's buffer."""
    n = 4096
    x = rng.standard_normal(2 * n).astype(np.float32)
    t1 = np.ones(4, np.float32) / 4
    t2 = np.ones(8, np.float32) / 8

    src1 = blk.vector_source(x[:n], dtype=jnp.float32)
    f1 = flt.fir_filter_fff(1, t1)
    f1.name = "fir"
    snk1 = blk.vector_sink(jnp.float32)
    fg = Flowgraph()
    fg.connect(src1, f1, snk1)
    tb = TopBlock(fg, target_items=1024)
    tb.run()

    tb.lock()
    fg.remove_block(src1)
    fg.remove_block(f1)
    fg.remove_block(snk1)
    src2 = blk.vector_source(x[n:], dtype=jnp.float32)
    f2 = flt.fir_filter_fff(1, t2)
    f2.name = "fir"  # same name, new taps -> incompatible state -> re-init
    snk2 = blk.vector_sink(jnp.float32)
    fg.connect(src2, f2, snk2)
    tb.unlock()
    tb.run()
    got = snk2.data()

    # expected: convolution of the second half with t2, ZERO history
    ref = np.convolve(x[n:], t2)[: n].astype(np.float32)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_unlock_without_lock_raises():
    tb = TopBlock()
    try:
        tb.unlock()
    except RuntimeError:
        return
    raise AssertionError("unlock() without lock() must raise")
