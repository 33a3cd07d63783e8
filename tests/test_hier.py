"""hier_block2 analog QA (reference: gnuradio-runtime/python/gnuradio/gr/
qa_hier_block2.py + hier_block2_detail.cc flatten semantics)."""
import numpy as np
import pytest

from gnuradio_tpu import gr
from gnuradio_tpu.core.hier import HierBlock
from gnuradio_tpu.core.stream import PortSpec, C, F
from gnuradio_tpu.ops import blocks as blk
from gnuradio_tpu.ops.blocks import StreamSource, VectorSink


def _run(fg):
    tb = gr.TopBlock(fg)
    tb.run()
    return tb


class AddMul(HierBlock):
    """y = (x + k) * m — two catalog blocks wrapped in a hier."""

    def __init__(self, k, m, name=None):
        super().__init__(name, in_ports=(PortSpec(F),),
                         out_ports=(PortSpec(F),))
        a = blk.add_const_ff(k)
        mu = blk.multiply_const_ff(m)
        self.connect((self, 0), a, mu, (self, 0))


def test_hier_basic_flatten():
    x = np.arange(32, dtype=np.float32)
    src = StreamSource(x, PortSpec(F))
    h = AddMul(1.0, 2.0)
    snk = VectorSink(PortSpec(F))
    fg = gr.Flowgraph()
    fg.connect(src, h, snk)
    _run(fg)
    np.testing.assert_allclose(snk.data(), (x + 1.0) * 2.0, rtol=1e-6)


def test_hier_nested():
    class Outer(HierBlock):
        def __init__(self):
            super().__init__("outer", in_ports=(PortSpec(F),),
                             out_ports=(PortSpec(F),))
            inner1 = AddMul(1.0, 2.0)
            inner2 = AddMul(-3.0, 0.5)
            self.connect((self, 0), inner1, inner2, (self, 0))

    x = np.arange(16, dtype=np.float32)
    src = StreamSource(x, PortSpec(F))
    snk = VectorSink(PortSpec(F))
    fg = gr.Flowgraph()
    fg.connect(src, Outer(), snk)
    _run(fg)
    np.testing.assert_allclose(snk.data(), ((x + 1) * 2 - 3) * 0.5, rtol=1e-6)


def test_hier_two_instances_unique_state():
    # two instances of the same hier class must not collide on state keys
    x = np.ones(8, dtype=np.float32)
    src = StreamSource(x, PortSpec(F))
    h1, h2 = AddMul(1.0, 1.0), AddMul(2.0, 3.0)
    snk = VectorSink(PortSpec(F))
    fg = gr.Flowgraph()
    fg.connect(src, h1, h2, snk)
    _run(fg)
    np.testing.assert_allclose(snk.data(), ((x + 1) + 2) * 3, rtol=1e-6)


def test_hier_input_pad_fanout():
    # one external input feeding two internal chains, summed
    class FanOut(HierBlock):
        def __init__(self):
            super().__init__("fan", in_ports=(PortSpec(F),),
                             out_ports=(PortSpec(F),))
            a = blk.multiply_const_ff(2.0)
            b = blk.multiply_const_ff(3.0)
            add = blk.add_ff(2)
            self.connect((self, 0), a, (add, 0))
            self.connect((self, 0), b, (add, 1))
            self.connect(add, (self, 0))

    x = np.arange(8, dtype=np.float32)
    src = StreamSource(x, PortSpec(F))
    snk = VectorSink(PortSpec(F))
    fg = gr.Flowgraph()
    fg.connect(src, FanOut(), snk)
    _run(fg)
    np.testing.assert_allclose(snk.data(), 5.0 * x, rtol=1e-6)


def test_hier_multi_io_ports():
    class TwoIn(HierBlock):
        def __init__(self):
            super().__init__("twoin",
                             in_ports=(PortSpec(F), PortSpec(F)),
                             out_ports=(PortSpec(F),))
            add = blk.add_ff(2)
            self.connect((self, 0), (add, 0))
            self.connect((self, 1), (add, 1))
            self.connect(add, (self, 0))

    x = np.arange(8, dtype=np.float32)
    y = np.full(8, 10.0, np.float32)
    s1, s2 = StreamSource(x, PortSpec(F)), StreamSource(y, PortSpec(F))
    snk = VectorSink(PortSpec(F))
    fg = gr.Flowgraph()
    h = TwoIn()
    fg.connect(s1, (h, 0), snk)
    fg.connect(s2, (h, 1))
    _run(fg)
    np.testing.assert_allclose(snk.data(), x + y, rtol=1e-6)


def test_hier_unbound_pad_raises():
    class Bad(HierBlock):
        def __init__(self):
            super().__init__("bad", in_ports=(PortSpec(F),),
                             out_ports=(PortSpec(F),))
            # never binds its pads

    x = np.ones(4, np.float32)
    fg = gr.Flowgraph()
    fg.connect(StreamSource(x, PortSpec(F)), Bad(), VectorSink(PortSpec(F)))
    with pytest.raises(ValueError, match="pad"):
        gr.TopBlock(fg).run()


def test_hier_type_mismatch_raises():
    class H(HierBlock):
        def __init__(self):
            super().__init__("h", in_ports=(PortSpec(C),),
                             out_ports=(PortSpec(C),))
            f = blk.multiply_const_ff(2.0)  # float block on complex pad
            with pytest.raises(ValueError, match="type mismatch"):
                self.connect((self, 0), f)
            # bind pads legally so construction completes
            c = blk.multiply_const_cc(1.0)
            self.connect((self, 0), c, (self, 0))

    H()


def test_wfm_rcv_hier_matches_functional_chain():
    """The flagship WBFM chain as a hier block inside a TopBlock graph must
    match the bare functional form (models/wfm.make_wfm_step) exactly."""
    import jax
    from jax import lax
    from gnuradio_tpu.models.wfm import WfmRcvFull, make_wfm_step

    fs, qr, ar = 1_000_000.0, 250_000.0, 50_000.0
    n = 200_000
    t = np.arange(n) / fs
    audio = 0.7 * np.sin(2 * np.pi * 1000.0 * t)
    iq = np.exp(1j * 2 * np.pi * 75e3 * np.cumsum(audio) / fs
                ).astype(np.complex64)

    src = StreamSource(iq, PortSpec(C))
    h = WfmRcvFull(fs, qr, ar)
    snk = VectorSink(PortSpec(F))
    fg = gr.Flowgraph()
    fg.connect(src, h, snk)
    _run(fg)
    got = snk.data()

    init, step, mult = make_wfm_step(fs, qr, ar)
    state = jax.jit(init)()
    m = (n // mult) * mult
    _, ref = jax.jit(step)(state, jax.numpy.asarray(iq[:m]))
    ref = np.asarray(ref)

    k = min(len(got), len(ref))
    assert k >= n // 20 - mult
    np.testing.assert_allclose(got[:k], ref[:k], atol=1e-5)
