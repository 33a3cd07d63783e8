"""QA: instrumentation sinks, UDP network hop, checkpoint/resume."""
import threading

import numpy as np
import jax.numpy as jnp

from gnuradio_tpu import Flowgraph, TopBlock
from gnuradio_tpu.ops import blocks as blk
from gnuradio_tpu.ops import instrumentation as inst
from gnuradio_tpu.ops import network as net
from gnuradio_tpu.ops import filter as flt


def test_freq_sink_finds_tone(rng):
    fs = 100e3
    f0 = 12.5e3
    n = 65536
    x = np.exp(2j * np.pi * f0 * np.arange(n) / fs).astype(np.complex64)
    src = blk.vector_source(x)
    fsink = inst.FreqSink(1024)
    fg = Flowgraph()
    fg.connect(src, fsink)
    TopBlock(fg, target_items=16384).run()
    psd = fsink.data().mean(axis=0)
    peak_bin = int(np.argmax(psd))
    want_bin = int(round(f0 / fs * 1024)) + 512
    assert abs(peak_bin - want_bin) <= 1
    # tone should stand >40 dB above the far-away floor
    assert psd[peak_bin] - np.median(psd) > 40


def test_waterfall_rows(rng):
    x = (rng.standard_normal(8192) + 1j * rng.standard_normal(8192)
         ).astype(np.complex64)
    src = blk.vector_source(x)
    wf = inst.WaterfallSink(512)
    fg = Flowgraph()
    fg.connect(src, wf)
    TopBlock(fg, target_items=4096).run()
    assert len(wf.frames) == 16
    assert wf.frames[0].shape == (512,)


def test_histogram_sink(rng):
    x = rng.standard_normal(50000).astype(np.float32)
    src = blk.vector_source(x, dtype=jnp.float32)
    h = inst.HistogramSink(50, -4, 4)
    fg = Flowgraph()
    fg.connect(src, h)
    TopBlock(fg, target_items=50000).run()
    assert h.counts.sum() == 50000
    # gaussian: middle bins dominate
    assert h.counts[20:30].sum() > h.counts[:10].sum()


def test_constellation_and_eye(rng):
    pts = (np.array([1 + 1j, -1 - 1j])[rng.integers(0, 2, 4096)]
           ).astype(np.complex64)
    src = blk.vector_source(pts)
    cs = inst.ConstellationSink(256)
    fg = Flowgraph()
    fg.connect(src, cs)
    TopBlock(fg).run()
    assert cs.points.shape[0] == 256

    audio = np.sin(np.linspace(0, 100, 4096)).astype(np.float32)
    src2 = blk.vector_source(audio, dtype=jnp.float32)
    eye = inst.EyeSink(sps=8)
    fg2 = Flowgraph()
    fg2.connect(src2, eye)
    TopBlock(fg2).run()
    assert eye.eye().shape[1] == 16


def test_udp_stream_hop(rng):
    n = 8192
    data = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
            ).astype(np.complex64)
    rx_src = net.udp_source(0, header=net.HEADERTYPE_SEQNUM, timeout=3.0)
    port = rx_src.port

    def tx():
        src = blk.vector_source(data)
        snk = net.udp_sink("127.0.0.1", port, payload_items=512,
                           header=net.HEADERTYPE_SEQNUM)
        fg = Flowgraph()
        fg.connect(src, snk)
        TopBlock(fg, target_items=2048).run()
        snk.flush()
        snk.close()

    t = threading.Thread(target=tx)
    t.start()
    rsnk = blk.vector_sink_c()
    fg = Flowgraph()
    fg.connect(rx_src, rsnk)
    TopBlock(fg, target_items=2048).run()
    t.join()
    out = rsnk.data()
    # UDP over loopback: expect complete in-order delivery
    np.testing.assert_allclose(out[:n], data, atol=1e-7)
    assert rx_src.n_dropped == 0


def test_checkpoint_resume_bitexact(rng, tmp_path):
    """Run a stateful chain, checkpoint mid-stream, resume, and compare to
    an uninterrupted run — must be bit-exact."""
    taps = np.hanning(31).astype(np.float32)
    x = (rng.standard_normal(16384) + 1j * rng.standard_normal(16384)
         ).astype(np.complex64)

    def make(data):
        # stable block names: checkpoint state is keyed by block name
        src = blk.vector_source(data, name="src")
        f = flt.fir_filter_ccf(1, taps)
        f.name = "fir"
        snk = blk.vector_sink_c()
        snk.name = "snk"
        fg = Flowgraph()
        fg.connect(src, f, snk)
        return TopBlock(fg, target_items=4096), snk

    # uninterrupted
    tb_all, snk_all = make(x)
    tb_all.run()
    want = snk_all.data()

    # first half, checkpoint, new process-equivalent resume on second half
    tb1, snk1 = make(x[:8192])
    tb1.run()
    ckpt = str(tmp_path / "state.npz")
    tb1.save_state(ckpt)

    tb2, snk2 = make(x[8192:])
    tb2.compile()
    tb2.state = tb2.compile().init_state()
    tb2.load_state(ckpt)
    tb2.run()
    got = np.concatenate([snk1.data(), snk2.data()])
    np.testing.assert_array_equal(got, want)
