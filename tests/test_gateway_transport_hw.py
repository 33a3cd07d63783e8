"""QA: Python block gateway, PUB/SUB + REQ/REP transports, uhd/video."""
import threading

import numpy as np
import jax.numpy as jnp
import pytest

from gnuradio_tpu import Flowgraph, TopBlock, gateway
from gnuradio_tpu.ops import blocks as blk
from gnuradio_tpu.ops import uhd, video
from gnuradio_tpu.parallel import transport as tp


def run_graph(*chain, **kw):
    fg = Flowgraph()
    fg.connect(*chain)
    TopBlock(fg, **kw).run()


# ---------------------------------------------------------------------------
# gateway
# ---------------------------------------------------------------------------

class _Doubler(gateway.sync_block):
    def __init__(self):
        super().__init__(name="doubler", in_sig=[np.complex64],
                         out_sig=[np.complex64])

    def work(self, input_items, output_items):
        output_items[0][:] = input_items[0] * 2
        return len(output_items[0])


class _Decimator(gateway.decim_block):
    def __init__(self, d):
        super().__init__(name="dec", in_sig=[np.float32],
                         out_sig=[np.float32], decim=d)

    def work(self, input_items, output_items):
        output_items[0][:] = input_items[0][::self._decim]
        return len(output_items[0])


def test_gateway_sync_block(rng):
    x = (rng.normal(size=1000) + 1j * rng.normal(size=1000)
         ).astype(np.complex64)
    src = blk.vector_source(x)
    dut = _Doubler()
    snk = blk.vector_sink_c()
    run_graph(src, dut, snk)
    np.testing.assert_allclose(snk.data(), 2 * x, rtol=1e-6)


def test_gateway_decim_block(rng):
    x = rng.normal(size=1200).astype(np.float32)
    src = blk.vector_source(x)
    dut = _Decimator(4)
    snk = blk.vector_sink_f()
    run_graph(src, dut, snk)
    np.testing.assert_allclose(snk.data(), x[::4], rtol=1e-6)


def test_gateway_chains_with_native_blocks(rng):
    x = (rng.normal(size=800) + 1j * rng.normal(size=800)
         ).astype(np.complex64)
    src = blk.vector_source(x)
    g = _Doubler()
    mc = blk.multiply_const(0.5 + 0j)
    snk = blk.vector_sink_c()
    run_graph(src, g, mc, snk)
    np.testing.assert_allclose(snk.data(), x, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# transports
# ---------------------------------------------------------------------------

def test_pub_sub_fans_out(rng):
    data = (rng.normal(size=256) + 1j * rng.normal(size=256)
            ).astype(np.complex64)
    pub = tp.PubServer()
    subs = [tp.SubClient("127.0.0.1", pub.port) for _ in range(3)]
    pub.wait_for_subscribers(3)
    pub.send_items(data, 0)
    for s in subs:
        arr, off, tags = s.recv_items(np.complex64)
        assert off == 0
        np.testing.assert_array_equal(arr, data)
    pub.close()
    for s in subs:
        s.close()


def test_req_rep_backpressure(rng):
    data = (rng.normal(size=300)).astype(np.float32)
    rep = tp.RepServer()
    rep.feed(data)

    def serve():
        for _ in range(3):
            if not rep.serve_once():
                break

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    req = tp.ReqClient("127.0.0.1", rep.port)
    got = []
    for _ in range(3):
        arr, off, tags = req.request_items(100, np.float32)
        assert off == len(got)  # absolute offsets ride along
        got.extend(arr.tolist())
    t.join(timeout=5)
    np.testing.assert_allclose(np.array(got, np.float32), data)
    req.close()
    rep.close()


def test_msg_pub_sub():
    pub = tp.PubServer()
    sub = tp.SubClient("127.0.0.1", pub.port)
    pub.wait_for_subscribers(1)
    sink = tp.MsgPubSink(pub)
    src = tp.MsgSubSource(sub)
    sink.post({"freq": 100e6, "tag": "retune"})
    msg = src.recv()
    assert msg["freq"] == 100e6 and msg["tag"] == "retune"
    pub.close()
    sub.close()


# ---------------------------------------------------------------------------
# uhd / video
# ---------------------------------------------------------------------------

def test_usrp_loopback_roundtrip(rng):
    iq = (rng.normal(size=2048) + 1j * rng.normal(size=2048)
          ).astype(np.complex64)
    be = uhd.LoopbackBackend(iq)
    src = uhd.usrp_source(be, samp_rate=2e6, center_freq=100e6)
    assert src.get_samp_rate() == 2e6
    assert src.set_center_freq(101e6) == 101e6
    snk = blk.vector_sink_c()
    run_graph(src, snk)
    np.testing.assert_array_equal(snk.data(), iq)
    # tx path
    tx_be = uhd.LoopbackBackend()
    tx_src = blk.vector_source(iq)
    tx = uhd.usrp_sink(tx_be)
    run_graph(tx_src, tx)
    np.testing.assert_array_equal(np.concatenate(tx_be.sent), iq)


def test_video_sink(tmp_path, rng):
    w, h = 16, 8
    frames = rng.integers(0, 256, 3 * w * h).astype(np.uint8)
    out = tmp_path / "vid.raw"
    src = blk.vector_source(frames.astype(np.int8), dtype=np.int8)
    vs = video.video_sink(w, h, str(out))
    run_graph(src, vs)
    vs.close()
    assert vs.frames_out == 3
    assert out.read_bytes() == frames.tobytes()
