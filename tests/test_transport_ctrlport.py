"""QA: distributed stream hop + ControlPort RPC + perf counters.

Mirrors the reference's gr-zeromq QA strategy (both ends in ONE process
over localhost, sample+tag fidelity asserted across the serialize hop,
qa_zeromq_pushpull.py) and ControlPort export checks."""
import threading

import numpy as np
import jax.numpy as jnp

from gnuradio_tpu import Flowgraph, TopBlock
from gnuradio_tpu.core.tags import Tag
from gnuradio_tpu.ops import blocks as blk
from gnuradio_tpu.parallel import transport
from gnuradio_tpu.utils.ctrlport import ControlPortServer, ControlPortClient


def test_stream_hop_samples_and_tags(rng):
    """TX graph -> TCP -> RX graph in one process; samples and tag offsets
    must survive the hop exactly."""
    n = 16384
    data = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
            ).astype(np.complex64)
    tags = [Tag(0, "start"), Tag(5000, "mid", 2.5), Tag(16000, "end")]

    server = transport.StreamServer()
    port = server.port

    def tx():
        src = blk.vector_source(data, tags=tags)
        snk = transport.TcpStreamSink(server)
        fg = Flowgraph()
        fg.connect(src, snk)
        TopBlock(fg, target_items=4096).run()
        server.close()  # EOF to the receiver

    t = threading.Thread(target=tx)
    t.start()

    client = transport.StreamClient("127.0.0.1", port)
    rsrc = transport.TcpStreamSource(client)
    rsnk = blk.vector_sink_c()
    fg = Flowgraph()
    fg.connect(rsrc, rsnk)
    TopBlock(fg, target_items=4096).run()
    t.join()

    np.testing.assert_allclose(rsnk.data(), data, atol=1e-7)
    got = {t_.key: t_.offset for t_ in rsnk.tags()}
    assert got == {"start": 0, "mid": 5000, "end": 16000}
    assert [t_.value for t_ in rsnk.tags() if t_.key == "mid"] == [2.5]


def test_message_over_transport():
    server = transport.StreamServer()
    msgs = [{"freq": 100e6}, "retune", (1, 2, 3)]

    def tx():
        for m in msgs:
            server.send_message(m)
        server.close()

    t = threading.Thread(target=tx)
    t.start()
    client = transport.StreamClient("127.0.0.1", server.port)
    got = []
    while True:
        m = client.recv_message()
        if m is None:
            break
        got.append(m)
    t.join()
    assert got == msgs


def test_ctrlport_get_set_properties(rng):
    data = rng.standard_normal(4096).astype(np.float32)
    src = blk.vector_source(data, dtype=jnp.float32, name="src0")
    mc = blk.multiply_const(2.0, jnp.float32)
    mc.name = "mc0"
    snk = blk.vector_sink_f()
    fg = Flowgraph()
    fg.connect(src, mc, snk)
    tb = TopBlock(fg)
    tb.run()

    srv = ControlPortServer(tb)
    cli = ControlPortClient("127.0.0.1", srv.port)
    props = cli.properties()
    assert "perf.nsteps" in props and props["perf.nsteps"] >= 1
    assert "perf.throughput" in props and props["perf.throughput"] > 0
    assert any(k.startswith("src0.") for k in props)
    # set a knob and read it back
    cli.set(**{"src0.repeat": True})
    assert cli.get("src0.repeat")["src0.repeat"] is True
    cli.close()
    srv.close()


def test_perf_counters_stats(rng):
    from gnuradio_tpu.utils.perf import PerfCounters
    pc = PerfCounters()
    for dt in [0.01, 0.02, 0.03]:
        pc.record(dt, items=100)
    assert pc.n == 3
    assert abs(pc.work_time_avg() - 0.02) < 1e-9
    assert pc.total_items == 300
    assert pc.throughput() > 0


def test_perf_monitor_client(rng):
    """gr-perf-monitorx text-mode analog: snapshot + render."""
    from gnuradio_tpu.utils.ctrlport import (ControlPortServer,
                                             format_monitor,
                                             monitor_snapshot)
    x = rng.standard_normal(4096).astype(np.float32)
    src = blk.vector_source(x, dtype=jnp.float32)
    snk = blk.vector_sink(jnp.float32)
    tb = TopBlock()
    tb.connect(src, snk)
    tb.run()
    srv = ControlPortServer(tb)
    try:
        props = monitor_snapshot("127.0.0.1", srv.port)
        assert any(k.startswith("perf.") for k in props)
        text = format_monitor(props)
        assert "perf counters" in text and "block knobs" in text
    finally:
        srv.close()
