"""QA for misc catalog fills (ops/misc_fills.py)."""
import os
import socket
import numpy as np
import pytest

from gnuradio_tpu.core.runtime import TopBlock
from gnuradio_tpu.core.stream import PortSpec, B, F, C
from gnuradio_tpu.ops import blocks as blk
from gnuradio_tpu.ops import misc_fills as mf


def run_chain(data, *mid, dtype=C, out_sink=None):
    src = blk.StreamSource(np.asarray(data), PortSpec(dtype))
    snk = out_sink or blk.VectorSink(mid[-1].out_ports[0])
    tb = TopBlock()
    tb.connect(src, *mid, snk)
    tb.run()
    return snk


def test_nop_passthrough():
    x = np.arange(64, dtype=np.complex64)
    snk = run_chain(x, mf.nop(C))
    np.testing.assert_allclose(snk.data(), x)


def test_file_descriptor_roundtrip(tmp_path):
    data = np.arange(100, dtype=np.float32)
    p = tmp_path / "fd.bin"
    fd = os.open(p, os.O_WRONLY | os.O_CREAT)
    sink = mf.file_descriptor_sink(fd, F)
    run_chain(data, blk.Head(100, PortSpec(F)), dtype=F, out_sink=sink)
    os.close(fd)
    fd = os.open(p, os.O_RDONLY)
    src = mf.file_descriptor_source(fd, F)
    os.close(fd)
    got = src.data
    # sink pads the final chunk; the written prefix must match
    np.testing.assert_allclose(got[:100], data)


def test_file_taps_loader(tmp_path):
    p = tmp_path / "taps.csv"
    p.write_text("0.25, 0.5, 0.25\n")
    np.testing.assert_allclose(mf.file_taps_loader(str(p)), [0.25, 0.5, 0.25])


def test_tcp_server_sink_streams_to_client():
    snk = mf.tcp_server_sink(dtype=F)
    cli = socket.create_connection(("127.0.0.1", snk.port), timeout=5)
    import time
    time.sleep(0.3)  # let accept loop pick it up
    x = np.arange(256, dtype=np.float32)
    snk.collect(x)
    got = b""
    cli.settimeout(5)
    while len(got) < x.nbytes:
        got += cli.recv(65536)
    np.testing.assert_allclose(np.frombuffer(got, np.float32), x)
    cli.close()
    snk.close()


def test_channel_model2_per_sample_cfo():
    n = 1024
    x = np.ones(n, dtype=np.complex64)
    f0 = 0.01  # cycles/sample
    src = blk.StreamSource(x, PortSpec(C))
    fsrc = blk.StreamSource(np.full(n, f0, np.float32), PortSpec(F))
    esrc = blk.StreamSource(np.ones(n, np.float32), PortSpec(F))
    cm = mf.channel_model2(noise_voltage=0.0)
    snk = blk.VectorSink(PortSpec(C))
    tb = TopBlock()
    tb.connect(src, (cm, 0), snk)
    tb.connect(fsrc, (cm, 1))
    tb.connect(esrc, (cm, 2))
    tb.run()
    y = snk.data()
    k = np.arange(1, n + 1)
    ref = np.exp(1j * 2 * np.pi * f0 * k)
    # the timing path adds a fixed group delay (zeros history fills the
    # first `timing_delay` outputs); the rotation itself is undelayed
    d = mf.ChannelModel2.timing_delay
    np.testing.assert_allclose(y[:d], 0.0, atol=1e-6)
    np.testing.assert_allclose(y[d:], ref[d:], atol=1e-3)


def test_dynamic_channel_model_noise_only():
    n = 4096
    x = np.ones(n, dtype=np.complex64)
    dc = mf.dynamic_channel_model(1e6, noise_amp=0.1, seed=4)
    snk = run_chain(x, dc)
    y = snk.data()
    err = y - 1.0
    assert 0.005 < np.mean(np.abs(err) ** 2) < 0.05  # ~2*0.1^2


def test_ccsds_27_roundtrip():
    rng = np.random.default_rng(9)
    bits = rng.integers(0, 2, 256).astype(np.uint8)
    enc = np.asarray(mf.encode_ccsds_27(bits))
    soft = (1.0 - 2.0 * enc).astype(np.float32)  # clean BPSK
    dec = np.asarray(mf.decode_ccsds_27(-soft, len(bits)))
    # accept either soft-sign convention; one of them must be exact
    dec2 = np.asarray(mf.decode_ccsds_27(soft, len(bits)))
    ok = (dec[:250] == bits[:250]).all() or (dec2[:250] == bits[:250]).all()
    assert ok


def test_dummy_code():
    enc = mf.DummyEncoder(32)
    dec = mf.DummyDecoder(32)
    bits = np.array([1, 0, 1, 1], np.uint8)
    np.testing.assert_array_equal(enc.encode(bits), bits)
    soft = np.array([-1.0, 1.0, -1.0, -1.0], np.float32)
    np.testing.assert_array_equal(dec.decode(soft), bits)


def test_ldpc_gen_mtrx_encode_matmul():
    G = np.array([[1, 0, 0, 1, 1],
                  [0, 1, 0, 1, 0],
                  [0, 0, 1, 0, 1]], np.int32)
    s = np.array([1, 1, 0], np.int32)
    cw = np.asarray(mf.ldpc_gen_mtrx_encode(G, s))
    np.testing.assert_array_equal(cw, (s @ G) % 2)


def test_maxstar():
    import jax.numpy as jnp
    a, b = jnp.float32(1.0), jnp.float32(2.0)
    got = float(mf.maxstar(a, b))
    ref = float(np.log(np.exp(1.0) + np.exp(2.0)))
    assert abs(got - ref) < 1e-5


def test_mmse_interp_taps_interpolate_sine():
    taps = mf.design_mmse_interp_taps(8, 32)
    t = np.arange(64)
    x = np.sin(2 * np.pi * 0.05 * t)
    mu = 0.5
    # interpolate at n + mu using taps row for mu
    row = taps[16]  # mu = 16/32
    est = np.convolve(x, row[::-1], "valid")
    ref = np.sin(2 * np.pi * 0.05 * (t[3: 3 + len(est)] + mu))
    np.testing.assert_allclose(est, ref, atol=5e-3)


def test_mmse_differentiator_taps():
    taps = mf.design_mmse_interp_differentiator_taps(8, 32)
    t = np.arange(64)
    f = 0.02
    x = np.sin(2 * np.pi * f * t)
    row = taps[0]  # mu = 0
    est = np.convolve(x, row[::-1], "valid")
    ref = 2 * np.pi * f * np.cos(2 * np.pi * f * t[3: 3 + len(est)])
    np.testing.assert_allclose(est, ref, atol=2e-2)


def test_gfsk_mod_demod_loopback():
    rng = np.random.default_rng(21)
    nbits = 256
    bits = rng.integers(0, 2, nbits).astype(np.uint8)
    nrz = (2.0 * bits - 1.0).astype(np.float32)
    sps = 4
    shaper, fm = mf.gfsk_mod_blocks(sps, bt=0.35)
    src = blk.StreamSource(nrz, PortSpec(F))
    msnk = blk.VectorSink(PortSpec(C))
    tb = TopBlock()
    tb.connect(src, shaper, fm, msnk)
    tb.run()
    tx = msnk.data()
    # demod
    qd, f2c, cr, c2r, sl = mf.gfsk_demod_blocks(sps)
    src2 = blk.StreamSource(tx, PortSpec(C))
    bsnk = blk.VectorSink(PortSpec(B))
    tb2 = TopBlock()
    tb2.connect(src2, qd, f2c, cr, c2r, sl, bsnk)
    tb2.run()
    got = np.asarray(bsnk.data(), np.uint8)
    # align: clock recovery has unknown latency; find best offset match
    best = 0
    for lag in range(0, 16):
        L = min(len(got) - lag, nbits - 8)
        if L <= 0:
            continue
        acc = (got[lag:lag + L] == bits[:L]).mean()
        best = max(best, acc)
    assert best > 0.95


def test_number_sink_and_edit_box():
    ns = mf.number_sink(average=1.0, dtype=F)
    run_chain(np.full(128, 3.0, np.float32), blk.Head(128, PortSpec(F)),
              dtype=F, out_sink=ns)
    assert abs(ns.value - 3.0) < 1e-5

    eb = mf.edit_box_msg("freq", 0.0)
    eb.set_value(99.5)
    msgs = eb.drain_outbox()
    assert msgs == [("msg", ("freq", 99.5))]
    assert eb.value == 99.5


def test_ctrlport_probe_and_psd():
    pr = mf.ctrlport_probe2_f(length=64)
    pr.collect(np.arange(100, dtype=np.float32))
    got = pr.get()
    np.testing.assert_allclose(got, np.arange(36, 100, dtype=np.float32))

    psd = mf.ctrlport_probe_psd(fft_len=64)
    t = np.arange(256)
    x = np.exp(2j * np.pi * 0.25 * t).astype(np.complex64)
    psd.collect(x)
    p = psd.get()
    assert p.argmax() == 32 + 16  # bin at +0.25 fs after fftshift


def test_perf_monitor_text():
    from gnuradio_tpu.utils.ctrlport import ControlPortServer, ControlPortClient
    x = np.arange(1024, dtype=np.complex64)
    src = blk.StreamSource(x, PortSpec(C))
    snk = blk.VectorSink(PortSpec(C))
    tb = TopBlock()
    tb.connect(src, snk)
    tb.run()
    srv = ControlPortServer(tb)
    cli = ControlPortClient("127.0.0.1", srv.port)
    txt = mf.perf_monitor(cli)
    assert "perf." in txt
    cli.close()
    srv.close()
