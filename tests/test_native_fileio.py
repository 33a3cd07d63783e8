"""QA: native host runtime (ring buffer, IQ reader) + file/WAV I/O blocks.

The vmcircbuf self-test mirrors the reference's first-use strategy test
(gnuradio-runtime/lib/vmcircbuf.cc); reader tests check format conversion
against NumPy goldens; block tests run real flowgraphs through files."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from gnuradio_tpu.utils import native
from gnuradio_tpu.ops import fileio, blocks as blk
from gnuradio_tpu import Flowgraph, TopBlock

needs_native = pytest.mark.skipif(not native.native_available(),
                                  reason="native lib not built")


@needs_native
def test_vmcircbuf_selftest():
    assert native.selftest() == 0


@needs_native
def test_ringbuffer_wraps(rng):
    rb = native.RingBuffer(1 << 14)
    data = rng.integers(0, 256, 5000, dtype=np.uint8).tobytes()
    for _ in range(20):  # cycles through the wrap many times
        assert rb.write(data) == 5000
        assert rb.read(5000) == data
    rb.close()


@needs_native
@pytest.mark.parametrize("fmt,dtype,scale", [
    (native.IQ_CI8, np.int8, 1 / 128.0),
    (native.IQ_CI16, np.int16, 1 / 32768.0),
])
def test_iq_reader_conversion(rng, tmp_path, fmt, dtype, scale):
    n = 50_000
    raw = rng.integers(-100, 100, 2 * n).astype(dtype)
    path = str(tmp_path / "capture.iq")
    raw.tofile(path)
    rdr = native.IQFileReader(path, fmt, chunk_items=8192, scale=scale)
    got = np.concatenate(list(rdr), axis=1)
    rdr.close()
    np.testing.assert_allclose(got[0, :n], raw[0::2].astype(np.float32) * scale,
                               rtol=1e-6)
    np.testing.assert_allclose(got[1, :n], raw[1::2].astype(np.float32) * scale,
                               rtol=1e-6)
    assert (got[:, n:] == 0).all()  # zero-padded tail


def test_file_source_block_roundtrip(rng, tmp_path):
    iq = (rng.standard_normal(30_000) +
          1j * rng.standard_normal(30_000)).astype(np.complex64)
    path = str(tmp_path / "x.cf32")
    iq.tofile(path)
    src = fileio.file_source(path, native.IQ_CF32)
    snk = blk.vector_sink_c()
    fg = Flowgraph()
    fg.connect(src, snk)
    TopBlock(fg, target_items=8192).run()
    out = snk.data()
    np.testing.assert_allclose(out, iq, atol=1e-6)


def test_file_source_ci16(rng, tmp_path):
    raw = rng.integers(-3000, 3000, 2 * 20_000).astype(np.int16)
    path = str(tmp_path / "x.ci16")
    raw.tofile(path)
    src = fileio.file_source(path, native.IQ_CI16)
    snk = blk.vector_sink_c()
    fg = Flowgraph()
    fg.connect(src, snk)
    TopBlock(fg, target_items=4096).run()
    out = snk.data()
    want = (raw[0::2] + 1j * raw[1::2]).astype(np.complex64) / 32768.0
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_wav_roundtrip(rng, tmp_path):
    fs = 48000
    x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(9600) / fs)).astype(np.float32)
    path = str(tmp_path / "t.wav")
    snk = fileio.wavfile_sink(path, fs)
    src = blk.vector_source(x, dtype=jnp.float32)
    fg = Flowgraph()
    fg.connect(src, snk)
    TopBlock(fg).run()
    snk.flush()

    rsrc = fileio.wavfile_source(path)
    assert rsrc.sample_rate == fs
    rsnk = blk.vector_sink_f()
    fg2 = Flowgraph()
    fg2.connect(rsrc, rsnk)
    TopBlock(fg2).run()
    np.testing.assert_allclose(rsnk.data(), x, atol=1.5 / 32768)


def test_meta_file_roundtrip(rng, tmp_path):
    x = rng.standard_normal(1000).astype(np.float32)
    path = str(tmp_path / "cap.bin")
    fileio.write_meta_file(path, x, {"rx_rate": 1e6, "rx_freq": 99.5e6})
    data, meta = fileio.read_meta_file(path)
    np.testing.assert_array_equal(data, x)
    assert meta["rx_rate"] == 1e6 and meta["nitems"] == 1000


def test_native_udp_receiver():
    """Native threaded UDP drain (gr-network udp_source analog): datagrams
    sent from Python land in the double-mapped ring intact and in order."""
    import socket
    import time as _time
    from gnuradio_tpu.utils.native import UdpReceiver, native_available
    if not native_available():
        import pytest
        pytest.skip("no native toolchain")
    rx = UdpReceiver(0 or 47851, ring_bytes=1 << 16)
    try:
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        payloads = [bytes([i] * (100 + i)) for i in range(5)]
        for p in payloads:
            tx.sendto(p, ("127.0.0.1", 47851))
        want = sum(len(p) for p in payloads)
        deadline = _time.time() + 5.0
        while rx.available() < want and _time.time() < deadline:
            _time.sleep(0.01)
        got = rx.read(want)
        assert got == b"".join(payloads)
        assert rx.dropped() == 0
    finally:
        rx.close()
