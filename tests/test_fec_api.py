"""FECAPI deployment-layer QA: uniform kernels x deployments x codes
(reference: gr-fec qa_fecapi_*.py files — one per code family, each testing
parallelism/deployment combos, + fec_test/bercurve harness)."""
import numpy as np
import jax.numpy as jnp
import pytest

from gnuradio_tpu import Flowgraph, TopBlock
from gnuradio_tpu.core.tags import Tag
from gnuradio_tpu.ops import blocks as blk
from gnuradio_tpu.ops import fec_api as fapi
from gnuradio_tpu.ops.fec import CC_TERMINATED, ReedSolomon
from gnuradio_tpu.ops.fec_ldpc import LdpcCode as LdpcMatrix, make_gallager_code
from gnuradio_tpu.ops.fec_polar import PolarCode as PolarRaw
from gnuradio_tpu.ops.fec_tpc import TPC


def _loopback_stream(code, nframes=4, seed=0, noise=0.0):
    """vector_source -> encoder -> (bipolar map) -> decoder -> sink."""
    rng = np.random.default_rng(seed)
    u = rng.integers(0, 2, nframes * code.k_bits).astype(np.int8)
    src = blk.vector_source(u, dtype=jnp.int8)
    enc = fapi.encoder(code)
    to_soft = blk.Elementwise(
        lambda b: (1.0 - 2.0 * b.astype(jnp.float32)),
        1, fapi.PortSpec(fapi.B), fapi.PortSpec(fapi.F))
    dec = fapi.decoder(code)
    snk = blk.vector_sink(jnp.int8)
    fg = Flowgraph()
    fg.connect(src, enc, to_soft, dec, snk)
    TopBlock(fg).run()
    return u, np.asarray(snk.data())


@pytest.mark.parametrize("make_code", [
    lambda: fapi.CCCode(64, 7, 2, (0o171, 0o133), CC_TERMINATED),
    lambda: fapi.RepetitionCode(32, 3),
    lambda: fapi.DummyCode(48),
    lambda: fapi.PolarCode(PolarRaw(64, 32)),
    lambda: fapi.TpcCode(TPC(krow=8, kcol=4)),
], ids=["cc", "rep", "dummy", "polar", "tpc"])
def test_streaming_loopback_noiseless(make_code):
    code = make_code()
    u, got = _loopback_stream(code, nframes=3)
    np.testing.assert_array_equal(got[: len(u)], u)


def test_rs_streaming_loopback():
    code = fapi.RSCode(ReedSolomon(t=4, shorten=205))  # RS(50,42)
    u, got = _loopback_stream(code, nframes=2)
    np.testing.assert_array_equal(got[: len(u)], u)


def test_ldpc_streaming_loopback():
    H = make_gallager_code(48, 3, 6, seed=1)
    code = fapi.LdpcCode(LdpcMatrix(H), iterations=15)
    u, got = _loopback_stream(code, nframes=2)
    np.testing.assert_array_equal(got[: len(u)], u)


def test_tagged_deployment_rescales_len_tags():
    code = fapi.CCCode(32, 7, 2, (0o171, 0o133), CC_TERMINATED)
    rng = np.random.default_rng(3)
    u = rng.integers(0, 2, 2 * code.k_bits).astype(np.int8)
    src = blk.vector_source(u, dtype=jnp.int8,
                            tags=[Tag(0, "packet_len", code.k_bits),
                                  Tag(code.k_bits, "packet_len", code.k_bits)])
    enc = fapi.encoder(code, deployment="tagged")
    snk = blk.vector_sink(jnp.int8)
    fg = Flowgraph()
    fg.connect(src, enc, snk)
    TopBlock(fg).run()
    tags = sorted(snk.tags())
    assert [(t.offset, t.value) for t in tags] == [
        (0, code.n_bits), (code.n_bits, code.n_bits)]


def test_async_pdu_roundtrip():
    code = fapi.CCCode(64, 7, 2, (0o171, 0o133), CC_TERMINATED)
    enc = fapi.encoder(code, deployment="async")
    dec = fapi.decoder(code, deployment="async")
    from gnuradio_tpu.core import pmt
    rng = np.random.default_rng(5)
    u = rng.integers(0, 2, code.k_bits).astype(np.uint8)

    # deliver a PDU, relay encoder output through a bipolar map to the
    # decoder (the message plane is host-side; deliver() is the msg edge)
    enc.deliver("in", pmt.make_pdu({"id": 1}, u))
    (port, msg), = enc.drain_outbox()
    assert port == "out"
    meta, data = msg
    dec.deliver("in", pmt.make_pdu(meta,
                                   1.0 - 2.0 * np.asarray(data, np.float32)))
    (port2, msg2), = dec.drain_outbox()
    meta2, bits2 = msg2
    assert meta2 == {"id": 1}
    np.testing.assert_array_equal(np.asarray(bits2)[: code.k_bits], u)


def test_extended_encoder_decoder_puncture_roundtrip():
    code = fapi.CCCode(32, 7, 2, (0o171, 0o133), CC_TERMINATED)
    enc_chain = fapi.extended_encoder(code, puncpat="110")
    dec_chain = fapi.extended_decoder(code, puncpat="110")
    rng = np.random.default_rng(7)
    u = rng.integers(0, 2, 3 * code.k_bits).astype(np.int8)
    src = blk.vector_source(u, dtype=jnp.int8)
    to_soft = blk.Elementwise(
        lambda b: (1.0 - 2.0 * b.astype(jnp.float32)),
        1, fapi.PortSpec(fapi.B), fapi.PortSpec(fapi.F))
    snk = blk.vector_sink(jnp.int8)
    fg = Flowgraph()
    fg.connect(src, *enc_chain, to_soft, *dec_chain, snk)
    TopBlock(fg).run()
    got = np.asarray(snk.data())
    np.testing.assert_array_equal(got[: len(u)], u)


def test_ber_curve_monotone_and_coded_gain():
    code = fapi.CCCode(128, 7, 2, (0o171, 0o133), CC_TERMINATED)
    pts = fapi.ber_curve(code, [-2.0, 1.0, 4.0], frames=48, seed=2)
    bers = [b for _, b in pts]
    assert bers[0] > bers[-1]          # monotone-ish improvement
    assert bers[-1] < 1e-3             # K=7 CC at 4 dB Es/N0 is clean
    # uncoded BPSK at Es/N0=4dB has BER ~1.2e-2; coded must beat it
    assert bers[-1] < 1.2e-2
