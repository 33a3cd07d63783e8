"""PDU <-> tagged-stream bridges + new block forms QA."""
import numpy as np
import jax.numpy as jnp
import pytest

from gnuradio_tpu import Flowgraph, TopBlock
from gnuradio_tpu.core import pmt
from gnuradio_tpu.core.stream import PortSpec, C, F
from gnuradio_tpu.ops import blocks as blk
from gnuradio_tpu.ops.pdu_stream import (pdu_filter, pdu_remove, pdu_set,
                                         pdu_to_tagged_stream,
                                         tagged_stream_to_pdu)


def test_pdu_roundtrip_through_stream(rng):
    src = pdu_to_tagged_stream()
    snk = tagged_stream_to_pdu()
    pkts = [rng.integers(0, 256, ln).astype(np.uint8) for ln in (100, 37, 250)]
    for p in pkts:
        src.deliver("pdus", pmt.make_pdu({}, p))
    fg = Flowgraph()
    fg.connect(src, snk)
    TopBlock(fg, target_items=64).run()
    assert len(snk.pdus) == 3
    for (meta, data), p in zip(snk.pdus, pkts):
        np.testing.assert_array_equal(np.asarray(data), p)


def test_pdu_meta_tools():
    f = pdu_filter("type", "good")
    s = pdu_set("seen", True)
    r = pdu_remove("tmp")
    out = []
    f.deliver("pdus", ({"type": "bad"}, np.zeros(1, np.uint8)))
    assert f.drain_outbox() == []
    f.deliver("pdus", ({"type": "good"}, np.zeros(1, np.uint8)))
    (p, m), = f.drain_outbox()
    s.deliver("pdus", m)
    (_, m2), = s.drain_outbox()
    assert m2[0]["seen"] is True
    r.deliver("pdus", ({"tmp": 1, "keep": 2}, np.zeros(1, np.uint8)))
    (_, m3), = r.drain_outbox()
    assert "tmp" not in m3[0] and m3[0]["keep"] == 2


def test_constellation_receiver_cb(rng):
    from gnuradio_tpu.ops.digital import constellation_qpsk
    from gnuradio_tpu.ops.digital_loops import constellation_receiver_cb
    const = constellation_qpsk()
    n = 4000
    idx = rng.integers(0, 4, n)
    x = const.points[idx] * np.exp(1j * 0.3)  # static phase offset
    rx = constellation_receiver_cb(const, loop_bw=0.08)
    src = blk.vector_source(x.astype(np.complex64))
    snk = blk.vector_sink(jnp.int8)
    fg = Flowgraph()
    fg.connect(src, rx, snk)
    TopBlock(fg, target_items=1024).run()
    got = snk.data()
    # after lock (constant rotation ambiguity possible; QPSK sym=4): check
    # steady-state decisions match some fixed permutation of the tx indices
    tail_got, tail_tx = got[2000:], idx[2000:len(got)]
    m = min(len(tail_got), len(tail_tx))
    # map each tx index to the most common decoded index; must be a bijection
    mapping = {}
    for t in range(4):
        sel = tail_got[:m][tail_tx[:m] == t]
        mapping[t] = np.bincount(sel, minlength=4).argmax()
    assert len(set(mapping.values())) == 4
    err = np.mean([mapping[t] != g for t, g in
                   zip(tail_tx[:m], tail_got[:m])])
    assert err < 0.01, err


def test_burst_shaper_block(rng):
    from gnuradio_tpu.ops.packet import burst_shaper_cc
    P, U = 64, 8
    up = np.linspace(0, 1, U).astype(np.complex64)
    down = up[::-1]
    x = np.ones(2 * P, np.complex64)
    bs = burst_shaper_cc(up, down, P, pre_pad=4, post_pad=4)
    src = blk.vector_source(x)
    snk = blk.vector_sink(jnp.complex64)
    fg = Flowgraph()
    fg.connect(src, bs, snk)
    TopBlock(fg, target_items=128).run()
    y = snk.data().reshape(2, P + 8)
    np.testing.assert_allclose(y[0][:4], 0)
    np.testing.assert_allclose(y[0][4:4 + U], up, atol=1e-6)
    np.testing.assert_allclose(y[0][-4:], 0)


def test_ofdm_block_forms_match_functions(rng):
    from gnuradio_tpu.ops.ofdm import (ofdm_carrier_allocator_cvc,
                                       ofdm_cyclic_prefixer,
                                       allocate_carriers, ofdm_modulate,
                                       default_occupied_carriers)
    import jax
    occ = default_occupied_carriers(64)
    n_occ = len(occ)
    nf = 8
    d = (rng.standard_normal(nf * n_occ)
         + 1j * rng.standard_normal(nf * n_occ)).astype(np.complex64)
    # block graph: allocator -> ifft(vlen) -> prefixer
    from gnuradio_tpu.ops.fft import fft_vcc
    alloc = ofdm_carrier_allocator_cvc(64)
    ifft = fft_vcc(64, forward=False)   # FFTW-convention: unnormalized (xN)
    norm = blk.multiply_const(1.0 / 64, C, vlen=64)
    cp = ofdm_cyclic_prefixer(64, 16)
    src = blk.vector_source(d)
    snk = blk.vector_sink(jnp.complex64)
    fg = Flowgraph()
    fg.connect(src, alloc, ifft, norm, cp, snk)
    TopBlock(fg, target_items=n_occ * nf).run()
    got = snk.data()
    frames = allocate_carriers(jnp.asarray(d), nf, 64)
    ref = np.asarray(ofdm_modulate(frames, 16))
    k = min(len(got), len(ref))
    assert k >= nf * 80
    np.testing.assert_allclose(got[:k], ref[:k], atol=1e-5)
