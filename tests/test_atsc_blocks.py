"""ATSC streaming-block QA (round 4): the dtv_atsc_* graph blocks compose
to the same bytes as the functional chains in ops/atsc.py, and every grc
descriptor id resolves through the importer."""
import numpy as np
import jax.numpy as jnp
import pytest

from gnuradio_tpu.core.graph import Flowgraph
from gnuradio_tpu.core.runtime import TopBlock
from gnuradio_tpu.core.stream import PortSpec
from gnuradio_tpu.ops import atsc
from gnuradio_tpu.ops import atsc_blocks as AB
from gnuradio_tpu.ops.blocks import StreamSource, vector_sink_b, vector_sink_f


def test_atsc_tx_blocks_match_functional(rng):
    nf = 2
    ts = rng.integers(0, 256, nf * 312 * 188)
    ts[::188] = 0x47

    fg = Flowgraph()
    src = StreamSource(ts.astype(np.uint8).view(np.int8),
                       out_port=PortSpec(jnp.int8))
    pad = AB.AtscPad()
    rnd = AB.AtscRandomizer()
    rse = AB.AtscRsEncoder()
    il = AB.AtscInterleaver()
    te = AB.AtscTrellisEncoder()
    mux = AB.AtscFieldSyncMux()
    snk = vector_sink_b()
    fg.connect(src, pad, rnd, rse, il, te, mux, snk)
    TopBlock(fg).run()
    got = np.asarray(snk.data()).astype(np.int64) & 0x7

    want, _ = atsc.atsc_tx_symbols(jnp.asarray(ts))
    want = np.asarray(want).reshape(-1)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_atsc_rx_blocks_decode_tx(rng):
    """equalizer -> viterbi -> deinterleaver -> rs -> derandomizer on clean
    TX levels: matches the functional atsc_rx contract (52-segment
    deinterleaver pipeline fill, then byte-exact RS stream)."""
    nf = 2
    ts = rng.integers(0, 256, nf * 312 * 188)
    ts[::188] = 0x47
    syms, _ = atsc.atsc_tx_symbols(jnp.asarray(ts))
    levels = (np.asarray(atsc.vsb_map(syms.reshape(-1)))
              - atsc.PILOT).astype(np.float32)

    fg = Flowgraph()
    src = StreamSource(levels, out_port=PortSpec(jnp.float32))
    fsc = AB.AtscFsChecker()
    eq = AB.AtscEqualizer(taps0="identity")
    vit = AB.AtscViterbiDecoder()
    snk = vector_sink_b()
    fg.connect(src, fsc, eq, vit, snk)
    TopBlock(fg).run()
    got = np.asarray(snk.data()).astype(np.int64) & 0xFF

    # expected RS-domain stream: interleaved TX bytes, recovered exactly
    want = np.asarray(atsc.rs_encode(atsc.randomize(jnp.asarray(ts))))
    il, _ = atsc.interleave(jnp.asarray(want), atsc.interleaver_init())
    il = np.asarray(il)
    assert got.size == il.size
    # identity-seeded equalizer on a clean channel: field 1 byte-exact;
    # the field-sync training rows include 12 data-dependent saved symbols
    # whose LMS residual perturbs taps slightly from field 2 on (the
    # reference trains the same way) — bound the tail at 99.5%.
    # LMS-from-zeros convergence itself is QA'd in test_atsc_frontend.
    f1 = 312 * 207
    assert np.array_equal(got[:f1], il[:f1])
    assert np.mean(got == il[: got.size]) > 0.995


def test_atsc_byte_rx_chain_roundtrip(rng):
    """deinterleaver -> rs_decoder -> derandomizer -> depad on the TX RS
    stream (52-segment delay honored)."""
    nf = 2
    ts = rng.integers(0, 256, nf * 312 * 188)
    ts[::188] = 0x47
    want_rs = np.asarray(atsc.rs_encode(atsc.randomize(jnp.asarray(ts))))
    il, _ = atsc.interleave(jnp.asarray(want_rs), atsc.interleaver_init())

    fg = Flowgraph()
    src = StreamSource(np.asarray(il).astype(np.uint8).view(np.int8),
                       out_port=PortSpec(jnp.int8))
    dil = AB.AtscDeinterleaver()
    rsd = AB.AtscRsDecoder()
    der = AB.AtscDerandomizer(phase_packets=atsc.LOOPBACK_DELAY_SEGS)
    dep = AB.AtscDepad()
    snk = vector_sink_b()
    fg.connect(src, dil, rsd, der, dep, snk)
    TopBlock(fg).run()
    got = np.asarray(snk.data()).astype(np.int64) & 0xFF
    # deinterleaver = pure 52-segment delay -> first 52 packets garbage,
    # the rest byte-exact TS
    skip = atsc.LOOPBACK_DELAY_SEGS * 188
    assert np.array_equal(got[skip:], ts[: got.size - skip])


def test_atsc_grc_ids_resolve():
    from gnuradio_tpu.grc_import import _match_registry_factory
    for i in ("dtv_atsc_pad", "dtv_atsc_depad", "dtv_atsc_randomizer",
              "dtv_atsc_derandomizer", "dtv_atsc_rs_encoder",
              "dtv_atsc_rs_decoder", "dtv_atsc_interleaver",
              "dtv_atsc_deinterleaver", "dtv_atsc_trellis_encoder",
              "dtv_atsc_viterbi_decoder", "dtv_atsc_field_sync_mux",
              "dtv_atsc_fs_checker", "dtv_atsc_fpll",
              "dtv_atsc_equalizer"):
        assert _match_registry_factory(i)[0] is not None, i
