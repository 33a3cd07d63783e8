"""Streaming OFDM packet RX QA — continuous multi-burst stream decoded
through the BLOCK GRAPH (ofdm_sync_sc_cfb -> header_payload_demux ->
per-slot decoder), the reference ofdm_loopback.grc scenario run as blocks
with the padded-slots + validity-masks discipline."""
import numpy as np
import jax.numpy as jnp
import pytest

from gnuradio_tpu import Flowgraph, TopBlock
from gnuradio_tpu.core.stream import PortSpec, B, C, F, I
from gnuradio_tpu.ops import blocks as blk
from gnuradio_tpu.ops.digital import constellation_qpsk
from gnuradio_tpu.ops.ofdm import (allocate_carriers, ofdm_modulate,
                                   schmidl_cox_preamble,
                                   default_occupied_carriers,
                                   DEFAULT_PILOT_CARRIERS,
                                   DEFAULT_PILOT_SYMBOLS)
from gnuradio_tpu.ops.ofdm_streaming import (HeaderPayloadDemux,
                                             OfdmBurstDecoder,
                                             OfdmSyncScCfb,
                                             make_ofdm_header_parser)

FFT, CP = 64, 16
SYM = FFT + CP
NF_MAX = 4


def _tx_burst(rng, nf, make_hdr):
    """[sync1, sync2, header, nf data frames] -> time-domain burst."""
    const = constellation_qpsk()
    occ = default_occupied_carriers(FFT)
    n_occ = len(occ)
    idx = rng.integers(0, 4, nf * n_occ)
    syms = jnp.asarray(const.points)[jnp.asarray(idx, jnp.int32)]
    data_frames = allocate_carriers(syms, nf, FFT, occ,
                                    DEFAULT_PILOT_CARRIERS,
                                    DEFAULT_PILOT_SYMBOLS)
    w1, w2 = schmidl_cox_preamble(FFT)
    hdr = make_hdr(nf)
    frames = jnp.concatenate([
        jnp.asarray(np.stack([w1, w2, hdr]).astype(np.complex64)),
        data_frames], axis=0)
    return np.asarray(ofdm_modulate(frames, CP)), idx


def _build_stream(rng, bursts, region_len, noise=1e-3):
    """Place bursts at one-per-region positions in a noisy stream."""
    n = region_len * (len(bursts) * 2 + 3)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64) * noise
    truth = []
    pos = region_len // 2
    for (td, idx) in bursts:
        x[pos: pos + len(td)] += td
        truth.append((pos, idx))
        pos += 2 * region_len
    return x, truth


def test_streaming_multiburst_ofdm_rx(rng):
    parser, make_hdr = make_ofdm_header_parser(FFT, CP, NF_MAX)
    R = 1024
    Hl = 4 * SYM           # lead margin + 3 preamble/header symbols
    Pm = NF_MAX * SYM
    lead = 24

    nfs = [2, 4, 1, 3]
    bursts = [_tx_burst(rng, nf, make_hdr) for nf in nfs]
    x, truth = _build_stream(rng, bursts, R)

    sync = OfdmSyncScCfb(FFT, CP, threshold=0.7)
    dly = blk.delay(sync.D, C)
    demux = HeaderPayloadDemux(R, Hl, Pm, parser=parser, lead=lead)
    dec = OfdmBurstDecoder(FFT, CP, NF_MAX, Hl, Pm)
    src = blk.vector_source(x)
    freq_snk = blk.vector_sink(jnp.float32)
    idx_snk = blk.VectorSink(PortSpec(I, NF_MAX * dec.n_occ))
    cnt_snk = blk.VectorSink(PortSpec(I))

    fg = Flowgraph()
    fg.connect(src, dly, (demux, 0))
    fg.connect(src, (sync, 0))
    fg.connect((sync, 0), freq_snk)
    fg.connect((sync, 1), (demux, 1))
    for p in range(4):
        fg.connect((demux, p), (dec, p))
    fg.connect((dec, 0), idx_snk)
    fg.connect((dec, 1), cnt_snk)
    TopBlock(fg, target_items=2048).run()

    counts = cnt_snk.data()
    slots = idx_snk.data()
    got = [(i, counts[i]) for i in range(len(counts)) if counts[i] > 0]
    assert len(got) == len(nfs), (got, counts)
    n_occ = dec.n_occ
    for (slot_i, cnt), nf, (_, tx_idx) in zip(got, nfs, bursts):
        assert cnt == nf * n_occ, (cnt, nf * n_occ)
        np.testing.assert_array_equal(slots[slot_i][:cnt], tx_idx)


def test_sync_sc_trigger_positions(rng):
    """Trigger fires once per burst, near the burst start (within the CP
    plateau), and never on noise."""
    parser, make_hdr = make_ofdm_header_parser(FFT, CP, NF_MAX)
    R = 1024
    bursts = [_tx_burst(rng, 2, make_hdr), _tx_burst(rng, 3, make_hdr)]
    x, truth = _build_stream(rng, bursts, R)
    sync = OfdmSyncScCfb(FFT, CP, threshold=0.7)
    src = blk.vector_source(x)
    fsnk = blk.vector_sink(jnp.float32)
    tsnk = blk.vector_sink(jnp.int8)
    fg = Flowgraph()
    fg.connect(src, sync)
    fg.connect((sync, 0), fsnk)
    fg.connect((sync, 1), tsnk)
    TopBlock(fg, target_items=4096).run()
    trig = np.nonzero(tsnk.data())[0]
    assert len(trig) == len(truth), trig
    for t, (pos, _) in zip(trig, truth):
        # trigger in stream coordinates is delayed by sync.D; relative to
        # the burst start it must sit within [-lead_margin, CP plateau]
        rel = t - pos
        # expected: output delay D (= FFT+CP) + mid-plateau offset CP/2,
        # with a few samples of threshold-crossing jitter
        assert sync.D - 10 <= rel <= sync.D + CP + 16, (t, pos, rel)


def test_sync_sc_chunk_invariance(rng):
    parser, make_hdr = make_ofdm_header_parser(FFT, CP, NF_MAX)
    bursts = [_tx_burst(rng, 2, make_hdr)]
    x, _ = _build_stream(rng, bursts, 1024)
    outs = []
    for tgt in (512, 8192):
        sync = OfdmSyncScCfb(FFT, CP, threshold=0.7)
        src = blk.vector_source(x)
        fsnk = blk.vector_sink(jnp.float32)
        tsnk = blk.vector_sink(jnp.int8)
        fg = Flowgraph()
        fg.connect(src, sync)
        fg.connect((sync, 0), fsnk)
        fg.connect((sync, 1), tsnk)
        TopBlock(fg, target_items=tgt).run()
        outs.append((fsnk.data(), tsnk.data()))
    k = min(len(outs[0][1]), len(outs[1][1]))
    np.testing.assert_array_equal(outs[0][1][:k], outs[1][1][:k])
    np.testing.assert_allclose(outs[0][0][:k], outs[1][0][:k],
                               rtol=1e-4, atol=1e-5)
