"""DVB-T receive front-end QA (round 4): acquisition + CFO + channel
equalization + TPS frame sync over impaired channels, byte-exact after RS.

Reference chain being matched: gr-dtv/examples/dvbt_rx_8k.grc —
dvbt_ofdm_sym_acquisition -> fft -> dvbt_demod_reference_signals ->
dvbt_demap -> deinterleavers -> dvbt_viterbi_decoder -> RS -> descrambler.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from gnuradio_tpu.ops import dtv
from gnuradio_tpu.ops.dtv_rx import dvbt_rx


def _impair(bb, N, rng, delay=150, cfo_bins=0.0, multipath=True,
            snr_db=25.0):
    x = bb.astype(np.complex64)
    if multipath:
        h = np.zeros(40, np.complex64)
        h[0] = 1.0
        h[17] = 0.25 * np.exp(1j * 1.1)
        h[33] = 0.12 * np.exp(-1j * 0.4)
        x = np.convolve(x, h)[: len(x)]
    x = np.concatenate([np.zeros(delay, np.complex64), x])
    if cfo_bins:
        x = x * np.exp(2j * np.pi * cfo_bins / N * np.arange(len(x)))
    if snr_db is not None:
        p = np.mean(np.abs(x) ** 2)
        nstd = np.sqrt(p / 10 ** (snr_db / 10) / 2)
        x = x + nstd * (rng.standard_normal(len(x))
                        + 1j * rng.standard_normal(len(x)))
    return x.astype(np.complex64)


def test_dvbt_rx_2k_multipath_cfo_awgn(rng):
    """2k QPSK 1/2: delay + 3-tap multipath + 3.2-bin CFO + AWGN 25 dB ->
    byte-exact, and the acquisition decisions are the ground truth."""
    cfg = dtv.DVBTConfig(constellation=dtv.MOD_QPSK, code_rate=dtv.C1_2)
    nbytes = 2 * dtv.dvbt_tx_bytes_per_superframe(cfg)
    ts = rng.integers(0, 256, nbytes)
    ts[::188] = 0x47
    bb = np.asarray(dtv.dvbt_tx(jnp.asarray(ts), cfg, disperse=True))
    x = _impair(bb, cfg.fft_length, rng, delay=150, cfo_bins=3.2)
    data, info = dvbt_rx(x, cfg, nbytes, snr_db=25.0, return_info=True)
    assert info["cp_start"] == 150
    assert info["int_cfo"] == 3
    assert abs(info["eps"] - 2 * np.pi * 0.2) < 0.02
    assert info["frame_w"] == 0 and info["first_symbol"] == 0
    good = (504 * 204 - 12 * 17 * 11) // 204 * 188
    assert np.array_equal(np.asarray(data)[:good], ts[:good])


def test_dvbt_rx_8k_multipath_cfo_awgn(rng):
    """8k QPSK 1/2 guard 1/8, one superframe (1008 packets, dispersal-
    aligned): multipath + negative CFO + AWGN -> byte-exact."""
    cfg = dtv.DVBTConfig(constellation=dtv.MOD_QPSK, code_rate=dtv.C1_2,
                         transmission_mode=dtv.T8K, guard=dtv.GI_1_8)
    nbytes = dtv.dvbt_tx_bytes_per_superframe(cfg)
    ts = rng.integers(0, 256, nbytes)
    ts[::188] = 0x47
    bb = np.asarray(dtv.dvbt_tx(jnp.asarray(ts), cfg, disperse=True))
    x = _impair(bb, cfg.fft_length, rng, delay=777, cfo_bins=-2.3,
                snr_db=24.0)
    data, info = dvbt_rx(x, cfg, nbytes, snr_db=24.0, return_info=True)
    assert info["cp_start"] == 777
    assert info["int_cfo"] == -2
    assert info["frame_w"] == 0
    npkt = nbytes // 188
    good = (npkt * 204 - 12 * 17 * 11) // 204 * 188
    assert np.array_equal(np.asarray(data)[:good], ts[:good])


def test_dvbt_rx_16qam_no_impairment_parity(rng):
    """16QAM 3/4 2k through the full front end on a clean (delay-only)
    channel must equal the perfect-sync loopback path bytes."""
    cfg = dtv.DVBTConfig(constellation=dtv.MOD_16QAM, code_rate=dtv.C3_4)
    nbytes = 2 * dtv.dvbt_tx_bytes_per_superframe(cfg)
    ts = rng.integers(0, 256, nbytes)
    ts[::188] = 0x47
    bb = np.asarray(dtv.dvbt_tx(jnp.asarray(ts), cfg, disperse=True))
    x = _impair(bb, cfg.fft_length, rng, delay=64, multipath=False,
                snr_db=None)
    data = np.asarray(dvbt_rx(x, cfg, nbytes, snr_db=30.0))
    ref = np.asarray(dtv.dvbt_rx_loopback(jnp.asarray(bb), cfg, nbytes))
    assert np.array_equal(data, ref)


def test_dvbt_rx_midstream_pickup(rng):
    """RX tuned mid-stream: drop 3 frames + 5 symbols of TX — TPS frame
    sync must find the next superframe boundary (frame_w != 0) and decode
    the second superframe (conv-deinterleaver transient skipped; dispersal
    off to avoid the 8-packet group re-alignment that 2k QPSK superframes
    don't preserve — the reference MUX sync search has the same contract)."""
    cfg = dtv.DVBTConfig(constellation=dtv.MOD_QPSK, code_rate=dtv.C1_2)
    sfbytes = dtv.dvbt_tx_bytes_per_superframe(cfg)
    nbytes = 3 * sfbytes
    ts = rng.integers(0, 256, nbytes)
    ts[::188] = 0x47
    bb = np.asarray(dtv.dvbt_tx(jnp.asarray(ts), cfg, disperse=False))
    slen = cfg.fft_length + cfg.guard_length
    ncut = (3 * 68 + 5)
    x = _impair(bb[ncut * slen:], cfg.fft_length, rng, delay=90,
                snr_db=28.0)
    data, info = dvbt_rx(x, cfg, sfbytes, snr_db=28.0, disperse=False,
                         return_info=True)
    # first full symbol is ncut+1 (the cut lands mid-symbol... delay=90 <
    # slen keeps the timing fold on the true boundary); superframe boundary
    # = symbol 272, i.e. received symbol 272 - (ncut + 0)
    assert info["frame_w"] == ncut % 272
    assert info["first_symbol"] == (272 - ncut) % 272
    # decoded stream = superframe 1 data, after the deinterleaver transient
    skip = 12 * 17 * 11 // 204 * 188 + 188   # transient, rounded to packets
    got = np.asarray(data)[skip: sfbytes - 2244]
    want = ts[sfbytes + skip: 2 * sfbytes - 2244]
    assert np.mean(got == want) > 0.999, np.mean(got == want)


# ---------------------------------------------------------------------------
# streaming-block RX chain + dvbt_rx_8k.grc importer coverage
# ---------------------------------------------------------------------------

def test_dvbt_rx_blocks_byte_exact(rng):
    """The RX stages as streaming graph blocks (TopBlock), mirroring the
    dvbt_rx_8k.grc chain: acquisition -> FFT -> demod_reference_signals ->
    demap -> deinterleavers -> Viterbi -> conv deinterleave -> RS. The
    acquisition adds one symbol latency and the demod one superframe
    (static-shape analogs of the reference's dynamic consume), so the
    payload appears in later chunks — byte-exact after alignment search."""
    import jax.numpy as jnp
    from gnuradio_tpu.core.graph import Flowgraph
    from gnuradio_tpu.core.runtime import TopBlock
    from gnuradio_tpu.core.stream import PortSpec
    from gnuradio_tpu.ops.blocks import (StreamSource, vector_sink_b,
                                         stream_to_vector, vector_to_stream)
    from gnuradio_tpu.ops.fft import fft_vcc
    from gnuradio_tpu.ops import dtv_blocks as DB

    cfg = dtv.DVBTConfig(constellation=dtv.MOD_QPSK, code_rate=dtv.C1_2)
    sfbytes = dtv.dvbt_tx_bytes_per_superframe(cfg)
    nbytes = 3 * sfbytes
    ts = rng.integers(0, 256, nbytes)
    ts[::188] = 0x47
    bb = np.asarray(dtv.dvbt_tx(jnp.asarray(ts), cfg, disperse=False))

    fg = Flowgraph()
    src = StreamSource(bb.astype(np.complex64), out_port=PortSpec())
    acq = DB.DvbtOfdmSymAcquisition(cfg)
    s2v = stream_to_vector(cfg.fft_length)
    fft = fft_vcc(cfg.fft_length, forward=True, shift=True)
    v2s = vector_to_stream(cfg.fft_length)
    dem = DB.DvbtDemodReferenceSignals(cfg)
    dmp = DB.DvbtDemap(cfg)
    sdi = DB.DvbtSymbolInnerInterleaver(cfg, direction=0)
    bdi = DB.DvbtBitInnerDeinterleaver(cfg)
    vit = DB.DvbtViterbiDecoder(cfg)
    cdi = DB.DvbtConvolutionalDeinterleaver()
    rsd = DB.DvbtReedSolomonDec()
    snk = vector_sink_b()
    fg.connect(src, acq, s2v, fft, v2s, dem, dmp, sdi, bdi, vit, cdi,
               rsd, snk)
    tb = TopBlock(fg)
    tb.run(n_steps=3)
    out = np.asarray(snk.data()).astype(np.int64) & 0xFF
    # locate ts in the output stream (prologue superframe + deinterleaver
    # transient precede it)
    pat = ts[:188]
    hit = -1
    for off in range(0, len(out) - 188):
        if np.array_equal(out[off: off + 188], pat):
            hit = off
            break
    assert hit >= 0, "TS start not found in decoded stream"
    span = min(len(out) - hit, sfbytes)
    assert np.array_equal(out[hit: hit + span], ts[:span])


def test_dvbt_rx_8k_grc_loads(tmp_path):
    """dvbt_rx_8k.grc (gr-dtv/examples) loads through the importer with
    its native 8k/16QAM parameters — every RX block id resolves."""
    from gnuradio_tpu.grc_import import load_reference_grc
    cfile = tmp_path / "adv16.cfile"
    np.zeros(2048, np.complex64).tofile(cfile)
    tb, blocks = load_reference_grc(
        "/root/reference/gr-dtv/examples/dvbt_rx_8k.grc",
        overrides={"blocks_file_source_0_0": {"file": str(cfile)},
                   "blocks_file_sink_0": {"file": str(tmp_path / "o.ts")},
                   "fft_vxx_0": {"window": None}},
        extra_adapters={"uhd_usrp_source": lambda p, ns: None})
    for bid in ("dtv_dvbt_ofdm_sym_acquisition_0",
                "dtv_dvbt_demod_reference_signals_0",
                "dtv_dvbt_demap_0", "dtv_dvbt_viterbi_decoder_0",
                "dtv_dvbt_reed_solomon_dec_0",
                "dtv_dvbt_energy_descramble_0"):
        assert bid in blocks, bid


def test_dvbt_rx_8k_grc_runs_2k_override(tmp_path, rng):
    """The same .grc RUNS end-to-end (decodes real TX baseband to TS
    bytes) with parameters overridden to 2k QPSK 1/2 to keep CPU QA fast."""
    import jax.numpy as jnp
    from gnuradio_tpu.grc_import import load_reference_grc

    cfg = dtv.DVBTConfig(constellation=dtv.MOD_QPSK, code_rate=dtv.C1_2)
    sfbytes = dtv.dvbt_tx_bytes_per_superframe(cfg)
    ts = rng.integers(0, 256, 4 * sfbytes)
    ts[::188] = 0x47
    bb = np.asarray(dtv.dvbt_tx(jnp.asarray(ts), cfg, disperse=True))
    cfile = tmp_path / "tx.cfile"
    bb.astype(np.complex64).tofile(cfile)
    out_ts = tmp_path / "out.ts"
    two_k = {"transmission_mode": "T2k", "constellation": "qpsk",
             "code_rate_hp": "C1_2", "code_rate": "C1_2",
             "guard_interval": "GI_1_32"}
    tb, blocks = load_reference_grc(
        "/root/reference/gr-dtv/examples/dvbt_rx_8k.grc",
        overrides={
            "blocks_file_source_0_0": {"file": str(cfile)},
            "blocks_file_sink_0": {"file": str(out_ts)},
            "fft_vxx_0": {"fft_size": 2048, "window": None},
            "dtv_dvbt_ofdm_sym_acquisition_0": {"fft_length": 2048,
                                                "cp_length": 64,
                                                **two_k},
            "dtv_dvbt_demod_reference_signals_0": two_k,
            "dtv_dvbt_demap_0": two_k,
            "dtv_dvbt_symbol_inner_interleaver_0": {"direction": 0,
                                                    **two_k},
            "dtv_dvbt_bit_inner_deinterleaver_0": two_k,
            "dtv_dvbt_viterbi_decoder_0": two_k,
            "blocks_vector_to_stream_0": {"num_items": 2048},
            "blocks_vector_to_stream_0_0": {"num_items": 1512},
            "blocks_vector_to_stream_1": {"num_items": 1512},
        },
        extra_adapters={"uhd_usrp_source": lambda p, ns: None})
    tb.run(n_steps=2)
    blocks["blocks_file_sink_0"].flush()
    out = np.fromfile(out_ts, np.uint8).astype(np.int64)
    # dispersal-group (1504B) alignment holds modulo the prologue; find the
    # TS sync pattern and check a run of packets
    hits = [off for off in range(0, len(out) - 188)
            if out[off] == 0x47 and np.array_equal(out[off:off + 188],
                                                   ts[:188])]
    assert hits, "TS start not found in descrambled output"
