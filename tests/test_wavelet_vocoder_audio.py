"""QA: wavelet DWT (perfect reconstruction, energy), vocoder codecs
(G.711 bit-exact vs audioop, CVSD tracks audio), audio registry."""
import warnings

import numpy as np
import jax.numpy as jnp
import pytest

from gnuradio_tpu import Flowgraph, TopBlock
from gnuradio_tpu.ops import blocks as blk
from gnuradio_tpu.ops import wavelet as wv
from gnuradio_tpu.ops import vocoder as vc
from gnuradio_tpu.ops import audio


def run_graph(*chain, **kw):
    fg = Flowgraph()
    fg.connect(*chain)
    TopBlock(fg, **kw).run()


# ---------------------------------------------------------------------------
# wavelet
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("order", [2, 4, 8])
def test_dwt_perfect_reconstruction(rng, order):
    x = rng.standard_normal((3, 64)).astype(np.float32)
    c = wv.dwt_forward(jnp.asarray(x), order)
    back = np.asarray(wv.dwt_inverse(c, order))
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_dwt_energy_preserved(rng):
    x = rng.standard_normal(128).astype(np.float32)
    c = np.asarray(wv.dwt_forward(jnp.asarray(x), 4))
    assert abs((c ** 2).sum() - (x ** 2).sum()) < 1e-3


def test_wavelet_block(rng):
    x = rng.standard_normal((4, 32)).astype(np.float32)
    src = blk.vector_source(x, dtype=jnp.float32, vlen=32)
    fwd = wv.wavelet_ff(32, 4, True)
    inv = wv.wavelet_ff(32, 4, False)
    snk = blk.vector_sink(jnp.float32, vlen=32)
    run_graph(src, fwd, inv, snk)
    np.testing.assert_allclose(snk.data(), x, atol=1e-4)


def test_wvps_detects_scale(rng):
    # a fast alternating signal concentrates power in fine-detail bands
    x = np.tile([1.0, -1.0], 64).astype(np.float32)
    ps = np.asarray(wv.WvpsFF(128, 2).apply(None, (jnp.asarray(x[None]),),
                                            (1,))[1][0])[0]
    assert ps[-1] == ps.max()  # finest octave dominates


# ---------------------------------------------------------------------------
# vocoder
# ---------------------------------------------------------------------------

def test_g711_bit_exact_vs_audioop(rng):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import audioop
    x = np.concatenate([rng.integers(-32768, 32768, 4000),
                        [0, 1, -1, 32767, -32768]]).astype(np.int16)
    for enc, dec, lin2, toline in [
            (vc.alaw_encode, vc.alaw_decode, audioop.lin2alaw,
             audioop.alaw2lin),
            (vc.ulaw_encode, vc.ulaw_decode, audioop.lin2ulaw,
             audioop.ulaw2lin)]:
        mine = np.asarray(enc(jnp.asarray(x))).astype(np.uint8)
        want = np.frombuffer(lin2(x.tobytes(), 2), np.uint8)
        assert (mine == want).all()
        codes = np.arange(256, dtype=np.uint8)
        dmine = np.asarray(dec(jnp.asarray(codes.view(np.int8))))
        dwant = np.frombuffer(toline(codes.tobytes(), 2), np.int16)
        assert (dmine == dwant).all()


def test_g711_blocks_roundtrip(rng):
    x = rng.integers(-20000, 20000, 512).astype(np.int16)
    src = blk.vector_source(x, dtype=jnp.int16)
    enc = vc.alaw_encode_sb()
    dec = vc.alaw_decode_bs()
    snk = blk.vector_sink_s()
    run_graph(src, enc, dec, snk)
    out = snk.data()
    # A-law quantization error bound: segment step / 2 (~6% of magnitude)
    err = np.abs(out.astype(np.int64) - x.astype(np.int64))
    bound = np.maximum(np.abs(x.astype(np.int64)) * 0.07, 64)
    assert (err <= bound).all()


def test_cvsd_tracks_audio(rng):
    fs = 64000.0
    t = np.arange(16000) / fs
    x = (12000 * np.sin(2 * np.pi * 800 * t)).astype(np.int16)
    src = blk.vector_source(x, dtype=jnp.int16)
    enc = vc.cvsd_encode_sb()
    dec = vc.cvsd_decode_bs()
    snk = blk.vector_sink_s()
    run_graph(src, enc, dec, snk)
    out = snk.data().astype(np.float64)
    ref = x.astype(np.float64)
    # after slope adaptation settles, correlation should be high
    c = np.corrcoef(out[4000:], ref[4000:])[0, 1]
    assert c > 0.95


def test_no_gated_codecs_remain():
    # round 3: gsm_fr, codec2 AND freedv are all native now (ops/gsm_fr.py,
    # ops/codec2_native.py, ops/freedv.py) — nothing in gr-vocoder's
    # catalog raises anymore
    assert vc.freedv_tx_ss() is not None
    assert vc.freedv_rx_ss() is not None
    assert vc.codec2_encode_sp() is not None
    assert vc.gsm_fr_encode_sp() is not None


# ---------------------------------------------------------------------------
# audio registry
# ---------------------------------------------------------------------------

def test_audio_registry_and_wav_backend(rng, tmp_path):
    assert "wav" in audio.backends() and "null" in audio.backends()
    fs = 8000
    path = str(tmp_path / "out.wav")
    x = (0.25 * np.sin(2 * np.pi * 440 * np.arange(4000) / fs)
         ).astype(np.float32)
    src = blk.vector_source(x, dtype=jnp.float32)
    snk = audio.audio_sink(fs, path)
    run_graph(src, snk)
    snk.flush()
    rsrc = audio.audio_source(fs, path)
    rsnk = blk.vector_sink_f()
    run_graph(rsrc, rsnk)
    np.testing.assert_allclose(rsnk.data(), x, atol=2 / 32768)


# ---------------------------------------------------------------------------
# G.726-family ADPCM (g721 / g723_24 / g723_40)
# ---------------------------------------------------------------------------

def _adpcm_snr(bits, n=4000):
    import jax
    from gnuradio_tpu.ops.adpcm import AdpcmEncoder, AdpcmDecoder
    fs = 8000.0
    t = np.arange(n) / fs
    x = (0.3 * np.sin(2 * np.pi * 420 * t)
         + 0.15 * np.sin(2 * np.pi * 1100 * t)).astype(np.float32)
    enc, dec = AdpcmEncoder(bits), AdpcmDecoder(bits)
    se = jax.jit(enc.init_state)()
    sd = jax.jit(dec.init_state)()
    se, codes = jax.jit(enc.work)(se, jnp.asarray(x))
    sd, y = jax.jit(dec.work)(sd, codes)
    y = np.asarray(y)
    d = y[200:] - x[200:]
    return 10 * np.log10(np.mean(x[200:] ** 2) / np.mean(d ** 2))


def test_adpcm_roundtrip_snr_and_rate_ordering():
    s3 = _adpcm_snr(3)
    s4 = _adpcm_snr(4)
    s5 = _adpcm_snr(5)
    assert s3 > 20.0, s3   # 24 kbit/s
    assert s4 > 30.0, s4   # 32 kbit/s (G.721)
    assert s5 > 36.0, s5   # 40 kbit/s
    assert s3 < s4 < s5    # more bits -> better


def test_adpcm_block_graph_roundtrip(rng):
    import jax
    from gnuradio_tpu import Flowgraph, TopBlock
    from gnuradio_tpu.ops import blocks as blk
    from gnuradio_tpu.ops.vocoder import g721_encode_bs, g721_decode_bs
    fs = 8000.0
    t = np.arange(4096) / fs
    x = (0.4 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    src = blk.vector_source(x, dtype=jnp.float32)
    enc, dec = g721_encode_bs(), g721_decode_bs()
    snk = blk.vector_sink(jnp.float32)
    fg = Flowgraph()
    fg.connect(src, enc, dec, snk)
    TopBlock(fg, target_items=1024).run()
    y = snk.data()
    d = y[200:] - x[200:len(y)]
    snr = 10 * np.log10(np.mean(x[200:len(y)] ** 2) / np.mean(d ** 2))
    assert snr > 30.0, snr
