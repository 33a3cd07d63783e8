"""QA: native GSM 06.10 full-rate codec (ops/gsm_fr.py) + codec2-mode
vocoder (ops/codec2_native.py).

The GSM round-trip test reproduces the reference's OWN golden vector
(gr-vocoder/python/vocoder/qa_gsm_full_rate.py test001) — bit-exactness
against libgsm's output for that input."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnuradio_tpu.ops.gsm_fr import (GsmFrDecoder, GsmFrEncoder, pack_frame,
                                     unpack_frame)

_GOLDEN_IN = np.array(20 * (100, 200, 300, 400, 500, 600, 700, 800),
                      np.int16)
_GOLDEN_OUT = np.array([
    0, 0, 360, 304, 256, 720, 600, 504, 200, 144, 128, 464,
    376, 384, 680, 576, 440, 264, 176, 176, 640, 520, 480,
    464, 384, 288, 432, 296, 328, 760, 624, 504, 176, 96, 96,
    416, 312, 360, 808, 672, 216, 104, 136, 504, 376, 448,
    720, 608, 296, 304, 176, 336, 576, 456, 560, 512, 320,
    216, 344, 264, 456, 672, 576, 488, 192, 80, 152, 424,
    368, 552, 688, 560, 280, 200, 104, 256, 520, 464, 608,
    488, 184, 104, 16, 472, 456, 360, 696, 568, 208, 136, 88,
    376, 480, 456, 616, 472, 232, 224, 264, 320, 512, 624,
    632, 520, 176, 80, 192, 304, 400, 592, 664, 552, 248, 152,
    144, 336, 440, 520, 616, 664, 304, 176, 80, 536, 448, 376,
    680, 600, 240, 168, 112, 408, 488, 472, 608, 480, 240, 232,
    208, 288, 480, 600, 616, 520, 176, 88, 184, 296, 392, 584,
    656, 552, 248, 160, 144, 336, 432, 512, 608, 664], np.int16)


def test_gsm_golden_vector_bit_exact():
    enc, dec = GsmFrEncoder(), GsmFrDecoder()
    frames = enc.encode(_GOLDEN_IN)
    assert len(frames) == 33
    assert frames[0] >> 4 == 0xD          # libgsm magic
    out = dec.decode(frames)
    np.testing.assert_array_equal(out, _GOLDEN_OUT)


def test_gsm_frame_pack_roundtrip():
    enc = GsmFrEncoder()
    rng = np.random.default_rng(3)
    pcm = (2000 * np.sin(2 * np.pi * 0.03 * np.arange(480))
           + 100 * rng.standard_normal(480)).astype(np.int16)
    import gnuradio_tpu.ops.gsm_fr as G
    S = G.GsmState()
    for j in range(3):
        f = G.encode_frame(S, pcm[160 * j: 160 * j + 160])
        assert unpack_frame(pack_frame(f)) == f


def test_gsm_multiframe_speech_snr():
    """Tone-ish 'speech' through encode+decode keeps reasonable segmental
    SNR once the codec settles (the reference QA uses an equivalent
    round-trip check)."""
    n = 160 * 10
    t = np.arange(n)
    pcm = (4000 * np.sin(2 * np.pi * 250 / 8000 * t)
           * (0.6 + 0.4 * np.sin(2 * np.pi * 3 / 8000 * t))).astype(np.int16)
    enc, dec = GsmFrEncoder(), GsmFrDecoder()
    out = dec.decode(enc.encode(pcm)).astype(np.float64)
    x = pcm.astype(np.float64)
    seg = slice(480, n)
    # align: codec has zero delay frame-to-frame for this check
    err = out[seg] - x[seg]
    snr = 10 * np.log10(np.sum(x[seg] ** 2) / max(np.sum(err ** 2), 1e-9))
    # RPE-LTP is a speech codec; on this synthetic AM tone libgsm itself
    # lands near 8 dB — the bit-exactness proof is the golden-vector test
    assert snr > 6.0, f"gsm round-trip SNR too low: {snr:.1f} dB"


def test_gsm_blocks_through_graph():
    from gnuradio_tpu.core.graph import Flowgraph
    from gnuradio_tpu.core.runtime import TopBlock
    from gnuradio_tpu.core.stream import PortSpec, S
    from gnuradio_tpu.ops.blocks import StreamSource, VectorSink
    from gnuradio_tpu.ops.vocoder import gsm_fr_decode_ps, gsm_fr_encode_sp
    data = np.tile(_GOLDEN_IN, 2)
    src = StreamSource(data, out_port=PortSpec(S))
    enc = gsm_fr_encode_sp()
    dec = gsm_fr_decode_ps()
    snk = VectorSink(PortSpec(S))
    fg = Flowgraph()
    fg.connect(src, enc, dec, snk)
    TopBlock(fg).run()
    out = np.asarray(snk.data())
    assert len(out) == len(data)
    np.testing.assert_array_equal(out[:160], _GOLDEN_OUT)


@pytest.mark.parametrize("mode", [3200, 2400])
def test_codec2_rate_contract_and_roundtrip(mode):
    from gnuradio_tpu.ops.codec2_native import Codec2, bits_per_frame
    c2 = Codec2(mode)
    n = 160 * 6
    t = np.arange(n)
    pcm = (6000 * np.sin(2 * np.pi * 150 / 8000 * t)).astype(np.int16)
    bits = c2.encode_bits(pcm)
    # the reference QA's length contract: len(data)*16*mode/128000 bits
    assert len(bits) == (n * 16) * mode // 128000
    assert len(bits) == (n // 160) * bits_per_frame(mode)
    dec = Codec2(mode)
    out = dec.decode_bits(bits)
    assert len(out) == n
    # decoded energy tracks input energy (vocoder, not waveform codec)
    e_in = np.sqrt(np.mean((pcm / 32768.0) ** 2))
    e_out = np.sqrt(np.mean((out[320:] / 32768.0) ** 2))
    assert 0.3 * e_in < e_out < 3.0 * e_in
    # and the dominant output frequency is the input pitch-ish band
    spec = np.abs(np.fft.rfft(out[320:].astype(float)))
    f = np.argmax(spec) * 8000.0 / len(out[320:])
    assert 80 < f < 1000
