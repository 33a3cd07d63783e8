"""QA for the ATSC 8-VSB chain (A/53).

Stage goldens are scalar state machines written from the reference
semantics (gr-dtv/lib/atsc/*); the full TX->RX loopback must be byte-exact
after the documented 52-segment deinterleaver delay."""
import numpy as np
import jax.numpy as jnp
import pytest

from gnuradio_tpu.ops import atsc


# ---------------------------------------------------------------------------
# PN sequences
# ---------------------------------------------------------------------------

def test_pn_sequences():
    # A/53 sec 5.5.2: PN511 seed 000000010, first bits; maximal-length
    assert list(atsc.PN511[:16]) == [0, 0, 0, 0, 0, 0, 0, 1, 0, 1, 1, 1,
                                     1, 1, 1, 1]
    assert atsc.PN511.sum() == 256      # 511-bit m-sequence balance
    assert list(atsc.PN63[:8]) == [1, 1, 1, 0, 0, 1, 0, 0]
    assert atsc.PN63.sum() == 32


# ---------------------------------------------------------------------------
# randomizer
# ---------------------------------------------------------------------------

def _rand_golden(pkts):
    """Scalar LFSR per atsc_randomize.h: preload 0x018f, mask 0xa638."""
    out = []
    st = 0
    for i, p in enumerate(pkts.reshape(-1, 188)):
        if i % 312 == 0:
            st = 0x018F
        assert p[0] == 0x47
        for byte in p[1:]:
            b = 0
            for k, sb in enumerate((15, 13, 12, 9, 5, 4, 3, 2)):
                b |= ((st >> sb) & 1) << k
            out.append(byte ^ b)
            st = ((st ^ 0xA638) >> 1) | 0x8000 if st & 1 else st >> 1
    return np.array(out)


def test_randomizer_matches_golden(rng):
    ts = rng.integers(0, 256, 312 * 188)
    ts[::188] = 0x47
    got = np.asarray(atsc.randomize(jnp.asarray(ts)))
    assert (got == _rand_golden(ts)).all()
    back = np.asarray(atsc.derandomize(jnp.asarray(got)))
    assert (back == ts).all()


# ---------------------------------------------------------------------------
# RS(207,187)
# ---------------------------------------------------------------------------

def test_rs_atsc_roundtrip_and_correction(rng):
    data = rng.integers(0, 256, (4, 187))
    cw = np.asarray(atsc.rs_encode(jnp.asarray(data.reshape(-1))))
    assert cw.size == 4 * 207
    cw = cw.reshape(4, 207)
    # corrupt t=10 bytes in one codeword
    bad = cw.copy()
    pos = rng.choice(207, 10, replace=False)
    bad[2, pos] ^= rng.integers(1, 256, 10)
    dec, _ = atsc.rs_decode(jnp.asarray(bad.reshape(-1)))
    assert (np.asarray(dec).reshape(4, 187) == data).all()


# ---------------------------------------------------------------------------
# interleaver
# ---------------------------------------------------------------------------

def test_interleave_deinterleave_is_52_segment_delay(rng):
    n = 312 * 207 * 2
    x = rng.integers(0, 256, n)
    il, _ = atsc.interleave(jnp.asarray(x), atsc.interleaver_init())
    de, _ = atsc.deinterleave(il, atsc.deinterleaver_init())
    de = np.asarray(de)
    d = atsc.LOOPBACK_DELAY_SEGS * 207
    assert d == atsc.DEINTERLEAVER_TAIL  # 10764, exactly 52 segments
    assert (de[d:] == x[:-d]).all()


# ---------------------------------------------------------------------------
# trellis coder
# ---------------------------------------------------------------------------

def _trellis_golden_coder(dibits):
    """Scalar A/53 rate-2/3 coder (precoder + 4-state trellis)."""
    a = b = c = 0
    out = []
    for d in dibits:
        x2, x1 = (d >> 1) & 1, d & 1
        z2 = x2 ^ a
        out.append((z2 << 2) | (x1 << 1) | c)
        a, b, c = z2, c, x1 ^ b
    return out


def test_single_coder_equations(rng):
    dib = rng.integers(0, 4, 100)
    st = jnp.zeros(12, jnp.int32)
    seq = jnp.tile(jnp.asarray(dib)[:, None], (1, 12))
    _, syms = __import__("jax").lax.scan(atsc._enc_step, st, seq)
    assert (np.asarray(syms)[:, 0] == _trellis_golden_coder(dib)).all()


def test_trellis_encode_decode_roundtrip(rng):
    segs = rng.integers(0, 256, (24, 207))           # 2 groups
    syms, st = atsc.trellis_encode(jnp.asarray(segs),
                                   atsc.trellis_encoder_init())
    syms = np.asarray(syms)
    assert syms.shape == (24, 832)
    assert syms.min() >= 0 and syms.max() <= 7
    # segment syncs at the head of every segment: +5,-5,-5,+5 = 6,1,1,6
    assert (syms[:, :4] == [6, 1, 1, 6]).all()
    # MLSE over the exact levels inverts the coder
    levels = syms.astype(np.float32) * 2.0 - 7.0
    back = np.asarray(atsc.trellis_decode(jnp.asarray(levels)))
    assert (back == segs).all()


def test_trellis_decode_corrects_noise(rng):
    segs = rng.integers(0, 256, (12, 207))
    syms, _ = atsc.trellis_encode(jnp.asarray(segs),
                                  atsc.trellis_encoder_init())
    levels = np.asarray(syms).astype(np.float32) * 2.0 - 7.0
    noisy = levels + rng.normal(0, 0.5, levels.shape).astype(np.float32)
    back = np.asarray(atsc.trellis_decode(jnp.asarray(noisy)))
    assert (back == segs).all()


# ---------------------------------------------------------------------------
# field sync
# ---------------------------------------------------------------------------

def test_field_sync_layout():
    fs1 = np.asarray(atsc.field_sync_segment(False, jnp.zeros(12, jnp.int32)))
    fs2 = np.asarray(atsc.field_sync_segment(True, jnp.zeros(12, jnp.int32)))
    assert fs1.shape == (832,)
    assert (fs1[:4] == [6, 1, 1, 6]).all()              # segment sync
    # PN511 region binary-mapped to {1, 6}
    assert set(np.unique(fs1[4:515])) <= {1, 6}
    # middle PN63 inverted on field 2, outer two identical
    assert (fs1[515:578] == fs2[515:578]).all()
    assert (fs1[578:641] + fs2[578:641] == 7).all()
    assert (fs1[641:704] == fs2[641:704]).all()


# ---------------------------------------------------------------------------
# full loopback
# ---------------------------------------------------------------------------

def test_atsc_tx_rx_loopback_byte_exact(rng):
    nfields = 3
    ts = rng.integers(0, 256, nfields * 312 * 188)
    ts[::188] = 0x47
    ts[1::188] &= 0x7F                                   # no TEI bit
    syms, _ = atsc.atsc_tx_symbols(jnp.asarray(ts))
    assert syms.shape == (nfields * 313, 832)
    levels = atsc.vsb_map(syms.reshape(-1)) - atsc.PILOT
    rs_segs, _ = atsc.atsc_rx_segments(levels)
    d = atsc.LOOPBACK_DELAY_SEGS
    aligned = np.asarray(rs_segs)[d:]
    nf_out = aligned.shape[0] // 312 * 312
    got = np.asarray(atsc.atsc_rx_fields(jnp.asarray(aligned[:nf_out])))
    assert (got == ts[:got.size]).all()


def test_atsc_loopback_with_noise(rng):
    ts = rng.integers(0, 256, 312 * 188)
    ts[::188] = 0x47
    syms, _ = atsc.atsc_tx_symbols(jnp.asarray(ts))
    levels = np.asarray(atsc.vsb_map(syms.reshape(-1))) - atsc.PILOT
    noisy = levels + rng.normal(0, 0.4, levels.shape).astype(np.float32)
    rs_segs, _ = atsc.atsc_rx_segments(jnp.asarray(noisy))
    # with only one field, only segments [52:312] of the output are real
    aligned = np.asarray(rs_segs)[atsc.LOOPBACK_DELAY_SEGS:]
    # decode the RS domain directly against TX's RS stream
    want = np.asarray(atsc.rs_encode(atsc.randomize(jnp.asarray(ts))))
    il, _ = atsc.interleave(jnp.asarray(want), atsc.interleaver_init())
    # (noise was corrected by viterbi; deinterleaved stream matches TX RS)
    assert (aligned.reshape(-1) == want[:aligned.size]).all()
