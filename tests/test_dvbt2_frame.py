"""QA for the DVB-T2 OFDM assembly chain (framemapper -> freqinterleaver
-> pilotgenerator -> paprtr -> p1insertion; reference
gr-dtv/lib/dvbt2/*). Strategy: normative structural invariants (cell
counts per symbol type, L1 field sizes, pilot amplitudes), independent
re-derivations (CRC-32/MPEG-2 vector, BCH long division), and exact
round-trips through every invertible stage."""
import numpy as np
import jax.numpy as jnp
import pytest

from gnuradio_tpu.ops.dvbt2_frame import (
    T2Params, l1pre_cells, l1post_cells, frame_map, freq_interleave_frame,
    freq_deinterleave_frame, frame_freq_symbols, extract_data_cells,
    pilots_and_ifft, cyclic_prefix, p1_insert, miso_split, papr_tr,
    dvbt2_modulate, _crc32_bits, _short_bch_P, SP_AMP, CP_AMP,
)
from gnuradio_tpu.ops import dvbt2_frame as F


def small_params(**kw):
    base = dict(fftsize="2K", guardinterval="1/32", pilotpattern="PP7",
                numdatasyms=20, fecblocks=2, framesize="short",
                constellation="qpsk", rate="1/2", l1constellation="16qam",
                t2frames=2)
    base.update(kw)
    return T2Params(**base)


def rand_cells(p, nf=2, seed=0):
    r = np.random.default_rng(seed)
    c = (r.standard_normal((nf, p.stream_items))
         + 1j * r.standard_normal((nf, p.stream_items))) / np.sqrt(2)
    return c.astype(np.complex64)


def test_crc32_mpeg2_vector():
    # CRC-32/MPEG-2 of ASCII "123456789" is 0x0376E6E7
    data = b"123456789"
    bits = np.array([(b >> k) & 1 for b in data for k in range(7, -1, -1)])
    crc = 0
    for b in _crc32_bits(bits):
        crc = (crc << 1) | int(b)
    assert crc == 0x0376E6E7


def test_short_bch_matches_long_division():
    from gnuradio_tpu.ops.dvbs2 import bch_generator
    g = bch_generator("short", 12)
    assert g.size - 1 == 168
    rng = np.random.default_rng(1)
    msg = rng.integers(0, 2, 500)
    # independent check: polynomial long division with python ints
    gi = 0
    for c in g[::-1]:          # MSB first
        gi = (gi << 1) | int(c)
    r = 0
    for b in msg:
        r = (r << 1) | int(b)
    r <<= 168
    for shift in range(500 - 1, -1, -1):
        if r >> (shift + 168) & 1:
            r ^= gi << shift
    want = np.array([(r >> k) & 1 for k in range(167, -1, -1)])
    P = _short_bch_P(500)      # ad-hoc kbch for the check
    got = (msg @ P) & 1
    assert np.array_equal(got, want)


def test_l1pre_sizes_and_values():
    p = small_params()
    pre = l1pre_cells(p)
    assert pre.shape == (1840,)
    assert np.all(np.abs(pre) == 1.0)          # BPSK
    assert np.all(pre.imag == 0.0)
    # first field: type=0 (8 zero bits) -> first 8 cells all +1
    assert np.all(pre[:8] == 1.0)


def test_l1post_sizing_rule():
    # N_post_temp = 1500; 16QAM with N_P2=8 -> ceil(1500/32)*32 = 1504
    p = small_params()
    assert p.N_post == 1504 and p.N_punc == 8014
    assert p.n_l1post_cells == 376
    post0 = l1post_cells(p, 0)
    post1 = l1post_cells(p, 1)
    assert post0.shape == (376,)
    assert not np.allclose(post0, post1)       # frame_idx is signalled
    # 16QAM magnitudes come from the +-1/+-3 grid / sqrt(10)
    mags = np.unique(np.round(np.abs(post0), 4)).astype(np.float64)
    grid = np.array(sorted({round(abs(a + 1j * b) / np.sqrt(10.0), 4)
                            for a in (1, 3) for b in (1, 3)}))
    assert all(np.min(np.abs(grid - m)) < 1e-3 for m in mags)


@pytest.mark.parametrize("kw", [
    dict(),                                             # 2K PP7
    dict(fftsize="8K", pilotpattern="PP2", guardinterval="1/8"),
    dict(fftsize="8K", pilotpattern="PP4", guardinterval="1/8",
         carriermode="extended"),
    dict(fftsize="16K", pilotpattern="PP6", guardinterval="1/16"),
    dict(fftsize="1K", pilotpattern="PP4", guardinterval="1/4"),
    dict(fftsize="32K", pilotpattern="PP4", guardinterval="1/16",
         numdatasyms=10),
    dict(fftsize="8K", pilotpattern="PP8", guardinterval="1/4"),
    dict(fftsize="8K", pilotpattern="PP7", guardinterval="1/32",
         paprmode="tr"),
    dict(preamble="T2_MISO", misogroup=2, pilotpattern="PP1",
         guardinterval="1/4"),
])
def test_pilot_plan_counts(kw):
    """The strongest structural check: DATA positions per symbol must
    exactly equal the normative C_P2 / C_DATA / N_FC cell counts
    (asserted inside _pilot_plan)."""
    kw.setdefault("fecblocks", 1)
    p = small_params(**kw)
    F._pilot_plan(p)


def test_frame_map_roundtrip_and_layout():
    p = small_params()
    cells = rand_cells(p)
    mapped = np.asarray(frame_map(jnp.asarray(cells), p))
    inv = np.argsort(F._frame_map_perm(p))
    comb = mapped[:, inv]
    assert np.allclose(comb[:, :1840], l1pre_cells(p))
    for fi in range(2):        # frame_idx cycles per frame
        assert np.allclose(comb[fi, 1840:1840 + p.n_l1post_cells],
                           l1post_cells(p, fi))
    d0 = 1840 + p.n_l1post_cells
    assert np.allclose(comb[:, d0:d0 + p.stream_items], cells)
    # FC nulls at the very end
    assert np.allclose(comb[:, p.mapped_items - (p.N_FC - p.C_FC):], 0.0)


def test_frame_map_n_p2_1_is_sequential():
    p = small_params(fftsize="16K", pilotpattern="PP6",
                     guardinterval="1/16", numdatasyms=8)
    assert p.N_P2 == 1
    assert np.array_equal(F._frame_map_perm(p), np.arange(p.mapped_items))


def test_freq_interleave_roundtrip_and_locality():
    p = small_params()
    cells = rand_cells(p)
    mapped = frame_map(jnp.asarray(cells), p)
    inter = freq_interleave_frame(mapped, p)
    back = freq_deinterleave_frame(inter, p)
    assert np.allclose(np.asarray(back), np.asarray(mapped))
    # permutation never crosses symbol boundaries
    src = F._freq_perm_frame(p)
    off = 0
    for L in [p.C_P2] * p.N_P2 + [p.C_DATA] * (p.numdatasyms - p.L_FC) \
            + ([p.N_FC] if p.L_FC else []):
        seg = src[off:off + L]
        assert seg.min() >= off and seg.max() < off + L
        assert np.array_equal(np.sort(seg - off), np.arange(L))
        off += L


def test_freq_interleave_32k_even_inverse():
    p = small_params(fftsize="32K", pilotpattern="PP4",
                     guardinterval="1/16", numdatasyms=4)
    src = F._freq_perm_frame(p)
    # symbol 0 (P2, even) and symbol 1 (data, odd): H_even = inverse of
    # H_odd means applying both yields identity for equal-size symbols;
    # verify via data symbols 1 (odd) and 2 (even)
    off1 = p.N_P2 * p.C_P2
    h_odd = src[off1:off1 + p.C_DATA] - off1
    off2 = off1 + p.C_DATA
    h_even = src[off2:off2 + p.C_DATA] - off2
    assert np.array_equal(h_even[h_odd], np.arange(p.C_DATA))


def test_pilot_amplitudes_and_power():
    p = small_params()
    plan_flat, data_idx, _ = F._pilot_plan(p)
    pil = plan_flat.reshape(p.num_symbols, p.fft_len)
    # a data symbol: scattered amp for PP7 = 7/3, continual amp 2K = 4/3
    sym = pil[p.N_P2]
    mags = np.unique(np.round(np.abs(sym[np.abs(sym) > 0]), 4))
    want = np.array([4 / 3, 7 / 3])
    assert all(np.min(np.abs(want - m)) < 1e-3 for m in mags)
    # P2 symbol: all pilots sqrt(31)/5
    magsp2 = np.unique(np.round(np.abs(pil[0][np.abs(pil[0]) > 0]), 4))
    assert magsp2.size == 1
    assert abs(magsp2[0] - np.sqrt(31.0) / 5.0) < 1e-3


def test_ofdm_symbols_shape_and_roundtrip():
    p = small_params()
    cells = rand_cells(p)
    mapped = frame_map(jnp.asarray(cells), p)
    inter = freq_interleave_frame(mapped, p)
    time = pilots_and_ifft(inter, p)
    assert time.shape == (2, p.num_symbols, p.fft_len)
    # invert the IFFT and re-extract the data cells exactly
    freq = np.fft.fftshift(
        np.fft.fft(np.asarray(time), axis=-1), axes=-1) \
        / (p.fft_len * 5.0 / np.sqrt(27.0 * p.C_PS))
    rec = np.asarray(extract_data_cells(jnp.asarray(freq), p))
    assert np.allclose(rec, np.asarray(inter), atol=1e-4)


def test_cyclic_prefix_and_p1():
    p = small_params()
    cells = rand_cells(p, nf=1)
    time = pilots_and_ifft(
        freq_interleave_frame(frame_map(jnp.asarray(cells), p), p), p)
    stream = cyclic_prefix(time, p)
    assert stream.shape == (1, p.frame_items)
    t = np.asarray(time)
    s = np.asarray(stream).reshape(p.num_symbols, p.fft_len + p.gi_len)
    assert np.allclose(s[:, :p.gi_len], t[0, :, -p.gi_len:])
    assert np.allclose(s[:, p.gi_len:], t[0])
    out = p1_insert(stream, p)
    assert out.shape == (1, p.frame_items + 2048)
    # P1 C-A-B: part C (first 542) is the +1-carrier shifted copy of A's
    # head modulated up — check energy and the A-segment match instead
    from gnuradio_tpu.ops.dvbt2 import p1_symbol
    assert np.allclose(np.asarray(out)[0, :2048], p1_symbol(p.s1, p.s2_fft))


def test_miso_pairing():
    x = (np.arange(8) + 1j * np.arange(8)).astype(np.complex64)[None]
    t1, t2 = miso_split(jnp.asarray(x))
    assert np.allclose(np.asarray(t1), x)
    t2 = np.asarray(t2)[0]
    assert np.allclose(t2[0], -np.conj(x[0, 1]))
    assert np.allclose(t2[1], np.conj(x[0, 0]))
    assert np.allclose(t2[6], -np.conj(x[0, 7]))
    assert np.allclose(t2[7], np.conj(x[0, 6]))


def test_papr_tr_reduces_peak():
    p = small_params(paprmode="tr", vclip=2.0, papr_iterations=10)
    cells = rand_cells(p, nf=1, seed=3)
    time = pilots_and_ifft(
        freq_interleave_frame(frame_map(jnp.asarray(cells), p), p), p)
    before = np.abs(np.asarray(time))
    out = np.asarray(papr_tr(time, p))
    after = np.abs(out)
    # tone reservation is a greedy cancellation; per-symbol peaks can
    # occasionally migrate, but on aggregate the PAPR must drop
    pk_b = before.max(axis=-1)[0]
    pk_a = after.max(axis=-1)[0]
    assert pk_a.mean() < pk_b.mean()
    worst = pk_b.argmax()
    assert pk_a[worst] < pk_b[worst]
    # reserved tones stay reserved: data cells of the corrected symbols
    # still demodulate exactly (correction lives on TR carriers only)
    freq_b = np.fft.fftshift(np.fft.fft(np.asarray(time), axis=-1), axes=-1)
    freq_a = np.fft.fftshift(np.fft.fft(out, axis=-1), axes=-1)
    _, data_idx, _ = F._pilot_plan(p)
    db = freq_b.reshape(1, -1)[:, data_idx]
    da = freq_a.reshape(1, -1)[:, data_idx]
    assert np.allclose(db, da, atol=2e-2)


def test_dvbt2_modulate_end_to_end():
    p = small_params()
    cells = rand_cells(p)
    out = np.asarray(dvbt2_modulate(jnp.asarray(cells), p))
    assert out.shape == (2, p.frame_items + 2048)
    power = float(np.mean(np.abs(out) ** 2))
    assert 0.5 < power < 2.0
