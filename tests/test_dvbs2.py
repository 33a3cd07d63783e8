"""QA for the DVB-S2 chain (ETSI EN 302 307-1).

Scalar goldens written from the spec recurrences; TX->RX hard-decision
loopback must be bit-exact; codewords must satisfy the LDPC checks."""
import numpy as np
import jax.numpy as jnp
import pytest

from gnuradio_tpu.ops import dvbs2


def _ts(rng, npkts):
    ts = rng.integers(0, 256, npkts * 188)
    ts[::188] = 0x47
    return ts


# ---------------------------------------------------------------------------
# BB scrambler
# ---------------------------------------------------------------------------

def test_bbscrambler_prbs():
    seq = dvbs2._bb_scramble_seq()
    # golden scalar LFSR x^15+x^14+1 seed 0x4A80
    sr = 0x4A80
    want = []
    for _ in range(100):
        b = (sr ^ (sr >> 1)) & 1
        want.append(b)
        sr >>= 1
        if b:
            sr |= 0x4000
    assert list(seq[:100]) == want
    x = jnp.asarray(np.arange(200) % 2).reshape(1, 200)
    assert (np.asarray(dvbs2.bbscramble(dvbs2.bbscramble(x))) ==
            np.asarray(x)).all()


# ---------------------------------------------------------------------------
# BCH
# ---------------------------------------------------------------------------

def test_bch_generator_degrees():
    assert dvbs2.bch_generator("normal", 12).size - 1 == 192
    assert dvbs2.bch_generator("normal", 10).size - 1 == 160
    assert dvbs2.bch_generator("normal", 8).size - 1 == 128
    assert dvbs2.bch_generator("short", 12).size - 1 == 168
    for fs, t in [("normal", 12), ("short", 12)]:
        g = dvbs2.bch_generator(fs, t)
        assert g[0] == 1 and g[-1] == 1


def _gf2_rem(c, g):
    """Remainder of polynomial c (MSB first) divided by g (LSB first)."""
    c = list(c)
    gd = len(g) - 1
    grev = list(g[::-1])  # MSB first
    for i in range(len(c) - gd):
        if c[i]:
            for j, gc in enumerate(grev):
                c[i + j] ^= gc
    return c[-gd:]


def test_bch_encode_is_valid_codeword(rng):
    cfg = dvbs2.DVBS2Config("short", "1/2", "qpsk")
    bits = rng.integers(0, 2, (1, cfg.kbch))
    cw = np.asarray(dvbs2.bch_encode(jnp.asarray(bits), cfg))[0]
    assert cw.shape == (cfg.nbch,)
    g = dvbs2.bch_generator("short", 12)
    # transmission order = polynomial MSB-first
    rem = _gf2_rem(cw, g)
    assert not any(rem)
    assert (cw[:cfg.kbch] == bits[0]).all()


# ---------------------------------------------------------------------------
# LDPC
# ---------------------------------------------------------------------------

def _ldpc_golden(info, cfg):
    """Scalar accumulator encoder per EN 302 307-1 5.3.2."""
    pbits = cfg.frame - cfg.nbch
    p = np.zeros(pbits, np.int64)
    for r, row in enumerate(cfg.ldpc_table):
        for n in range(360):
            m = r * 360 + n
            if m >= cfg.nbch:
                break
            for x in row:
                p[(x + n * cfg.q) % pbits] ^= info[m]
    for j in range(1, pbits):
        p[j] ^= p[j - 1]
    return p


@pytest.mark.parametrize("rate", ["1/2", "3/5", "2/3", "3/4", "8/9"])
def test_ldpc_encode_matches_golden_and_checks(rng, rate):
    cfg = dvbs2.DVBS2Config("short", rate, "qpsk")
    info = rng.integers(0, 2, (1, cfg.nbch))
    cw = np.asarray(dvbs2.ldpc_encode(jnp.asarray(info), cfg))[0]
    assert cw.size == cfg.frame
    assert (cw[:cfg.nbch] == info[0]).all()
    want_p = _ldpc_golden(info[0], cfg)
    assert (cw[cfg.nbch:] == want_p).all()
    syn = np.asarray(dvbs2.ldpc_syndrome(jnp.asarray(cw[None]), cfg))
    assert not syn.any()


def test_ldpc_normal_frame_checks(rng):
    cfg = dvbs2.DVBS2Config("normal", "1/2", "qpsk")
    info = rng.integers(0, 2, (1, cfg.nbch))
    cw = dvbs2.ldpc_encode(jnp.asarray(info), cfg)
    assert not np.asarray(dvbs2.ldpc_syndrome(cw, cfg)).any()


# ---------------------------------------------------------------------------
# interleaver + constellations
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("const,rate", [("qpsk", "1/2"), ("8psk", "3/5"),
                                        ("8psk", "2/3"), ("16apsk", "2/3"),
                                        ("32apsk", "3/4")])
def test_interleave_modulate_roundtrip(rng, const, rate):
    cfg = dvbs2.DVBS2Config("short", rate, const)
    cw = rng.integers(0, 2, (2, cfg.frame))
    syms = dvbs2.interleave_bits(jnp.asarray(cw), cfg)
    assert np.asarray(syms).shape == (2, cfg.frame // cfg.m)
    back = dvbs2.deinterleave_bits(syms, cfg)
    assert (np.asarray(back) == cw).all()
    pts = dvbs2.modulate(syms, cfg)
    # unit average energy over the constellation
    lut = dvbs2.constellation(const, rate)
    assert abs(np.mean(np.abs(lut) ** 2) - 1.0) < 1e-6
    got = dvbs2.demodulate(pts, cfg)
    assert (np.asarray(got) == np.asarray(syms)).all()


# ---------------------------------------------------------------------------
# physical layer
# ---------------------------------------------------------------------------

def test_pl_header():
    cfg = dvbs2.DVBS2Config("short", "1/2", "qpsk")
    bits = dvbs2.pl_header_bits(cfg.modcod, True, False)
    assert bits.shape == (90,)
    assert set(np.unique(bits)) <= {0, 1}
    # SOF is 0x18D2E82 (26 bits)
    sof = int("".join(map(str, bits[:26])), 2)
    assert sof == 0x18D2E82


def test_physical_frame_roundtrip(rng):
    for pilots in (False, True):
        cfg = dvbs2.DVBS2Config("normal", "1/2", "qpsk", pilots=pilots)
        pts = (rng.normal(size=(1, cfg.slots * 90)) +
               1j * rng.normal(size=(1, cfg.slots * 90))).astype(np.complex64)
        pl = dvbs2.physical_frame(jnp.asarray(pts), cfg)
        want_len = 90 + cfg.slots * 90
        if pilots:
            want_len += 36 * ((cfg.slots - 1) // 16)
        assert np.asarray(pl).shape == (1, want_len)
        back = np.asarray(dvbs2.physical_deframe(pl, cfg))
        np.testing.assert_allclose(back, pts, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# full loopback
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("const,rate,pilots", [
    ("qpsk", "1/2", False),
    ("8psk", "3/5", True),
    ("16apsk", "2/3", False),
])
def test_dvbs2_tx_rx_loopback(rng, const, rate, pilots):
    cfg = dvbs2.DVBS2Config("short", rate, const, pilots=pilots)
    npkt = (cfg.kbch - 80) // (188 * 8)
    ts = _ts(rng, 2 * npkt)
    pl = dvbs2.dvbs2_tx(jnp.asarray(ts), cfg)
    # mild channel noise; hard decisions must still be exact
    noise = (rng.normal(size=pl.shape) + 1j * rng.normal(size=pl.shape)
             ).astype(np.complex64) * 0.02
    bb = dvbs2.dvbs2_rx_loopback(jnp.asarray(np.asarray(pl) + noise), cfg)
    want = dvbs2.bbheader_frame(ts, cfg)
    assert (np.asarray(bb) == want).all()
    # payload bytes round-trip (skip 80-bit header, strip CRC-8 sync bytes)
    payload = np.packbits(np.asarray(bb)[0, 80:80 + npkt * 188 * 8]
                          .astype(np.uint8)).reshape(npkt, 188)
    assert (payload[:, 1:] == ts[:npkt * 188].reshape(npkt, 188)[:, 1:]).all()
