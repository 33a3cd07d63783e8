"""QA for the CATV J.83B 64QAM chain."""
import numpy as np
import jax.numpy as jnp
import pytest

from gnuradio_tpu.ops import catv


def test_rs128_encode_and_check(rng):
    msg = rng.integers(0, 128, 3 * 122)
    cw = catv.rs128_encode(msg)
    assert cw.size == 3 * 128
    assert catv.rs128_check(cw).all()
    bad = cw.copy().reshape(3, 128)
    bad[1, 7] ^= 0x55
    assert list(catv.rs128_check(bad.reshape(-1))) == [True, False, True]
    # systematic
    assert (cw.reshape(3, 128)[:, :122] == msg.reshape(3, 122)).all()


def test_randomizer_properties():
    seq = catv.randomizer_seq()
    assert seq.shape == (60 * 128,)
    assert seq.max() < 128
    x = jnp.asarray(np.arange(2 * 60 * 128) % 128)
    r = catv.randomize(x)
    assert (np.asarray(catv.randomize(r)) == np.asarray(x)).all()
    # first symbols: all registers preloaded to 0x7F
    assert seq[0] == 0x7F


def test_frame_sync_length(rng):
    syms = rng.integers(0, 128, 60 * 128)
    bits = catv.frame_sync_insert(syms)
    assert bits.size == 60 * 128 * 7 + 42
    # sync word bits
    sync_bits = bits[-42:]
    word = int("".join(map(str, sync_bits[:28])), 2)
    assert word == (0x75 << 21) | (0x2C << 14) | (0x0D << 7) | 0x6C


def _trellis_golden(groups):
    """Scalar transcription of the J.83B 64QAM trellis semantics."""
    ptab = catv._precoder_table()
    ns, outs = catv._trellis_tables()
    xyp = xq = yq = 0
    out = []
    for rs in groups:
        qs = [0] * 5
        for (s, w, sh) in catv._UNCODED_64QAM:
            qs[w] |= int(rs[s]) << sh
        A = (rs[7] << 3) | (rs[8] << 2) | (rs[9] << 1) | rs[10]
        B = (rs[21] << 3) | (rs[22] << 2) | (rs[23] << 1) | rs[24]
        nxyp, X, Y = ptab[xyp, A, B]
        xyp = int(nxyp)
        for n in range(5):
            qs[n] |= int(outs[xq, X, n]) << 3
            qs[n] |= int(outs[yq, Y, n])
        xq, yq = int(ns[xq, X]), int(ns[yq, Y])
        out.extend(qs)
    return np.array(out)


def test_trellis_encoder_matches_scalar(rng):
    bits = rng.integers(0, 2, 50 * 28)
    q, state = catv.trellis_encode_64qam(jnp.asarray(bits))
    want = _trellis_golden(bits.reshape(-1, 28))
    assert (np.asarray(q) == want).all()
    assert np.asarray(q).max() < 64


def test_precoder_is_differential():
    """The precoder output X,Y differentially encodes (W,Z): decoding
    X,Y by the inverse rule recovers W,Z regardless of start state."""
    ptab = catv._precoder_table()
    for xyp in range(4):
        for w in range(16):
            for z in range(16):
                nxyp, X, Y = ptab[xyp, w, z]
                # invert bit-serially
                xp, yp = (xyp >> 1) & 1, xyp & 1
                wr = zr = 0
                for i in range(4):
                    xn, yn = (X >> i) & 1, (Y >> i) & 1
                    zb = (xn ^ xp) ^ (yn ^ yp)
                    common = zb & (xp ^ yp)
                    wb = xn ^ xp ^ common
                    wr |= wb << i
                    zr |= zb << i
                    xp, yp = xn, yn
                assert (wr, zr) == (w, z)


def test_catv_tx_chain_runs(rng):
    npkts = 120
    ts = rng.integers(0, 256, npkts * 188)
    ts[::188] = 0x47
    pts = catv.catv_tx_64qam(jnp.asarray(np.asarray(ts)))
    pts = np.asarray(pts)
    assert pts.size > 0
    # unit-ish average energy on the 64QAM grid
    assert abs(np.mean(np.abs(pts) ** 2) - 1.0) < 0.05
