"""QA for DVB-T2 TX blocks (ETSI EN 302 755)."""
import numpy as np
import jax.numpy as jnp
import pytest

from gnuradio_tpu.ops import dvbt2, dvbs2


def test_bit_perm_is_permutation():
    for fs, rate, const in [("short", "1/2", "16qam"),
                            ("short", "3/5", "64qam"),
                            ("normal", "2/3", "256qam"),
                            ("short", "1/3", "qpsk"),
                            ("short", "2/5", "256qam")]:
        perm = dvbt2._bit_perm(fs, rate, const)
        assert sorted(perm) == list(range(len(perm)))


def _bit_interleave_golden(cw, fs, rate, const):
    """Scalar reference algorithm (parity il -> twist -> row read ->
    demux), straight from the spec description."""
    frame = len(cw)
    nbch = dvbs2.BCH_PARAMS[(fs, rate)][1]
    q = (frame - nbch) // 360
    m = dvbt2.MOD_BITS[const]
    u = list(cw[:nbch]) + [0] * (frame - nbch)
    for t in range(q):
        for s in range(360):
            u[nbch + 360 * t + s] = cw[nbch + q * s + t]
    ncols = 2 * m if not (const == "256qam" and fs == "short") else m
    rows = frame // ncols
    twist = dvbt2._TWIST[(const, fs)][:ncols]
    v = [0] * frame
    index = 0
    for col in range(ncols):
        off = twist[col]
        for row in range(rows):
            v[off + rows * col] = u[index]
            index += 1
            off += 1
            if off == rows:
                off = 0
    suffix = "N" if fs == "normal" else "S"
    mux_key = const if not (const == "256qam" and fs == "short") else "256qamS"
    mux = dvbt2._MUX.get((mux_key, f"{rate}{suffix}"),
                         dvbt2._MUX[(mux_key, None)])
    syms = []
    w = []
    for j in range(rows):
        for col in range(ncols):
            w.append(v[rows * col + j])
    for d in range(frame // ncols):
        pack = 0
        for e in range(ncols):
            pack |= w[d * ncols + e] << ((ncols - 1) - mux[e])
        if ncols == 2 * m:
            syms.append(pack >> m)
            syms.append(pack & ((1 << m) - 1))
        else:
            syms.append(pack)
    return np.array(syms)


@pytest.mark.parametrize("fs,rate,const", [("short", "1/2", "16qam"),
                                           ("short", "3/5", "64qam"),
                                           ("short", "2/5", "256qam")])
def test_bit_interleave_matches_golden(rng, fs, rate, const):
    cfg = dvbt2.DVBT2Config(fs, rate, const)
    cw = rng.integers(0, 2, cfg.frame)
    got = np.asarray(dvbt2.bit_interleave(jnp.asarray(cw[None]), cfg))[0]
    want = _bit_interleave_golden(cw, fs, rate, const)
    assert (got == want).all()
    back = np.asarray(dvbt2.bit_deinterleave(jnp.asarray(got[None]), cfg))[0]
    assert (back == cw).all()


def test_t2_ldpc_matches_s2_for_shared_table(rng):
    cfg2 = dvbt2.DVBT2Config("short", "1/2", "qpsk")
    cfgs = dvbs2.DVBS2Config("short", "1/2", "qpsk")
    info = rng.integers(0, 2, (1, cfg2.nbch))
    t2 = np.asarray(dvbt2.ldpc_encode(jnp.asarray(info), cfg2))
    s2 = np.asarray(dvbs2.ldpc_encode(jnp.asarray(info), cfgs))
    assert (t2 == s2).all()


def test_t2_ldpc_2_3_normal_differs_from_s2(rng):
    cfg2 = dvbt2.DVBT2Config("normal", "2/3", "qpsk")
    cfgs = dvbs2.DVBS2Config("normal", "2/3", "qpsk")
    info = rng.integers(0, 2, (1, cfg2.nbch))
    t2 = np.asarray(dvbt2.ldpc_encode(jnp.asarray(info), cfg2))
    s2 = np.asarray(dvbs2.ldpc_encode(jnp.asarray(info), cfgs))
    assert t2.shape == s2.shape == (1, 64800)
    assert (t2 != s2).any()       # T2 uses its own 2/3N table


def test_cell_interleaver_roundtrip(rng):
    cfg = dvbt2.DVBT2Config("short", "1/2", "16qam")
    cells = (rng.normal(size=(4, cfg.cell_size)) +
             1j * rng.normal(size=(4, cfg.cell_size))).astype(np.complex64)
    il = dvbt2.cell_interleave(jnp.asarray(cells), cfg)
    de = np.asarray(dvbt2.cell_deinterleave(il, cfg))
    np.testing.assert_array_equal(de, cells)
    # different FEC blocks get different shifts
    assert not np.array_equal(np.asarray(il)[0], np.asarray(il)[1])


def test_cell_perm_is_permutation():
    for key in [("normal", "qpsk"), ("short", "256qam"), ("short", "64qam")]:
        p = dvbt2._cell_perm(*key)
        assert sorted(p) == list(range(len(p)))


def test_time_interleaver_roundtrip(rng):
    cfg = dvbt2.DVBT2Config("short", "1/2", "16qam")
    cells = (rng.normal(size=(6, cfg.cell_size)) +
             1j * rng.normal(size=(6, cfg.cell_size))).astype(np.complex64)
    ti = dvbt2.time_interleave(jnp.asarray(cells), cfg, fec_per_ti=3)
    de = np.asarray(dvbt2.time_deinterleave(ti, cfg, fec_per_ti=3))
    np.testing.assert_array_equal(de, cells)


@pytest.mark.parametrize("const", ["qpsk", "16qam", "64qam", "256qam"])
@pytest.mark.parametrize("rotation", [False, True])
def test_map_demap_roundtrip(rng, const, rotation):
    cfg = dvbt2.DVBT2Config("short", "1/2", const, rotation=rotation)
    syms = rng.integers(0, 1 << cfg.m, (2, cfg.cell_size))
    pts = dvbt2.map_cells(jnp.asarray(syms), cfg)
    lut = dvbt2.t2_constellation(const, rotation)
    assert abs(np.mean(np.abs(lut) ** 2) - 1.0) < 1e-6
    back = np.asarray(dvbt2.demap_cells(pts, cfg))
    assert (back == syms).all()


def test_freq_interleave_roundtrip(rng):
    c_data = dvbt2.cells_per_symbol("8K", "PP7")[0]
    assert c_data == 6788
    cells = (rng.normal(size=(4, c_data)) +
             1j * rng.normal(size=(4, c_data))).astype(np.complex64)
    il = dvbt2.freq_interleave(jnp.asarray(cells), "8K")
    de = np.asarray(dvbt2.freq_deinterleave(il, "8K"))
    np.testing.assert_array_equal(de, cells)
    he, ho = dvbt2._freq_perms("8K", c_data)
    assert sorted(he) == list(range(c_data))
    assert sorted(ho) == list(range(c_data))
    assert not np.array_equal(he, ho)


def test_p1_symbol_structure():
    p1 = dvbt2.p1_symbol(0, 3)
    assert p1.shape == (2048,)
    a = p1[542:542 + 1024]
    # C section is the frequency-shifted head of A: c[n] = a[n]*e^{j2pi n/1024}
    n = np.arange(542)
    np.testing.assert_allclose(p1[:542], a[:542] * np.exp(2j * np.pi * n / 1024),
                               rtol=1e-4, atol=1e-5)
    # B section: shifted tail
    n2 = np.arange(542, 1024)
    np.testing.assert_allclose(p1[542 + 1024:], a[542:] *
                               np.exp(2j * np.pi * n2 / 1024),
                               rtol=1e-4, atol=1e-5)


def test_fec_to_cells_runs(rng):
    cfg = dvbt2.DVBT2Config("short", "1/2", "16qam", rotation=True)
    bb = rng.integers(0, 2, (2, cfg.kbch))
    cells = dvbt2.dvbt2_fec_to_cells(jnp.asarray(bb), cfg)
    assert np.asarray(cells).shape == (2, cfg.cell_size)
