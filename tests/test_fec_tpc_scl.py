"""QA: turbo product codes + polar SC-list decoding."""
import numpy as np
import jax.numpy as jnp
import pytest

from gnuradio_tpu.ops import fec_tpc, fec_polar


def test_tpc_encode_shapes_and_systematic(rng):
    code = fec_tpc.TPC((0o3, 0o5), (0o3, 0o5), krow=16, kcol=8)
    assert code.n == code.row_len * code.col_len
    bits = rng.integers(0, 2, code.k)
    cw = np.asarray(code.encode(jnp.asarray(bits)))
    assert cw.size == code.n
    assert set(np.unique(cw)) <= {0, 1}
    # systematic bits recoverable at (col step t, bit 0) x (row step r, bit 0)
    mat = cw.reshape(code.col_len, code.row_len)
    sysrows = mat[np.arange(code.kcol) * code.cn]
    sysmat = sysrows.reshape(code.kcol, code.krow + code.rm, code.rn)
    got = sysmat[:, :code.krow, 0].reshape(-1)
    assert (got == bits).all()


def test_tpc_decode_clean(rng):
    code = fec_tpc.TPC((0o3, 0o5), (0o3, 0o5), krow=16, kcol=8)
    bits = rng.integers(0, 2, code.k)
    cw = np.asarray(code.encode(jnp.asarray(bits)))
    llr = (1.0 - 2.0 * cw) * 4.0            # strong LLRs, positive = bit 0
    out = np.asarray(code.decode(jnp.asarray(llr), iterations=2))
    assert (out == bits).all()


def test_tpc_decode_corrects_noise(rng):
    code = fec_tpc.TPC((0o3, 0o5), (0o3, 0o5), krow=16, kcol=8)
    bits = rng.integers(0, 2, code.k)
    cw = np.asarray(code.encode(jnp.asarray(bits)))
    x = 1.0 - 2.0 * cw
    sigma = 0.6                              # ~4.4 dB Es/N0
    y = x + rng.normal(0, sigma, x.shape)
    llr = 2.0 * y / sigma ** 2
    out = np.asarray(code.decode(jnp.asarray(llr), iterations=6))
    uncoded_errs = ((y < 0) != cw).mean()
    errs = (out != bits).mean()
    assert uncoded_errs > 0                 # the channel did flip bits
    assert errs == 0, f"TPC failed to correct: BER {errs}"


def test_polar_scl_matches_sc_clean(rng):
    code = fec_polar.PolarCodeList(128, 64, list_size=4)
    info = rng.integers(0, 2, 64)
    cw = np.asarray(code.encode(jnp.asarray(info)))
    llr = (1.0 - 2.0 * cw) * 5.0
    sc = np.asarray(code.decode(jnp.asarray(llr)))
    scl = code.decode_list(llr)
    assert (sc == info).all()
    assert (scl == info).all()


def test_polar_scl_beats_sc_under_noise(rng):
    code = fec_polar.PolarCodeList(128, 64, list_size=8)
    n_trials = 30
    sigma = 0.85
    sc_fail = scl_fail = 0
    for _ in range(n_trials):
        info = rng.integers(0, 2, 64)
        cw = np.asarray(code.encode(jnp.asarray(info)))
        x = 1.0 - 2.0 * cw
        y = x + rng.normal(0, sigma, x.shape)
        llr = 2.0 * y / sigma ** 2
        sc = np.asarray(code.decode(jnp.asarray(llr)))
        scl = code.decode_list(llr)
        sc_fail += int((sc != info).any())
        scl_fail += int((scl != info).any())
    assert scl_fail <= sc_fail              # list never worse than SC
    assert scl_fail < n_trials              # and actually decodes
