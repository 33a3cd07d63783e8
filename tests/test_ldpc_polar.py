"""QA for LDPC (alist round trip, encode parity, BP error correction) and
polar codes (butterfly encode golden, SC decode round trips)."""
import numpy as np
import jax.numpy as jnp
import pytest

from gnuradio_tpu.ops import fec_ldpc as ldpc
from gnuradio_tpu.ops import fec_polar as polar


class TestLdpc:
    H = ldpc.make_gallager_code(96, 3, 6, seed=1)
    code = ldpc.LdpcCode(H)

    def test_alist_roundtrip(self, tmp_path):
        p = str(tmp_path / "code.alist")
        ldpc.write_alist(p, self.H)
        H2 = ldpc.read_alist(p)
        assert (H2 == self.H).all()

    def test_encode_satisfies_parity(self, rng):
        info = rng.integers(0, 2, (8, self.code.k))
        cw = np.asarray(self.code.encode(jnp.asarray(info)))
        assert cw.shape == (8, 96)
        assert ((cw @ self.H.T) % 2 == 0).all()
        back = np.asarray(self.code.extract_info(jnp.asarray(cw)))
        assert (back == info).all()

    def test_bp_corrects_errors(self, rng):
        info = rng.integers(0, 2, (4, self.code.k))
        cw = np.asarray(self.code.encode(jnp.asarray(info)))
        llr = (1.0 - 2.0 * cw) * 4.0
        # flip 4 bits per codeword (weak llr noise on top)
        for b in range(4):
            pos = rng.choice(96, 4, replace=False)
            llr[b, pos] = -llr[b, pos] * 0.25
        dec = np.asarray(self.code.decode(jnp.asarray(llr, jnp.float32),
                                          iterations=30))
        assert ((dec @ self.H.T) % 2 == 0).all()
        back = np.asarray(self.code.extract_info(jnp.asarray(dec)))
        assert (back == info).all()


def _polar_encode_golden(u):
    """Recursive definition straight from the spec: enc(u) =
    [enc(a)^enc(b), enc(b)]."""
    n = len(u)
    if n == 1:
        return u.copy()
    a = _polar_encode_golden(u[: n // 2])
    b = _polar_encode_golden(u[n // 2:])
    return np.concatenate([a ^ b, b])


class TestPolar:
    def test_encode_matches_recursive_golden(self, rng):
        u = rng.integers(0, 2, 64)
        got = np.asarray(polar.polar_encode_full(jnp.asarray(u)))
        assert (got == _polar_encode_golden(u)).all()

    def test_sc_decode_clean_roundtrip(self, rng):
        code = polar.PolarCode(128, 64)
        info = rng.integers(0, 2, (6, 64))
        cw = np.asarray(code.encode(jnp.asarray(info)))
        llr = (1.0 - 2.0 * cw) * 5.0
        dec = np.asarray(code.decode(jnp.asarray(llr, jnp.float32)))
        assert (dec == info).all()

    def test_sc_decode_with_noise(self, rng):
        code = polar.PolarCode(256, 100)  # low rate -> strong code
        info = rng.integers(0, 2, (4, 100))
        cw = np.asarray(code.encode(jnp.asarray(info)))
        x = 1.0 - 2.0 * cw
        sigma = 0.5  # ~6 dB Eb/N0 at this rate
        y = x + sigma * rng.standard_normal(x.shape)
        llr = 2.0 * y / sigma**2
        dec = np.asarray(code.decode(jnp.asarray(llr, jnp.float32)))
        # frame error rate should be low at this SNR for rate<1/2 polar
        fer = np.mean([not (dec[i] == info[i]).all() for i in range(4)])
        assert fer <= 0.25

    def test_frozen_positions_explicit(self, rng):
        frozen = np.arange(8)  # freeze the 8 worst-indexed
        code = polar.PolarCode(16, 8, frozen_positions=frozen)
        info = rng.integers(0, 2, 8)
        cw = code.encode(jnp.asarray(info))
        llr = (1.0 - 2.0 * np.asarray(cw)) * 5.0
        dec = np.asarray(code.decode(jnp.asarray(llr, jnp.float32)))
        assert (dec == info).all()
