"""QA for gr-fec analog: conv codes, puncturing, Reed-Solomon.

Golden references: a scalar shift-register encoder written straight from the
cc_encoder recurrence, and RS algebraic identities (valid-codeword syndromes,
t-error correction round trips)."""
import numpy as np
import jax.numpy as jnp
import pytest

from gnuradio_tpu.ops import fec
from gnuradio_tpu import Flowgraph, TopBlock
from gnuradio_tpu.ops import blocks as blk

K7_POLYS = [0o171, 0o133]  # rate-1/2 K=7 (CCSDS/Voyager)


def _cc_encode_golden(bits, k, rate, polys, start_state=0, mode=fec.CC_STREAMING):
    """Scalar shift register, state newest-at-LSB (the reference recurrence)."""
    st = start_state
    N = len(bits)
    if mode == fec.CC_TAILBITING:
        st = 0
        for i in range(k - 1):
            st = ((st << 1) | (bits[N - (k - 1) + i] & 1)) & ((1 << (k - 1)) - 1)
    out = []
    for i in range(N):
        st = ((st << 1) | (bits[i] & 1)) & ((1 << k) - 1)
        for p in polys:
            bit = bin(st & abs(p)).count("1") & 1
            if p < 0:
                bit ^= 1
            out.append(bit)
    if mode == fec.CC_TERMINATED:
        for i in range(k - 1):
            st = ((st << 1) | ((start_state >> (k - 2 - i)) & 1)) & ((1 << k) - 1)
            for p in polys:
                bit = bin(st & abs(p)).count("1") & 1
                if p < 0:
                    bit ^= 1
                out.append(bit)
    return np.array(out, np.int8)


@pytest.mark.parametrize("mode", [fec.CC_STREAMING, fec.CC_TERMINATED,
                                  fec.CC_TAILBITING, fec.CC_TRUNCATED])
def test_cc_encode_matches_shift_register(rng, mode):
    bits = rng.integers(0, 2, 120).astype(np.int8)
    got = np.asarray(fec.cc_encode(jnp.asarray(bits), 7, 2, K7_POLYS,
                                   start_state=0, mode=mode))
    want = _cc_encode_golden(bits, 7, 2, K7_POLYS, 0, mode)
    assert (got == want).all()


def test_cc_encode_negative_poly(rng):
    bits = rng.integers(0, 2, 40).astype(np.int8)
    polys = [0o171, -0o133]
    got = np.asarray(fec.cc_encode(jnp.asarray(bits), 7, 2, polys))
    want = _cc_encode_golden(bits, 7, 2, polys)
    assert (got == want).all()


@pytest.mark.parametrize("mode", [fec.CC_TERMINATED, fec.CC_TAILBITING])
def test_cc_decode_roundtrip(rng, mode):
    bits = rng.integers(0, 2, 100).astype(np.int8)
    enc = np.asarray(fec.cc_encode(jnp.asarray(bits), 7, 2, K7_POLYS,
                                   mode=mode))
    soft = (1.0 - 2.0 * enc).astype(np.float32)
    soft += 0.3 * rng.standard_normal(soft.shape).astype(np.float32)
    dec = np.asarray(fec.cc_decode(jnp.asarray(soft), 100, 7, 2, K7_POLYS,
                                   mode=mode))
    assert (dec == bits).all()


def test_cc_encoder_block_streaming_state_carry(rng):
    """Streaming mode must carry the shift register across frames."""
    bits = rng.integers(0, 2, 4 * 32).astype(np.int8)
    src = blk.vector_source(bits, dtype=jnp.int8)
    enc = fec.CCEncoder(32, 7, 2, K7_POLYS, mode=fec.CC_STREAMING)
    snk = blk.vector_sink(jnp.int8)
    fg = Flowgraph()
    fg.connect(src, enc, snk)
    TopBlock(fg).run()
    want = _cc_encode_golden(bits, 7, 2, K7_POLYS)  # one continuous register
    assert (np.asarray(snk.data()) == want).all()


def test_puncture_depuncture(rng):
    # DVB-T rate 2/3 pattern: puncsize=4, pat 0b1110 keeps 3 of 4
    data = rng.standard_normal(480).astype(np.float32)
    p = np.asarray(fec.puncture(jnp.asarray(data), 4, 0b1110))
    assert p.shape[0] == 480 * 3 // 4
    d = np.asarray(fec.depuncture(jnp.asarray(p), 4, 0b1110, sym=0.0))
    assert d.shape[0] == 480
    keep = np.array([0, 1, 2])
    for blk_i in range(120):
        assert (d[4 * blk_i + keep] == data[4 * blk_i + keep]).all()
        assert d[4 * blk_i + 3] == 0.0


class TestReedSolomonDVB:
    rs = fec.ReedSolomon(t=8, prim_poly=0x11D, fcr=0, shorten=51)

    def test_sizes(self):
        assert self.rs.n == 204 and self.rs.k == 188

    def test_valid_codeword_zero_syndromes(self, rng):
        data = rng.integers(0, 256, (3, 188))
        cw = np.asarray(self.rs.encode(jnp.asarray(data)))
        assert cw.shape == (3, 204)
        dec, nerr = self.rs.decode(jnp.asarray(cw))
        assert (np.asarray(dec) == data).all()
        assert (np.asarray(nerr) == 0).all()

    @pytest.mark.parametrize("nerrs", [1, 4, 8])
    def test_corrects_up_to_t_errors(self, rng, nerrs):
        data = rng.integers(0, 256, (4, 188))
        cw = np.array(self.rs.encode(jnp.asarray(data)))
        for b in range(cw.shape[0]):
            pos = rng.choice(204, nerrs, replace=False)
            for p in pos:
                cw[b, p] ^= rng.integers(1, 256)
        dec, nerr = self.rs.decode(jnp.asarray(cw))
        assert (np.asarray(dec) == data).all()
        assert (np.asarray(nerr) == nerrs).all()

    def test_parity_matches_lfsr_division(self, rng):
        """Parity must equal the polynomial remainder computed by plain
        long division (the LFSR the reference's librs implements)."""
        gf = self.rs.gf
        data = rng.integers(0, 256, 188)
        # long division of m(x) x^16 by g(x) over the FULL (padded) message
        full = np.concatenate([np.zeros(51, np.int64), data, np.zeros(16, np.int64)])
        rem = full.copy()
        g = self.rs.gen
        for i in range(239):
            c = rem[i]
            if c:
                rem[i: i + 17] ^= gf.mul_np(c, g)
        want_parity = rem[-16:]
        cw = np.asarray(self.rs.encode(jnp.asarray(data)))
        assert (cw[188:] == want_parity).all()


def test_rs_ccsds_full_length(rng):
    """Unshortened RS(255,239) with a different primitive polynomial."""
    rs = fec.ReedSolomon(t=8, prim_poly=0x187, fcr=112, shorten=0)
    data = rng.integers(0, 256, (2, 239))
    cw = np.array(rs.encode(jnp.asarray(data)))
    cw[0, 5] ^= 0x55
    cw[1, 254] ^= 0x0F
    cw[1, 0] ^= 0xA0
    dec, nerr = rs.decode(jnp.asarray(cw))
    assert (np.asarray(dec) == data).all()


def test_bit_errors():
    a = jnp.asarray(np.array([0x00, 0xFF, 0x0F], np.uint8).view(np.int8))
    b = jnp.asarray(np.array([0x01, 0xFF, 0x00], np.uint8).view(np.int8))
    assert int(fec.bit_errors(a, b)) == 5
