"""QA for digital_extra: scramblers vs scalar LFSR golden, GLFSR, access
code correlation, SNR/EVM estimators."""
import numpy as np
import jax.numpy as jnp

from gnuradio_tpu import Flowgraph, TopBlock
from gnuradio_tpu.ops import blocks as blk
from gnuradio_tpu.ops import digital_extra as dx


class _LfsrGolden:
    """Scalar reimplementation of digital::lfsr (lfsr.h:103-130)."""

    def __init__(self, mask, seed, length):
        self.mask, self.reg, self.len = mask, seed, length

    @staticmethod
    def _parity(v):
        return bin(v).count("1") & 1

    def next_bit(self):
        out = self.reg & 1
        nb = self._parity(self.reg & self.mask)
        self.reg = (self.reg >> 1) | (nb << self.len)
        return out

    def scramble(self, b):
        out = self.reg & 1
        nb = self._parity(self.reg & self.mask) ^ (b & 1)
        self.reg = (self.reg >> 1) | (nb << self.len)
        return out

    def descramble(self, b):
        out = self._parity(self.reg & self.mask) ^ (b & 1)
        self.reg = (self.reg >> 1) | ((b & 1) << self.len)
        return out


def run_graph(*chain, **kw):
    fg = Flowgraph()
    fg.connect(*chain)
    TopBlock(fg, **kw).run()


def test_scrambler_matches_golden(rng):
    bits = rng.integers(0, 2, 500).astype(np.int8)
    src = blk.vector_source(bits, dtype=jnp.int8)
    sc = dx.scrambler_bb(0x8A, 0x7F, 7)
    snk = blk.vector_sink_b()
    run_graph(src, sc, snk, target_items=128)  # multiple chunks: state carry
    g = _LfsrGolden(0x8A, 0x7F, 7)
    want = np.array([g.scramble(int(b)) for b in bits], np.int8)
    assert (snk.data() == want).all()


def test_descrambler_matches_golden(rng):
    bits = rng.integers(0, 2, 500).astype(np.int8)
    src = blk.vector_source(bits, dtype=jnp.int8)
    de = dx.descrambler_bb(0x8A, 0x7F, 7)
    snk = blk.vector_sink_b()
    run_graph(src, de, snk, target_items=128)
    g = _LfsrGolden(0x8A, 0x7F, 7)
    want = np.array([g.descramble(int(b)) for b in bits], np.int8)
    assert (snk.data() == want).all()


def test_scramble_descramble_recovers(rng):
    bits = rng.integers(0, 2, 1000).astype(np.int8)
    src = blk.vector_source(bits, dtype=jnp.int8)
    sc = dx.scrambler_bb(0x8A, 0x7F, 7)
    de = dx.descrambler_bb(0x8A, 0x7F, 7)
    snk = blk.vector_sink_b()
    run_graph(src, sc, de, snk)
    out = snk.data()
    # multiplicative chain delays by length+1 bits
    d = 8
    assert (out[d:] == bits[:-d]).all()


def test_glfsr_source_maximal_length():
    deg = 10
    src = dx.glfsr_source_b(deg)
    hd = blk.head(2 * (2**deg - 1), jnp.int8)
    snk = blk.vector_sink_b()
    run_graph(src, hd, snk)
    seq = snk.data()
    period = 2**deg - 1
    # maximal-length: sequence repeats with period 2^deg - 1, balanced ones
    assert (seq[:period] == seq[period:2 * period]).all()
    assert abs(int(seq[:period].sum()) - 2**(deg - 1)) <= 1


def test_correlate_access_code(rng):
    code = "11100010010"
    bits = rng.integers(0, 2, 400).astype(np.int8)
    pos = 123
    cb = np.array([int(c) for c in code], np.int8)
    bits[pos: pos + len(cb)] = cb
    src = blk.vector_source(bits, dtype=jnp.int8)
    cac = dx.correlate_access_code_bb(code, threshold=0)
    snk = blk.vector_sink_b()
    run_graph(src, cac, snk)
    out = snk.data()
    assert (out & 1 == bits & 1).all()           # data preserved in bit 0
    flags = np.where(out & 2)[0]
    assert pos + len(cb) - 1 in flags            # flag at code end


def test_snr_est_m2m4(rng):
    n = 100_000
    snr_db = 12.0
    sig = np.exp(1j * np.pi * rng.integers(0, 2, n))  # BPSK
    npow = 10 ** (-snr_db / 10)
    noise = np.sqrt(npow / 2) * (rng.standard_normal(n) +
                                 1j * rng.standard_normal(n))
    x = (sig + noise).astype(np.complex64)
    src = blk.vector_source(x)
    est = dx.mpsk_snr_est_cc("m2m4")
    fg = Flowgraph()
    fg.connect(src, est)
    TopBlock(fg, target_items=n).run()
    assert abs(est.snr() - snr_db) < 1.0


def test_meas_evm(rng):
    pts = np.array([1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j]) / np.sqrt(2)
    syms = pts[rng.integers(0, 4, 10_000)]
    err = 0.05 * (rng.standard_normal(10_000) + 1j * rng.standard_normal(10_000))
    x = (syms + err).astype(np.complex64)
    src = blk.vector_source(x)
    evm = dx.meas_evm_cc(pts)
    snk = blk.vector_sink_f()
    fg = Flowgraph()
    fg.connect(src, evm, snk)
    TopBlock(fg, target_items=10_000).run()
    # RMS error = 0.05*sqrt(2)... mean |err|^2 = 2*0.05^2; EVM% ~ sqrt(0.005)*100
    want = 100 * np.sqrt(np.mean(np.abs(err) ** 2))
    got = np.sqrt(np.mean(np.asarray(snk.data()) ** 2))
    assert abs(got - want) < 1.0
