"""QA for gr-trellis analog: FSM construction, Viterbi, SISO, encoder.

Mirrors the reference QA pattern (gr-trellis test_tcm flows): encode random
symbols through an FSM, modulate, pass through (noiseless/low-noise) channel,
Viterbi-decode, compare to the input. Plus a scalar NumPy golden of the ACS
recursion checked against the vectorized scan implementation.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from gnuradio_tpu.ops import trellis as tr
from gnuradio_tpu import Flowgraph, TopBlock
from gnuradio_tpu.ops import blocks as blk


def fsm_057():
    # rate 1/2, K=7 convolutional code (CCSDS polynomials 0o171, 0o133)
    return tr.FSM.from_generator(1, 2, [0o171, 0o133])


def test_fsm_generator_tables():
    f = fsm_057()
    assert (f.I, f.S, f.O) == (2, 64, 4)
    # from the all-zero state, input 0 stays at 0 and outputs 0
    assert f.NS[0, 0] == 0 and f.OS[0, 0] == 0
    # each state must have exactly I predecessors for this shift-register FSM
    assert f.P == 2
    assert (f.PMASK == 0).all()
    # predecessor tables invert NS
    for j in range(f.S):
        for p in range(f.P):
            assert f.NS[f.PS[j, p], f.PI[j, p]] == j


def _viterbi_golden(f, metrics, S0, SK):
    """Scalar ACS + traceback, written directly from the recurrence."""
    K = metrics.shape[0]
    INF = 1.0e9
    alpha = np.zeros(f.S) if S0 < 0 else np.full(f.S, INF)
    if S0 >= 0:
        alpha[S0] = 0.0
    trace = np.zeros((K, f.S), np.int64)
    for k in range(K):
        nxt = np.full(f.S, INF)
        for j in range(f.S):
            best, bi = INF, 0
            for p in range(f.P):
                if f.PMASK[j, p] > 0:
                    continue
                m = alpha[f.PS[j, p]] + metrics[k, f.PRED_OS[j, p]]
                if m < best:
                    best, bi = m, p
            trace[k, j] = bi
            nxt[j] = best
        alpha = nxt - nxt.min()
    st = int(np.argmin(alpha)) if SK < 0 else SK
    out = np.zeros(K, np.int64)
    for k in range(K - 1, -1, -1):
        p = trace[k, st]
        out[k] = f.PI[st, p]
        st = f.PS[st, p]
    return out


@pytest.mark.parametrize("S0,SK", [(0, -1), (-1, -1), (0, 0)])
def test_viterbi_matches_scalar_golden(rng, S0, SK):
    f = fsm_057()
    K = 50
    metrics = rng.random((K, f.O)).astype(np.float32)
    got = np.asarray(tr.viterbi_path(f, jnp.asarray(metrics), S0, SK))
    want = _viterbi_golden(f, metrics, S0, SK)
    assert (got == want).all()


def test_encode_viterbi_roundtrip_qpsk(rng):
    """encoder -> per-symbol QPSK-pair table -> AWGN -> viterbi_combined."""
    f = fsm_057()
    K = 200
    bits = rng.integers(0, 2, K).astype(np.int8)
    enc = np.asarray(tr.encode_fsm(f, jnp.asarray(bits)))
    # map each of the O=4 output symbols to 2 BPSK dims
    table = np.array([[1 - 2 * ((o >> 1) & 1), 1 - 2 * (o & 1)]
                      for o in range(4)], np.float32)
    tx = table[enc].reshape(-1)
    rx = tx + 0.05 * rng.standard_normal(tx.shape).astype(np.float32)
    dec = np.asarray(tr.viterbi_combined(
        f, table, 2, tr.TRELLIS_EUCLIDEAN, jnp.asarray(rx), S0=0, SK=-1))
    assert (dec == bits).all()


def test_siso_matches_viterbi_on_clean_metrics(rng):
    f = fsm_057()
    K = 60
    bits = rng.integers(0, 2, K).astype(np.int8)
    enc = np.asarray(tr.encode_fsm(f, jnp.asarray(bits)))
    prioro = np.full((K, f.O), 8.0, np.float32)
    prioro[np.arange(K), enc] = 0.0
    priori = np.zeros((K, f.I), np.float32)
    post = tr.siso(f, jnp.asarray(priori), jnp.asarray(prioro),
                   S0=0, SK=-1, posti=True, posto=False, use_min_star=False)
    hard = np.asarray(jnp.argmin(post, axis=1))
    assert (hard == bits).all()


def test_encoder_block_in_flowgraph(rng):
    f = fsm_057()
    bits = rng.integers(0, 2, 128).astype(np.int8)
    src = blk.vector_source(bits, dtype=jnp.int8)
    enc = tr.TrellisEncoder(f, S0=0, dtype=jnp.int8)
    snk = blk.vector_sink(jnp.int8)
    fg = Flowgraph()
    fg.connect(src, enc, snk)
    TopBlock(fg).run()
    want = np.asarray(tr.encode_fsm(f, jnp.asarray(bits)))
    assert (np.asarray(snk.data()) == want).all()


def test_viterbi_block_in_flowgraph(rng):
    f = fsm_057()
    K = 64
    bits = rng.integers(0, 2, K).astype(np.int8)
    enc = np.asarray(tr.encode_fsm(f, jnp.asarray(bits)))
    table = np.array([[1 - 2 * ((o >> 1) & 1), 1 - 2 * (o & 1)]
                      for o in range(4)], np.float32)
    obs = table[enc].reshape(-1).astype(np.float32)

    src = blk.vector_source(obs, dtype=jnp.float32)
    met = tr.TrellisMetrics(f.O, 2, table, tr.TRELLIS_EUCLIDEAN,
                            in_dtype=jnp.float32)
    vit = tr.TrellisViterbi(f, K, S0=0, SK=-1, out_dtype=jnp.int8)
    snk = blk.vector_sink(jnp.int8)
    fg = Flowgraph()
    fg.connect(src, met, vit, snk)
    TopBlock(fg).run()
    assert (np.asarray(snk.data()) == bits).all()


def test_permutation_block_roundtrip(rng):
    K = 16
    table = tr.make_interleaver(K, seed=3)
    inv = np.argsort(table).astype(np.int32)
    data = rng.integers(-100, 100, K * 8).astype(np.int8)
    src = blk.vector_source(data, dtype=jnp.int8)
    p1 = tr.Permutation(K, table, 1, jnp.int8)
    p2 = tr.Permutation(K, inv, 1, jnp.int8)
    snk = blk.vector_sink(jnp.int8)
    fg = Flowgraph()
    fg.connect(src, p1, p2, snk)
    TopBlock(fg).run()
    assert (np.asarray(snk.data()) == data).all()
