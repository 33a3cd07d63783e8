"""QA for the last Appendix-B strays (ops/catalog_strays.py):
regenerate_bb, soft_dec_lut_gen, siso_f/siso_combined_f,
fir_filter_with_buffer."""
import numpy as np
import jax
import jax.numpy as jnp

from gnuradio_tpu.ops.catalog_strays import (
    FirFilterWithBuffer, Regenerate, TrellisSiso, TrellisSisoCombined,
    calc_soft_dec, calc_soft_dec_from_table, soft_dec_table,
    soft_dec_table_generator, soft_llr_lut)
from gnuradio_tpu.ops.trellis import (FSM, TRELLIS_EUCLIDEAN, calc_metric,
                                      encode_fsm)


def _regen_ref(x, period, max_regen):
    """Literal transcription of regenerate_bb_impl.cc's work loop."""
    out = np.zeros(len(x), np.int8)
    countdown, regen = 0, max_regen
    for i, v in enumerate(x):
        if regen < max_regen:
            countdown -= 1
            if countdown == 0:
                out[i] = 1
                countdown = period
                regen += 1
        if v == 1:
            countdown = period
            out[i] = 1
            regen = 0
    return out


def test_regenerate_matches_reference(rng):
    period, max_regen = 7, 3
    x = (rng.random(4000) < 0.01).astype(np.int8)
    ref = _regen_ref(x, period, max_regen)
    blk = Regenerate(period, max_regen)
    st = blk.init_state()
    st, got = jax.jit(blk.work)(st, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_regenerate_chunk_invariance(rng):
    period, max_regen = 5, 4
    x = (rng.random(2000) < 0.02).astype(np.int8)
    blk = Regenerate(period, max_regen)
    st = blk.init_state()
    st, a = jax.jit(blk.work)(st, jnp.asarray(x))
    st = blk.init_state()
    outs = []
    for i in range(0, 2000, 500):
        st, y = jax.jit(blk.work)(st, jnp.asarray(x[i:i + 500]))
        outs.append(np.asarray(y))
    np.testing.assert_array_equal(np.asarray(a), np.concatenate(outs))


_QPSK = np.array([1 + 1j, -1 + 1j, -1 - 1j, 1 - 1j]) / np.sqrt(2)
_QPSK_SYMS = [0, 1, 2, 3]


def test_calc_soft_dec_signs():
    # at a constellation point, each bit's LLR must lean the right way
    for i, pt in enumerate(_QPSK):
        s = calc_soft_dec(complex(pt), _QPSK, _QPSK_SYMS, npwr=0.3)
        bits = [(i >> 1) & 1, i & 1]  # MSB first
        for b, llr in zip(bits, s):
            assert (llr > 0) == (b == 1), (i, s)


def test_soft_dec_table_roundtrip():
    prec = 5
    tab = soft_dec_table(_QPSK, _QPSK_SYMS, prec, npwr=0.5)
    assert len(tab) == (2 ** prec) ** 2
    gen_tab = soft_dec_table_generator(
        lambda pt, Es: calc_soft_dec(pt, _QPSK, _QPSK_SYMS, 0.5), prec)
    # near point 0 (symbol 0 = bits 00) both LLRs lean '0', i.e. negative
    s = calc_soft_dec_from_table(0.6 + 0.6j, gen_tab, prec)
    assert s[0] < 0 and s[1] < 0
    s0 = calc_soft_dec_from_table(complex(_QPSK[0]), gen_tab, prec)
    direct = calc_soft_dec(complex(_QPSK[0]), _QPSK, _QPSK_SYMS, 1)
    assert np.array_equal(np.sign(s0), np.sign(direct))


def test_soft_llr_lut_device():
    tab, lookup = soft_llr_lut(_QPSK, _QPSK_SYMS, prec=6, npwr=0.4)
    pts = jnp.asarray(_QPSK.astype(np.complex64))
    llr = np.asarray(jax.jit(lookup)(pts))
    for i in range(4):
        bits = [(i >> 1) & 1, i & 1]
        for j, b in enumerate(bits):
            assert (llr[i, j] > 0) == (b == 1)


def _bpsk_obs(bits):
    return (1.0 - 2.0 * bits.astype(np.float32))


def test_siso_combined_decodes(rng):
    # rate-1/2 K=3 conv code, BPSK observations, min-sum SISO
    fsm = FSM.from_generator(1, 2, [[0o7, 0o5]])
    K = 64
    data = rng.integers(0, 2, K).astype(np.int32)
    coded = np.asarray(encode_fsm(fsm, jnp.asarray(data), 0))  # (K,) O-syms
    # observation: 2 BPSK values per step from the 2 output bits
    obits = np.stack([(coded >> 1) & 1, coded & 1], -1).reshape(-1)
    obs = _bpsk_obs(obits) + 0.1 * rng.standard_normal(2 * K).astype(np.float32)
    table = np.array([[1, 1], [1, -1], [-1, 1], [-1, -1]], np.float32)
    # table[o] = BPSK pair for output symbol o (MSB first)
    table = np.array([[_bpsk_obs(np.array([(o >> 1) & 1]))[0],
                       _bpsk_obs(np.array([o & 1]))[0]] for o in range(4)],
                     np.float32)
    blk = TrellisSisoCombined(fsm, K, 0, -1, True, False, "min_sum", 2,
                              table, TRELLIS_EUCLIDEAN)
    pri = jnp.zeros(K * fsm.I, jnp.float32)
    st, (post,) = jax.jit(lambda s, a, b: blk.apply(s, (a, b), None))(
        None, pri, jnp.asarray(obs))
    post = np.asarray(post).reshape(K, fsm.I)
    dec = np.argmin(post, axis=1)
    np.testing.assert_array_equal(dec, data)
    # TrellisSiso over precomputed metrics must agree
    met = np.asarray(calc_metric(jnp.asarray(obs), table, fsm.O, 2,
                                 TRELLIS_EUCLIDEAN)).reshape(-1)
    blk2 = TrellisSiso(fsm, K, 0, -1, True, False, "min_sum")
    st, (post2,) = jax.jit(lambda s, a, b: blk2.apply(s, (a, b), None))(
        None, pri, jnp.asarray(met))
    np.testing.assert_allclose(np.asarray(post2).reshape(K, fsm.I), post,
                               atol=1e-5)


def test_fir_filter_with_buffer(rng):
    taps = rng.standard_normal(31).astype(np.float32)
    x = (rng.standard_normal(1000) + 1j * rng.standard_normal(1000)
         ).astype(np.complex64)
    k = FirFilterWithBuffer(taps, complex_data=True)
    st = k.init_state()
    outs = []
    for i in range(0, 1000, 250):
        st, y = jax.jit(k.filter)(st, jnp.asarray(x[i:i + 250]))
        outs.append(np.asarray(y))
    got = np.concatenate(outs)
    ref = np.convolve(np.concatenate([np.zeros(30, np.complex64), x]),
                      taps)[30: 30 + 1000]
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
    # decimating form
    st = k.init_state()
    st, yd = jax.jit(lambda s, v: k.filterNdec(s, v, 4))(st, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(yd), ref[::4], rtol=2e-5, atol=2e-5)


def _pd2_ref(x, thr, look, alpha):
    """Literal transcription of peak_detector2_fb_impl.cc as a per-sample
    machine (the crossing sample is re-presented to the found branch)."""
    out = np.zeros(len(x), np.int8)
    avg, found, count = 0.0, False, 0
    peak_val, peak_off = -np.inf, 0
    i = 0
    while i < len(x):
        v = x[i]
        if not found:
            avg = alpha * v + (1 - alpha) * avg
            if v > avg * (1 + thr):
                found = True
                peak_val, peak_off, count = -np.inf, i, 0
                continue  # re-present this sample to the found branch
            i += 1
        else:
            avg = alpha * v + (1 - alpha) * avg
            if v > peak_val:
                peak_val, peak_off = v, i
            count += 1
            if count >= look:
                out[peak_off] = 1
                found = False
            i += 1
    return out


def test_peak_detector2_matches_reference(rng):
    from gnuradio_tpu.ops.catalog_strays import PeakDetector2
    thr, look, alpha = 2.0, 40, 0.01
    x = np.abs(rng.standard_normal(4000)).astype(np.float32) * 0.2
    for p in range(200, 4000, 350):
        x[p] = 3.0 + rng.random()
    ref = _pd2_ref(x.astype(np.float64), thr, look, alpha)
    blk = PeakDetector2(thr, look, alpha)
    st = blk.init_state()
    st, (got, avgs) = jax.jit(
        lambda s, v: blk.apply(s, (v,), None))(st, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(got), ref)
