"""QA for equalizers + symbol_sync (behavioral convergence tests, the
qa_constellation_receiver / qa_symbol_sync pattern: synthesize an impaired
signal, run recovery, check steady-state symbol fidelity)."""
import numpy as np
import jax.numpy as jnp
import pytest

from gnuradio_tpu import Flowgraph, TopBlock
from gnuradio_tpu.ops import blocks as blk
from gnuradio_tpu.ops import equalizers as eq
from gnuradio_tpu.ops import symbol_sync as ss
from gnuradio_tpu.ops.firdes import root_raised_cosine

QPSK = (np.array([1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j]) / np.sqrt(2)
        ).astype(np.complex64)


def _qpsk_syms(rng, n):
    return QPSK[rng.integers(0, 4, n)]


def run_graph(*chain, **kw):
    fg = Flowgraph()
    fg.connect(*chain)
    TopBlock(fg, **kw).run()


def test_lms_equalizer_opens_static_channel(rng):
    """Static 3-tap channel; LMS with training must converge (MSE drop)."""
    n = 4000
    syms = _qpsk_syms(rng, n)
    chan = np.array([0.2, 1.0, -0.3 + 0.1j])
    rx = np.convolve(syms, chan, mode="full")[1:n + 1].astype(np.complex64)
    train = syms[:200]
    src = blk.vector_source(rx)
    lq = eq.linear_equalizer(11, 1, "lms", mu=0.01,
                             points=QPSK, training_sequence=train)
    snk = blk.vector_sink_c()
    tsnk = blk.null_sink(vlen=11)
    fg = Flowgraph()
    fg.connect(src, lq, snk)
    fg.connect((lq, 1), (tsnk, 0))
    TopBlock(fg, target_items=n).run()
    out = snk.data()
    # compare tail symbols to transmitted (allowing equalizer delay search)
    best = 1e9
    for d in range(11):
        seg = out[2000:3800]
        ref = syms[2000 - d:3800 - d]
        mse = np.mean(np.abs(seg - ref) ** 2)
        best = min(best, mse)
    assert best < 0.05


def test_cma_equalizer_restores_modulus(rng):
    n = 8000
    syms = _qpsk_syms(rng, n)
    chan = np.array([1.0, 0.35 - 0.2j])
    rx = np.convolve(syms, chan, mode="full")[:n].astype(np.complex64)
    src = blk.vector_source(rx)
    cq = eq.cma_equalizer_cc(9, 1.0, 0.005)
    snk = blk.vector_sink_c()
    tsnk = blk.null_sink(vlen=9)
    fg = Flowgraph()
    fg.connect(src, cq, snk)
    fg.connect((cq, 1), (tsnk, 0))
    TopBlock(fg, target_items=n).run()
    out = snk.data()
    tail = out[6000:]
    assert np.std(np.abs(tail)) < 0.08  # constant modulus restored


def test_dfe_with_training(rng):
    n = 4000
    syms = _qpsk_syms(rng, n)
    chan = np.array([1.0, 0.0, 0.4])
    rx = np.convolve(syms, chan, mode="full")[:n].astype(np.complex64)
    src = blk.vector_source(rx)
    dfe = eq.decision_feedback_equalizer(
        9, 4, 1, "lms", mu=0.01, points=QPSK, training_sequence=syms[:400])
    snk = blk.vector_sink_c()
    tsnk = blk.null_sink(vlen=13)
    fg = Flowgraph()
    fg.connect(src, dfe, snk)
    fg.connect((dfe, 1), (tsnk, 0))
    TopBlock(fg, target_items=n).run()
    out = snk.data()
    best = 1e9
    for d in range(9):
        seg = out[3000:3800]
        ref = syms[3000 - d:3800 - d]
        best = min(best, np.mean(np.abs(seg - ref) ** 2))
    assert best < 0.05


def _rrc_shaped_qpsk(rng, nsym, sps, offset_samples=0.0, sro=1.0):
    syms = _qpsk_syms(rng, nsym)
    taps = root_raised_cosine(1.0, sps, 1.0, 0.35, 11 * sps)
    up = np.zeros(nsym * sps, np.complex64)
    up[::sps] = syms
    shaped = np.convolve(up, taps, mode="full")
    # fractional resample for timing offset / rate error
    t = np.arange(0, len(shaped) - 2, sro) + offset_samples
    ti = t.astype(int)
    frac = t - ti
    sig = shaped[ti] * (1 - frac) + shaped[ti + 1] * frac
    return syms, sig.astype(np.complex64), taps


@pytest.mark.parametrize("ted", [ss.TED_GARDNER, ss.TED_ZERO_CROSSING,
                                 ss.TED_MUELLER_AND_MULLER])
def test_symbol_sync_recovers_timing(rng, ted):
    sps = 4
    nsym = 3000
    syms, sig, taps = _rrc_shaped_qpsk(rng, nsym, sps,
                                       offset_samples=1.7, sro=1.0005)
    # matched filter first (as in real receivers)
    mf = np.convolve(sig, taps, mode="full").astype(np.complex64)
    src = blk.vector_source(mf)
    sync = ss.symbol_sync_cc(sps, 0.05, ted)
    snk = blk.vector_sink_c()
    run_graph(src, sync, snk, target_items=4096)
    out = snk.data()
    # steady state: decisions should match a rotation-free delayed version
    tail = out[1500:2800]
    # normalize amplitude
    tail = tail / np.sqrt(np.mean(np.abs(tail) ** 2))
    hard = np.sign(tail.real) + 1j * np.sign(tail.imag)
    # find best symbol alignment against tx
    best_err = 1.0
    txh = np.sign(syms.real) + 1j * np.sign(syms.imag)
    for d in range(1480, 1520):
        ref = txh[d:d + len(hard)]
        if len(ref) < len(hard):
            break
        err = np.mean(hard != ref)
        best_err = min(best_err, err)
    assert best_err < 0.02, f"symbol error rate {best_err} with {ted}"


def test_symbol_sync_period_converges(rng):
    sps = 4
    syms, sig, taps = _rrc_shaped_qpsk(rng, 2000, sps, 0.3, 1.001)
    mf = np.convolve(sig, taps, mode="full").astype(np.complex64)
    src = blk.vector_source(mf)
    sync = ss.symbol_sync_cc(sps, 0.05, ss.TED_GARDNER)
    snk = blk.vector_sink_c()
    fg = Flowgraph()
    fg.connect(src, sync, snk)
    tb = TopBlock(fg, target_items=4096)
    tb.run()
    avg_p = float(np.asarray(tb.state[sync.name]["avg_period"]))
    assert abs(avg_p - sps * 1.001) < 0.05


# ---------------------------------------------------------------------------
# interpolating resampler selection (interpolating_resampler.cc: MMSE /
# PFB no-MF / PFB matched-filter banks)
# ---------------------------------------------------------------------------

def test_symbol_sync_pfb_no_mf_matches_mmse(rng):
    sps = 4
    nsym = 2500
    syms, sig, taps = _rrc_shaped_qpsk(rng, nsym, sps,
                                       offset_samples=1.3, sro=1.0004)
    mf = np.convolve(sig, taps, mode="full").astype(np.complex64)

    outs = {}
    for it in (ss.IR_MMSE_8TAP, ss.IR_PFB_NO_MF):
        src = blk.vector_source(mf)
        sync = ss.symbol_sync_cc(sps, 0.05, ss.TED_GARDNER, interp_type=it,
                                 nfilts=128)
        snk = blk.vector_sink_c()
        run_graph(src, sync, snk, target_items=4096)
        outs[it] = snk.data()
    a, b = outs[ss.IR_MMSE_8TAP], outs[ss.IR_PFB_NO_MF]
    k = min(len(a), len(b))
    # identical design at the same 128-step quantization -> near-identical
    np.testing.assert_allclose(a[200:k], b[200:k], atol=0.05)


def test_symbol_sync_pfb_mf_locks_without_external_mf(rng):
    """IR_PFB_MF: the interpolator IS the matched filter — feed the raw
    RRC-shaped signal (no external MF) and expect clean symbols."""
    sps = 4
    nsym = 3000
    syms, sig, taps = _rrc_shaped_qpsk(rng, nsym, sps,
                                       offset_samples=1.7, sro=1.0005)
    nfilts = 32
    # nfilts-times-oversampled RRC prototype (pfb_clock_sync convention)
    mf_proto = root_raised_cosine(nfilts, nfilts * sps, 1.0, 0.35,
                                  11 * sps * nfilts)
    src = blk.vector_source(sig)  # NO external matched filter
    sync = ss.symbol_sync_cc(sps, 0.05, ss.TED_GARDNER,
                             interp_type=ss.IR_PFB_MF, nfilts=nfilts,
                             mf_taps=mf_proto)
    snk = blk.vector_sink_c()
    run_graph(src, sync, snk, target_items=4096)
    out = snk.data()
    tail = out[1500:2800]
    tail = tail / np.sqrt(np.mean(np.abs(tail) ** 2))
    hard = np.sign(tail.real) + 1j * np.sign(tail.imag)
    txh = np.sign(syms.real) + 1j * np.sign(syms.imag)
    best_err = 1.0
    for d in range(1480, 1520):
        ref = txh[d:d + len(hard)]
        if len(ref) < len(hard):
            break
        best_err = min(best_err, np.mean(hard != ref))
    assert best_err < 0.02, f"symbol error rate {best_err} with PFB-MF"
