"""QA for the ATSC RX front end (fpll / timing_sync / fs_check / equalize).

Integration-style: synthesize from the (already byte-exact-tested) TX
chain, impair, and check each acquisition stage recovers — the analog of
the reference's over-the-air RX chain in uhd_atsc_rx.grc."""
import numpy as np
import jax.numpy as jnp
import pytest
import scipy.signal

from gnuradio_tpu.ops import atsc


@pytest.fixture(scope="module")
def tx_fields():
    rng = np.random.default_rng(7)
    ts = rng.integers(0, 256, 2 * 312 * 188)
    ts[::188] = 0x47
    syms, _ = atsc.atsc_tx_symbols(jnp.asarray(ts))
    return np.asarray(syms)  # [626, 832] codes 0..7


def test_fpll_locks_and_recovers_baseband(tx_fields):
    rate = atsc.SYMBOL_RATE
    v = (tx_fields[:100].reshape(-1).astype(np.float32) * 2.0 - 7.0
         ) + atsc.PILOT
    f0 = (3e6 - 0.309e6) / rate          # the freq the FPLL NCO expects
    n = np.arange(v.size)
    # 8-VSB is single-sideband: transmit the analytic signal at -f0
    va = scipy.signal.hilbert(v)
    iq = (va * np.exp(-2j * np.pi * f0 * n)).astype(np.complex64)
    out, _ = atsc.fpll(jnp.asarray(iq), rate)
    out = np.asarray(out)
    # after settling, the mixed output must track v
    a, b = out[40000:], v[40000:]
    corr = np.dot(a, b) / np.sqrt(np.dot(a, a) * np.dot(b, b))
    # locked-with-jitter: the single-pole AFC passes data sidebands (the
    # reference behaves the same); the equalizer downstream absorbs the
    # residual. Unlocked correlation is ~0.
    assert corr > 0.8


def test_timing_sync_finds_segments(tx_fields):
    levels = tx_fields.reshape(-1).astype(np.float32) * 2.0 - 7.0
    # band-limited 2x oversample (the RRC-shaped channel analog), plus a
    # half-sample timing offset the loop must absorb
    up = scipy.signal.resample(levels, levels.size * 2).astype(np.float32)
    segs, info = atsc.timing_sync(jnp.asarray(up), 2 * atsc.SYMBOL_RATE)
    assert len(segs) > 400            # most of the 626 segments recovered
    # after settling, recovered hard decisions match TX symbols
    tail = segs[-100:]
    want = None
    # locate by correlating against the TX symbol stream
    hard = np.clip(np.round((tail.reshape(-1) + 7) / 2), 0, 7)
    flat = tx_fields.reshape(-1)
    m = len(hard)
    best_match = 0.0
    for off in range(0, flat.size - m, 832):
        agree = (np.abs(flat[off:off + m] - hard) <= 0).mean()
        best_match = max(best_match, agree)
    assert best_match > 0.95


def test_fs_check_classifies_fields(tx_fields):
    soft = tx_fields.astype(np.float32) * 2.0 - 7.0
    data, f2, segno, fs_rows = atsc.fs_check(soft)
    assert fs_rows == [0, 313]
    assert data.shape == (624, 832)
    assert (~f2[:312]).all() and f2[312:].all()
    assert (segno[:312] == np.arange(312)).all()


def test_equalizer_removes_channel(tx_fields):
    soft = tx_fields.astype(np.float32) * 2.0 - 7.0
    # mild multipath: h = [1, 0, 0.25]
    stream = soft.reshape(-1)
    rx = stream + 0.25 * np.concatenate([[0, 0], stream[:-2]])
    segs = rx.reshape(-1, 832).astype(np.float32)
    is_fs = np.zeros(segs.shape[0], bool)
    is_fs[0] = is_fs[313] = True
    f2 = np.zeros(segs.shape[0], bool)
    f2[313] = True
    taps = None
    for _ in range(3):      # 6 fields of training (one LMS pass per fs seg)
        out, taps = atsc.equalize(segs, is_fs, f2, taps)
    assert out.shape == (624, 832)
    second = out[312:]
    clean = soft.reshape(-1, 832)
    want = np.delete(clean, [0, 313], axis=0)[312:]
    hard = 2 * np.round((second - 1) / 2) + 1   # odd levels -7..7
    err = (np.clip(hard, -7, 7) != want).mean()
    assert err < 1e-3
