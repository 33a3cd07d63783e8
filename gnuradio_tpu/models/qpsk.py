"""QPSK transceiver — BASELINE.json config #3.

Reference chain (gr-digital/python/digital/generic_mod_demod.py:123-155 mod,
:269-314 demod):
  TX: bits -> pack to symbol chunks -> diff encode -> chunks_to_symbols
      -> RRC pulse-shaping interpolator (pfb_arb_resampler in the reference;
      interp FIR here)
  RX: agc2_cc -> fll_band_edge_cc -> RRC matched filter ->
      clock recovery (M&M) -> costas_loop_cc -> constellation decode ->
      diff decode -> bits

Built as bare jittable step functions (models convention) — the graph-block
forms of every stage exist in ops/ and are QA'd individually; this module
wires the flagship receive path for loopback QA and bench.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import firdes
from ..ops.analog import Agc2
from ..ops.digital import DiffDecoder
from ..ops.digital_loops import CfoCorrector, CostasLoop, PfbClockSync


def rrc_taps(sps: int, excess_bw: float = 0.35, ntaps: int | None = None,
             gain: float | None = None):
    if ntaps is None:
        ntaps = 11 * sps
    if gain is None:
        gain = sps  # interp filter gain (generic_mod_demod.py:140)
    return firdes.root_raised_cosine(gain, sps, 1.0, excess_bw, ntaps)


# Differential coding runs in the ANGLE domain: symbol u maps to the point
# e^{j(pi/4 + u*pi/2)}, so a pi/2 carrier-phase ambiguity (Costas lock
# point) adds a CONSTANT to u and cancels in the differential decode — the
# same invariance GR achieves with pre_diff_code index remapping
# (gr-digital constellation.h pre_diff_code + diff_encoder_bb).
_ANGLE_PTS = np.exp(1j * (np.pi / 4 + np.pi / 2 * np.arange(4))).astype(np.complex64)


def qpsk_tx(bits: np.ndarray, sps: int = 4, excess_bw: float = 0.35):
    """Host-side reference TX (numpy): bits (2k,) of {0,1} -> baseband IQ at
    sps samples/symbol. Returns (iq, data_symbols)."""
    b = np.asarray(bits).reshape(-1, 2)
    sym = (b[:, 0] << 1) | b[:, 1]          # 2 bits -> symbol index, MSB first
    d = np.cumsum(sym) % 4                  # differential encode mod 4
    pts = _ANGLE_PTS[d]
    up = np.zeros(len(pts) * sps, np.complex64)
    up[::sps] = pts
    taps = rrc_taps(sps, excess_bw)
    iq = np.convolve(up, taps)[: len(up)].astype(np.complex64)
    return iq, sym


def make_qpsk_rx(sps: int = 4, excess_bw: float = 0.35,
                 timing_bw: float = 2 * math.pi / 100,
                 costas_bw: float = 2 * math.pi / 100, nfilts: int = 32):
    """Returns (init_state, step) for the QPSK receive chain:
    agc2 -> chunk CFO acquisition (x^4, replacing fll_band_edge's role) ->
    pfb_clock_sync (RRC matched filter + rotation-invariant timing) ->
    costas -> quadrant decision -> differential decode.

    step(state, iq[(n,) complex64]) -> (state, sym_idx[(n/sps,) int8]) —
    decided differential-decoded symbol indices.
    """
    agc = Agc2(attack_rate=1e-1, decay_rate=1e-2, reference=1.0, gain=1.0,
               complex_in=True)
    cfo = CfoCorrector()
    mf_taps = rrc_taps(sps, excess_bw, ntaps=11 * sps * nfilts,
                       gain=nfilts) / sps
    pcs = PfbClockSync(float(sps), timing_bw, mf_taps, nfilts)
    costas = CostasLoop(costas_bw, 4)
    dd = DiffDecoder(4)

    blocks = [agc, cfo, pcs, costas, dd]

    def init_state():
        return [b.init_state() for b in blocks]

    def step(state, iq):
        s = list(state)
        s[0], y = agc.work(s[0], iq)
        s[1], y = cfo.work(s[1], y)
        s[2], (y,) = pcs.apply(s[2], (y,), (y.shape[0],))
        s[3], y = costas.work(s[3], y)
        # angle-quadrant decision: u = floor(angle / (pi/2)) with the pi/4
        # offset — rotation ambiguity is +const, removed by diff decode
        ang = jnp.angle(y)  # (-pi, pi]
        u = jnp.floor(ang / (jnp.pi / 2)).astype(jnp.int32) % 4
        s[4], sym = dd.work(s[4], u.astype(jnp.int8))
        return s, sym

    return init_state, step


def ber_after_alignment(rx_sym: np.ndarray, tx_sym: np.ndarray,
                        skip: int = 100, max_lag: int = 64):
    """Search symbol lag + QPSK phase rotation ambiguity; return best BER.
    (Costas locks modulo pi/2; differential decoding makes the data
    rotation-invariant except for a constant index offset per rotation.)"""
    rx = np.asarray(rx_sym).astype(np.int64)[skip:]
    best = 1.0
    for lag in range(max_lag):
        t = tx_sym[skip - 0:][: len(rx) - lag] if lag else tx_sym[skip:][: len(rx)]
        r = rx[lag: lag + len(t)]
        if len(t) < 100:
            continue
        m = min(len(t), len(r))
        errs = np.count_nonzero(r[:m] != t[:m])
        best = min(best, errs / m)
    return best
