"""symbol_sync_cc — composable symbol timing recovery.

Reference parity: gr-digital's modern symbol synchronizer
(lib/symbol_sync_cc_impl.cc:389-470 hot loop) composed of
  * a timing error detector (lib/timing_error_detector.cc — 9 types in
    include/gnuradio/digital/timing_error_detector_type.h:19-29; the four
    main families are implemented here: Gardner, zero-crossing,
    Mueller&Müller, early-late; the ML slope variants reduce to these for
    PAM/PSK inputs)
  * a PI clock tracking loop (lib/clock_tracking_loop.cc: avg_period +=
    beta*e; inst_period = avg_period + alpha*e, both clamped to
    nominal*(1 ± max_deviation))
  * an interpolating resampler (the MMSE 8-tap interpolator table,
    lib/interpolating_resampler.cc)

TPU design: one lax.scan per chunk over OUTPUT symbols (same masked
static-rate contract as ClockRecoveryMM — SURVEY.md §7 hard part (b)); each
step interpolates the symbol sample and, for mid-sample TEDs, the
half-period sample. Runs at symbol rate; the heavy matched filter stays in
the parallel front-end.
"""
from __future__ import annotations

import math
from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

from ..core.block import Block
from ..core.stream import PortSpec, C, F
from .digital_loops import mmse_interp

# interpolating resampler types (interpolating_resampler_type.h:19-22;
# impls gr-digital/lib/interpolating_resampler.cc)
IR_MMSE_8TAP = "mmse_8tap"
IR_PFB_NO_MF = "pfb_no_mf"
IR_PFB_MF = "pfb_mf"

TED_GARDNER = "gardner"
TED_ZERO_CROSSING = "zero_crossing"
TED_MUELLER_AND_MULLER = "mueller_and_muller"
TED_MOD_MUELLER_AND_MULLER = "mod_mueller_and_muller"
TED_EARLY_LATE = "early_late"
TED_SIGNAL_TIMES_SLOPE_ML = "signal_times_slope_ml"
TED_SIGNUM_TIMES_SLOPE_ML = "signum_times_slope_ml"
TED_DANDREA_AND_MENGALI_GEN_MSK = "dandrea_and_mengali_gen_msk"
TED_MENGALI_AND_DANDREA_GMSK = "mengali_and_dandrea_gmsk"


def _slice_qpsk(z):
    return ((jnp.where(z.real >= 0, 1.0, -1.0)
             + 1j * jnp.where(z.imag >= 0, 1.0, -1.0))
            / np.sqrt(2)).astype(C)


class SymbolSync(Block):
    """symbol_sync_cc with selectable TED. Consumes round(sps) inputs per
    output symbol (masked static rate); PI loop clamps the period to
    sps*(1 ± max_deviation)."""

    SLACK = 32

    def __init__(self, sps: float, loop_bw: float, ted_type: str = TED_GARDNER,
                 damping: float = 1.0, ted_gain: float = 1.0,
                 max_deviation: float = 1.5, constellation_slicer=None,
                 interp_type: str = IR_MMSE_8TAP, nfilts: int = 32,
                 mf_taps=None, dtype=C, debug_outputs: bool = False,
                 name=None):
        super().__init__(name)
        self.dtype = dtype
        self.debug = bool(debug_outputs)
        self.in_ports = (PortSpec(dtype),)
        # optional debug outputs (symbol_sync_xx_impl.cc ports 1-3):
        # TED error, instantaneous period, average period
        self.out_ports = ((PortSpec(dtype), PortSpec(F), PortSpec(F),
                           PortSpec(F)) if self.debug
                          else (PortSpec(dtype),))
        self.sps = float(sps)
        self.isps = int(round(sps))
        self.ted_type = ted_type
        # clock_tracking_loop gains (clock_tracking_loop.cc set_loop_bw):
        # critically-damped 2nd order PI normalized by the TED gain
        w = loop_bw
        denom = 1.0 + 2.0 * damping * w + w * w
        self.alpha = (4.0 * damping * w / denom) / ted_gain
        self.beta = (4.0 * w * w / denom) / ted_gain
        self.max_dev = float(max_deviation)
        self.slicer = constellation_slicer or _slice_qpsk
        self.interp_type = interp_type
        self._build_interp(interp_type, nfilts, mf_taps)

    def _build_interp(self, interp_type, nfilts, mf_taps):
        """Precompute the (arms+1, taps) bank for the selected resampler.
        Bank row a interpolates at mu = a/arms between window samples
        `lead-1` and `lead` (interp_resampler_* in interpolating_resampler.cc:
        MMSE uses the 8-tap table; PFB_NO_MF a 2^ceil(log2(nfilts-1))-arm
        quantization of the same fractional-delay design; PFB_MF the
        polyphase split of the matched filter so the interpolator IS the
        RRC filter, with the last row = arm 0 advanced one sample)."""
        from .misc_fills import design_mmse_interp_taps
        if interp_type == IR_MMSE_8TAP:
            self._bank = design_mmse_interp_taps(8, 128)  # (129, 8)
        elif interp_type == IR_PFB_NO_MF:
            nf = 1 << (int(math.log2(max(2, nfilts) - 1)) + 1)
            self._bank = design_mmse_interp_taps(8, nf)   # (nf+1, 8)
        elif interp_type == IR_PFB_MF:
            if mf_taps is None:
                raise ValueError("IR_PFB_MF requires mf_taps (the matched "
                                 "filter prototype, e.g. RRC at sps)")
            t = np.asarray(mf_taps, np.float64)
            nf = int(nfilts)
            if len(t) < nf:
                raise ValueError("mf_taps must be >= nfilts long "
                                 "(interpolating_resampler.cc pfb_mf ctor)")
            tpf = -(-len(t) // nf)
            padded = np.zeros(nf * tpf)
            padded[: len(t)] = t
            arms = padded.reshape(tpf, nf).T   # (nf, tpf): arm a = t[a::nf]
            # rows stored REVERSED for forward-window dots: row a dotted
            # with xp[base .. base+tpf-1] = MF output at base+tpf-1 + a/nf
            arows = arms[:, ::-1]
            # row nf = arm 0 advanced one whole input sample, so mu -> 1.0
            # rounds up without arm-wrap logic (the reference's nfilts+1
            # rows, interpolating_resampler.cc pfb_mf ctor tail)
            adv = np.zeros(tpf)
            adv[1:] = arows[0][:-1]
            # taps used as given (reference does not rescale): pass the
            # nfilts-times-oversampled prototype with gain nfilts, e.g.
            # firdes.root_raised_cosine(nfilts, nfilts*sps, 1, beta,
            # 11*sps*nfilts) — the pfb_clock_sync convention
            bank = np.vstack([arows, adv[None]])
            self._bank = bank.astype(np.float32)
        else:
            raise ValueError(f"unknown interpolating resampler {interp_type}")
        self._nsteps = self._bank.shape[0] - 1
        self._ntaps_i = self._bank.shape[1]
        # input tail must cover the interpolator window + loop lookahead
        self.SLACK = max(32, self._ntaps_i + self.isps + 8)

    def _interp_at_fn(self, xp):
        """Return interp(pos) -> bank-row dot at the quantized fraction.
        Result is the (matched-)filtered signal at pos + const window
        delay — a fixed shift the acquisition loop absorbs, exactly like
        the reference's d_interps' group delays."""
        bank = jnp.asarray(self._bank)
        nsteps = self._nsteps
        W = self._ntaps_i

        def interp(pos):
            ii = jnp.floor(pos).astype(jnp.int32)
            mu = pos - jnp.floor(pos)
            a = jnp.clip(jnp.round(mu * nsteps).astype(jnp.int32), 0, nsteps)
            window = jax.lax.dynamic_slice(xp, (ii,), (W,))
            return jnp.sum(window * bank[a])
        return interp

    @property
    def in_rates(self):
        return (Fraction(self.isps),)

    @property
    def out_rates(self):
        return tuple(Fraction(1) for _ in self.out_ports)

    def init_state(self):
        return {"tail": jnp.zeros(self.SLACK, self.dtype),
                "pos": jnp.float32(0.0),
                "avg_period": jnp.float32(self.sps),
                "prev": jnp.zeros((), self.dtype),   # previous symbol
                "prev2": jnp.zeros((), self.dtype),  # symbol before that
                "prev_mid": jnp.zeros((), self.dtype),
                "prev_d": jnp.zeros((), self.dtype),  # previous decision
                "prev_d2": jnp.zeros((), self.dtype)}

    def _ted(self, s):
        """Error expressions per timing_error_detector.cc compute_error_cf.
        s: dict with curr/mid/prev/prev2/prev_mid/deriv/d_* samples."""
        t = self.ted_type
        curr, mid, prev = s["curr"], s["mid"], s["prev"]
        if t == TED_GARDNER:
            return ((prev - curr) * jnp.conj(mid)).real
        if t == TED_ZERO_CROSSING:
            return ((s["d_prev"] - s["d_curr"]) * jnp.conj(mid)).real
        if t == TED_MUELLER_AND_MULLER:
            return (s["d_prev"] * jnp.conj(curr)
                    - s["d_curr"] * jnp.conj(prev)).real
        if t == TED_MOD_MUELLER_AND_MULLER:
            u = ((curr - s["prev2"]) * jnp.conj(s["d_prev"])
                 - (s["d_curr"] - s["d_prev2"]) * jnp.conj(prev))
            return jnp.clip(u.real, -1.0, 1.0)
        if t == TED_EARLY_LATE:
            # mid here is (late - early)/2 slope approximation
            return (jnp.conj(curr) * mid).real
        if t == TED_SIGNAL_TIMES_SLOPE_ML:
            dv = s["deriv"]
            return (curr.real * dv.real + curr.imag * dv.imag) / 2.0
        if t == TED_SIGNUM_TIMES_SLOPE_ML:
            dv = s["deriv"]
            return (jnp.sign(curr.real) * dv.real
                    + jnp.sign(curr.imag) * dv.imag) / 2.0
        if t == TED_DANDREA_AND_MENGALI_GEN_MSK:
            u = (curr * curr * jnp.conj(prev * prev)
                 - mid * mid * jnp.conj(s["prev_mid"] * s["prev_mid"]))
            return jnp.clip(u.real, -3.0, 3.0)
        if t == TED_MENGALI_AND_DANDREA_GMSK:
            u = (-(curr * curr * jnp.conj(prev * prev))
                 + mid * mid * jnp.conj(s["prev_mid"] * s["prev_mid"]))
            return jnp.clip(u.real, -3.0, 3.0)
        raise ValueError(f"unknown TED {self.ted_type}")

    def apply(self, state, inputs, n_in):
        x = inputs[0]
        n = x.shape[0]
        n_out = n // self.isps
        xp = jnp.concatenate([state["tail"], x])
        pmin = jnp.float32(self.sps * (1 - self.max_dev / self.sps))
        pmax = jnp.float32(self.sps * (1 + self.max_dev / self.sps))
        half = jnp.float32(self.sps / 2.0)

        interp_at = self._interp_at_fn(xp)

        def step(carry, _):
            pos, avg_p, prev, prev2, prev_mid, prev_d, prev_d2 = carry
            curr = interp_at(pos)
            if self.ted_type == TED_EARLY_LATE:
                early = interp_at(jnp.maximum(pos - 1.0, 0.0))
                late = interp_at(pos + 1.0)
                mid = (late - early) * 0.5
            else:
                mid = interp_at(jnp.maximum(pos - half, 0.0))
            deriv = (interp_at(pos + 0.5)
                     - interp_at(jnp.maximum(pos - 0.5, 0.0)))
            d_curr = self.slicer(curr)
            e = jnp.clip(self._ted({
                "curr": curr, "mid": mid, "prev": prev, "prev2": prev2,
                "prev_mid": prev_mid, "deriv": deriv,
                "d_curr": d_curr, "d_prev": prev_d, "d_prev2": prev_d2,
            }), -3.0, 3.0)
            avg_p = jnp.clip(avg_p + self.beta * e, pmin, pmax)
            inst_p = jnp.clip(avg_p + self.alpha * e, pmin, pmax)
            pos = pos + inst_p
            return ((pos, avg_p, curr, prev, mid, d_curr, prev_d),
                    (curr, e, inst_p, avg_p))

        carry0 = (state["pos"], state["avg_period"], state["prev"],
                  state["prev2"], state["prev_mid"], state["prev_d"],
                  state["prev_d2"])
        (pos, avg_p, prev, prev2, prev_mid, prev_d, prev_d2), \
            (y, err, tinst, tavg) = jax.lax.scan(step, carry0, None,
                                                 length=n_out)
        new_tail = xp[xp.shape[0] - self.SLACK:]
        state2 = {"tail": new_tail, "pos": pos - jnp.float32(n),
                  "avg_period": avg_p, "prev": prev, "prev2": prev2,
                  "prev_mid": prev_mid, "prev_d": prev_d,
                  "prev_d2": prev_d2}
        if self.debug:
            return state2, (y.astype(self.dtype),
                            jnp.real(err).astype(jnp.float32),
                            tinst.astype(jnp.float32),
                            tavg.astype(jnp.float32))
        return state2, (y.astype(self.dtype),)


def symbol_sync_cc(sps, loop_bw, ted_type=TED_GARDNER, damping=1.0,
                   ted_gain=1.0, max_deviation=1.5,
                   constellation_slicer=None, interp_type=IR_MMSE_8TAP,
                   nfilts=32, mf_taps=None):
    return SymbolSync(sps, loop_bw, ted_type, damping, ted_gain,
                      max_deviation, constellation_slicer, interp_type,
                      nfilts, mf_taps)
