"""gr-analog analog: signal sources, FM/PM mod & demod, AGC, noise.

Reference parity map (SURVEY.md §2.2 gr-analog row):
  sig_source_{c,f}        -> SigSource (fxpt int32 NCO, lib/sig_source_impl.cc)
  noise_source            -> NoiseSource (threefry instead of xoroshiro128+;
                             same distributions, documented substitution)
  quadrature_demod_cf     -> QuadratureDemod (conj-mult + arctan2;
                             lib/quadrature_demod_cf_impl.cc:42-56 — we use
                             exact arctan2 where the reference uses its
                             257-entry LUT fast_atan2f, which is strictly
                             more accurate; SURVEY.md App. C)
  frequency_modulator_fc  -> FrequencyModulator (int32 phase accumulation =
                             cumsum of fxpt deltas, exactly mod 2^32)
  phase_modulator_fc      -> PhaseModulator
  agc_cc/ff, agc2_cc/ff   -> Agc / Agc2 (per-sample recurrence via lax.scan —
                             inherently sequential; include/gnuradio/analog/agc.h)
  fm_deemph / fm_emph     -> fm_deemph (one-pole IIR from bilinear transform,
                             python/analog/fm_emph.py:40-80)
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core.block import SourceBlock, SyncBlock
from ..core.stream import PortSpec, C, F
from . import fxpt
from .filter import IirFilter

# waveform enum (gr::analog::gr_waveform_t)
GR_CONST_WAVE = "const"
GR_SIN_WAVE = "sin"
GR_COS_WAVE = "cos"
GR_SQR_WAVE = "square"
GR_TRI_WAVE = "triangle"
GR_SAW_WAVE = "sawtooth"


class SigSource(SourceBlock):
    """NCO-driven waveform source (gr-analog/lib/sig_source_impl.cc). Phase
    is an int32 fixed-point accumulator (fxpt_nco analog) so a 10^12-sample
    stream has zero frequency drift."""

    def __init__(self, sampling_freq, waveform, frequency, amplitude=1.0,
                 offset=0.0, initial_phase=0.0, complex_out=True, name=None):
        super().__init__(PortSpec(C if complex_out else F), name)
        self.sampling_freq = float(sampling_freq)
        self.waveform = waveform
        self.frequency = float(frequency)
        self.amplitude = amplitude
        self.offset = offset
        self.complex_out = complex_out
        self._phase0 = fxpt.float_to_fxpt(initial_phase)
        self._delta = fxpt.float_to_fxpt(
            2 * math.pi * self.frequency / self.sampling_freq)
        # live-retune message ports (sig_source_impl.cc msg handlers):
        # updates land on the block object; a running TopBlock applies them
        # at the next lock()/unlock() recompile boundary
        self.message_port_register_in("freq", self._on_freq)
        self.message_port_register_in("cmd", self._on_cmd)

    def _set_frequency(self, f):
        self.frequency = float(f)
        self._delta = fxpt.float_to_fxpt(
            2 * math.pi * self.frequency / self.sampling_freq)

    def _on_freq(self, msg):
        try:
            self._set_frequency(msg if not isinstance(msg, (tuple, list))
                                else msg[-1])
        except (TypeError, ValueError):
            pass

    def _on_cmd(self, msg):
        if isinstance(msg, dict):
            if "freq" in msg:
                self._set_frequency(msg["freq"])
            if "ampl" in msg:
                self.amplitude = float(msg["ampl"])
            if "offset" in msg:
                self.offset = float(msg["offset"])

    def init_state(self):
        return jnp.asarray(self._phase0, jnp.int32)

    def generate(self, state, n):
        amp = self.amplitude
        off = self.offset
        if self.waveform == GR_CONST_WAVE:
            v = jnp.full((n,), amp, jnp.float32) + off
            y = v.astype(C) if self.complex_out else v
            return state, y
        phases, nxt = fxpt.nco_phases(state, jnp.int32(self._delta), n)
        ang = fxpt.fxpt_to_float(phases)  # [-pi, pi)
        frac = phases.astype(jnp.float32) * jnp.float32(2.0 ** -32) + 0.5  # [0,1)
        if self.complex_out:
            if self.waveform in (GR_SIN_WAVE, GR_COS_WAVE):
                y = amp * jnp.exp(1j * ang) + off
            elif self.waveform == GR_SQR_WAVE:
                re = jnp.where(frac < 0.5, amp, 0.0)
                im = jnp.where((frac >= 0.25) & (frac < 0.75), amp, 0.0)
                y = re + 1j * im + off
            elif self.waveform == GR_TRI_WAVE:
                re = jnp.where(frac < 0.5, 2 * amp * frac, 2 * amp * (1 - frac))
                y = re + 1j * re + off
            elif self.waveform == GR_SAW_WAVE:
                y = amp * frac + 1j * amp * frac + off
            else:
                raise ValueError(self.waveform)
            return nxt, y.astype(C)
        if self.waveform == GR_SIN_WAVE:
            y = amp * jnp.sin(ang) + off
        elif self.waveform == GR_COS_WAVE:
            y = amp * jnp.cos(ang) + off
        elif self.waveform == GR_SQR_WAVE:
            y = jnp.where(frac < 0.5, amp, 0.0) + off
        elif self.waveform == GR_TRI_WAVE:
            y = jnp.where(frac < 0.5, 2 * amp * frac, 2 * amp * (1 - frac)) + off
        elif self.waveform == GR_SAW_WAVE:
            y = amp * frac + off
        else:
            raise ValueError(self.waveform)
        return nxt, y.astype(F)


def sig_source_c(sampling_freq, waveform, frequency, amplitude=1.0, offset=0.0,
                 phase=0.0):
    return SigSource(sampling_freq, waveform, frequency, amplitude, offset,
                     phase, complex_out=True)


def sig_source_f(sampling_freq, waveform, frequency, amplitude=1.0, offset=0.0,
                 phase=0.0):
    return SigSource(sampling_freq, waveform, frequency, amplitude, offset,
                     phase, complex_out=False)


class NoiseSource(SourceBlock):
    """Gaussian/uniform noise source (gr-analog noise_source). Uses JAX
    threefry counter-based RNG carried in state instead of the reference's
    xoroshiro128+ — same distributions, reproducible per seed."""

    def __init__(self, noise_type="gaussian", amplitude=1.0, seed=0,
                 complex_out=True, name=None):
        super().__init__(PortSpec(C if complex_out else F), name)
        self.noise_type = noise_type
        self.amplitude = float(amplitude)
        self.seed = int(seed)
        self.complex_out = complex_out

    def init_state(self):
        return jax.random.key(self.seed)

    def generate(self, state, n):
        key, sub = jax.random.split(state)
        if self.complex_out:
            if self.noise_type == "gaussian":
                v = jax.random.normal(sub, (n, 2), jnp.float32)
                # gr scales complex gaussian by amplitude/sqrt(2) per component
                y = (v[:, 0] + 1j * v[:, 1]) * (self.amplitude / math.sqrt(2))
            else:
                v = jax.random.uniform(sub, (n, 2), jnp.float32, -1.0, 1.0)
                y = (v[:, 0] + 1j * v[:, 1]) * self.amplitude
            return key, y.astype(C)
        if self.noise_type == "gaussian":
            y = jax.random.normal(sub, (n,), jnp.float32) * self.amplitude
        else:
            y = jax.random.uniform(sub, (n,), jnp.float32, -1.0, 1.0) * self.amplitude
        return key, y


def const_source_c(constant=1.0):
    """analog const_source_x: endless constant stream (sig_source with
    GR_CONST_WAVE and the constant as offset)."""
    return SigSource(1.0, GR_CONST_WAVE, 0.0, 0.0, constant,
                     complex_out=True)


def const_source_f(constant=1.0):
    return SigSource(1.0, GR_CONST_WAVE, 0.0, 0.0, constant,
                     complex_out=False)


def noise_source_c(noise_type="gaussian", amplitude=1.0, seed=0):
    return NoiseSource(noise_type, amplitude, seed, complex_out=True)


def noise_source_f(noise_type="gaussian", amplitude=1.0, seed=0):
    return NoiseSource(noise_type, amplitude, seed, complex_out=False)


class QuadratureDemod(SyncBlock):
    """FM discriminator: out[n] = gain * arg(x[n] * conj(x[n-1]))
    (gr-analog/lib/quadrature_demod_cf_impl.cc:42-56, history 2). Carries one
    sample; uses exact arctan2 (more accurate than the reference's
    fast_atan2f LUT; documented substitution, SURVEY.md App. C)."""

    def __init__(self, gain: float, name=None):
        super().__init__(PortSpec(C), PortSpec(F), name)
        self.gain = float(gain)

    def init_state(self):
        return jnp.zeros((), C)

    def work(self, state, x):
        prev = jnp.concatenate([state[None], x[:-1]], axis=0)
        p = x * jnp.conj(prev)
        y = self.gain * jnp.arctan2(p.imag, p.real)
        return x[-1], y.astype(F)


def quadrature_demod_cf(gain):
    return QuadratureDemod(gain)


class FrequencyModulator(SyncBlock):
    """frequency_modulator_fc: phase += sensitivity*x[n]; out = e^{j phase}
    (gr-analog/lib/frequency_modulator_fc_impl.cc). Accumulated in int32
    fixed point (exact mod 2^32) via cumsum of per-sample fxpt deltas."""

    def __init__(self, sensitivity: float, name=None):
        super().__init__(PortSpec(F), PortSpec(C), name)
        self.sensitivity = float(sensitivity)

    def init_state(self):
        return jnp.zeros((), jnp.int32)

    def work(self, state, x):
        # per-sample phase increments in fixed point; |sens*x| < pi assumed
        # (per-sample deviation below Nyquist), so |d| < 2^31 fits int32
        scale = jnp.float32(self.sensitivity / (2 * math.pi) * 2.0 ** 32)
        d = jnp.round(x * scale).astype(jnp.int32)
        ph = state + jnp.cumsum(d, dtype=jnp.int32)
        y = jnp.exp(1j * fxpt.fxpt_to_float(ph))
        return ph[-1], y.astype(C)


def frequency_modulator_fc(sensitivity):
    return FrequencyModulator(sensitivity)


class PhaseModulator(SyncBlock):
    """phase_modulator_fc: out = e^{j*sensitivity*x[n]}."""

    def __init__(self, sensitivity: float, name=None):
        super().__init__(PortSpec(F), PortSpec(C), name)
        self.sensitivity = float(sensitivity)

    def work(self, state, x):
        return state, jnp.exp(1j * self.sensitivity * x).astype(C)


def phase_modulator_fc(sensitivity):
    return PhaseModulator(sensitivity)


class Agc(SyncBlock):
    """agc_cc/ff: out = in*g; g += rate*(reference - |out|) per sample
    (include/gnuradio/analog/agc.h:58-67). Strictly sequential recurrence ->
    lax.scan (SURVEY.md §7 'hard parts (a)')."""

    def __init__(self, rate=1e-4, reference=1.0, gain=1.0, max_gain=0.0,
                 complex_in=True, name=None):
        p = PortSpec(C if complex_in else F)
        super().__init__(p, p, name)
        self.rate = float(rate)
        self.reference = float(reference)
        self.gain0 = float(gain)
        self.max_gain = float(max_gain)

    def init_state(self):
        return jnp.asarray(self.gain0, jnp.float32)

    def work(self, state, x):
        rate = jnp.float32(self.rate)
        ref = jnp.float32(self.reference)
        mg = jnp.float32(self.max_gain)

        def step(g, xn):
            yn = xn * g
            g2 = g + rate * (ref - jnp.abs(yn))
            if self.max_gain > 0:
                g2 = jnp.minimum(g2, mg)
            return g2, yn

        g, y = jax.lax.scan(step, state, x)
        return g, y

    def steady_gain(self):
        return self.gain0


def agc_cc(rate=1e-4, reference=1.0, gain=1.0, max_gain=0.0):
    return Agc(rate, reference, gain, max_gain, True)


def agc_ff(rate=1e-4, reference=1.0, gain=1.0, max_gain=0.0):
    return Agc(rate, reference, gain, max_gain, False)


class Agc2(SyncBlock):
    """agc2_cc/ff: separate attack/decay rates picked by whether |out|
    exceeds the reference (include/gnuradio/analog/agc2.h)."""

    def __init__(self, attack_rate=1e-1, decay_rate=1e-2, reference=1.0,
                 gain=1.0, max_gain=0.0, complex_in=True, name=None):
        p = PortSpec(C if complex_in else F)
        super().__init__(p, p, name)
        self.attack = float(attack_rate)
        self.decay = float(decay_rate)
        self.reference = float(reference)
        self.gain0 = float(gain)
        self.max_gain = float(max_gain)

    def init_state(self):
        return jnp.asarray(self.gain0, jnp.float32)

    def work(self, state, x):
        att = jnp.float32(self.attack)
        dec = jnp.float32(self.decay)
        ref = jnp.float32(self.reference)
        mg = jnp.float32(self.max_gain)

        def step(g, xn):
            yn = xn * g
            err = ref - jnp.abs(yn)
            rate = jnp.where(jnp.abs(yn) > ref, att, dec)
            g2 = g + rate * err
            if self.max_gain > 0:
                g2 = jnp.minimum(g2, mg)
            return g2, yn

        g, y = jax.lax.scan(step, state, x)
        return g, y


def agc2_cc(attack_rate=1e-1, decay_rate=1e-2, reference=1.0, gain=1.0,
            max_gain=0.0):
    return Agc2(attack_rate, decay_rate, reference, gain, max_gain, True)


def agc2_ff(attack_rate=1e-1, decay_rate=1e-2, reference=1.0, gain=1.0,
            max_gain=0.0):
    return Agc2(attack_rate, decay_rate, reference, gain, max_gain, False)


class Rail(SyncBlock):
    """rail_ff: clip to [lo, hi]."""

    def __init__(self, lo, hi, name=None):
        super().__init__(PortSpec(F), PortSpec(F), name)
        self.lo, self.hi = float(lo), float(hi)

    def work(self, state, x):
        return state, jnp.clip(x, self.lo, self.hi)


def rail_ff(lo, hi):
    return Rail(lo, hi)


def fm_deemph(fs: float, tau: float = 75e-6) -> IirFilter:
    """FM deemphasis one-pole IIR via bilinear transform with prewarped
    corner (gr-analog/python/analog/fm_emph.py:40-80)."""
    w_c = 1.0 / tau
    w_ca = 2.0 * fs * math.tan(w_c / (2.0 * fs))  # prewarp
    k = -w_ca / (2.0 * fs)
    z1 = -1.0
    p1 = (1.0 + k) / (1.0 - k)
    b0 = -k / (1.0 - k)
    btaps = [b0 * 1.0, b0 * -z1]
    ataps = [1.0, -p1]
    return IirFilter(btaps, ataps, oldstyle=False, in_complex=False)


def fm_preemph(fs: float, tau: float = 75e-6, fh: float = -1.0) -> IirFilter:
    """FM preemphasis (fm_emph.py preemph class): one-zero/one-pole highpass
    shelf with upper corner fh (defaults to 0.925*fs/2)."""
    if fh <= 0.0 or fh > fs / 2.0:
        fh = 0.925 * fs / 2.0
    ca = 2.0 * fs * math.tan(math.pi * fh / fs)
    cl = 1.0 / tau
    k0 = ca / fs
    k1 = cl / fs
    k2 = cl / ca
    z1 = (2.0 - k1) / (2.0 + k1)
    p1 = (2.0 - k0) / (2.0 + k0)
    b0 = (2.0 + k0) / (2.0 + k1)
    btaps = [b0 * 1.0, b0 * -z1]
    ataps = [1.0, -p1]
    return IirFilter(btaps, ataps, oldstyle=False, in_complex=False)
