"""gr-channels RF impairment blocks (the python hier demos in
gr-channels/python/channels/: amp_bal.py, phase_bal.py, iqbal_gen.py,
distortion_2_gen.py, distortion_3_gen.py, phase_noise_gen.py,
impairments.py) — re-expressed as direct functional SyncBlocks. Each
docstring states the closed form derived from the reference hier's block
graph; QA (tests/test_impairments.py) checks against literal NumPy
transcriptions of those graphs."""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core.block import SyncBlock
from ..core.stream import PortSpec, C, F
from .iir_core import first_order_iir


def _one_pole(x, state, alpha):
    """single_pole_iir_filter_ff: y[n] = alpha*x[n] + (1-alpha)*y[n-1]
    (gr-filter single_pole_iir.h). Returns (y, new_state)."""
    y, carry = first_order_iir(x, jnp.float32(alpha), jnp.float32(1 - alpha),
                               state)
    return y, carry


class AmpBal(SyncBlock):
    """channels.amp_bal(alpha): rebalance I/Q amplitudes —
    out = re + j * im * rms(re)/rms(im), with rms_ff's single-pole
    mean-square tracker (amp_bal.py block graph)."""

    def __init__(self, alpha: float = 0.0, name=None):
        super().__init__(PortSpec(C), PortSpec(C), name)
        self.alpha = float(alpha)

    def init_state(self):
        return {"ms_re": jnp.zeros((), F), "ms_im": jnp.zeros((), F)}

    def work(self, state, x):
        a = self.alpha
        re, im = jnp.real(x), jnp.imag(x)
        ms_re, c_re = _one_pole(re * re, state["ms_re"], a)
        ms_im, c_im = _one_pole(im * im, state["ms_im"], a)
        ratio = jnp.sqrt(ms_re) / jnp.maximum(jnp.sqrt(ms_im), 1e-20)
        y = jax.lax.complex(re, im * ratio)
        return {"ms_re": c_re, "ms_im": c_im}, y.astype(C)


class PhaseBal(SyncBlock):
    """channels.phase_bal(alpha): quadrature-error compensation —
    d = one_pole(2*re*im / |z|^2, alpha); out = (re - d*im) + j(im - d*re)
    (phase_bal.py block graph)."""

    def __init__(self, alpha: float = 0.0, name=None):
        super().__init__(PortSpec(C), PortSpec(C), name)
        self.alpha = float(alpha)

    def init_state(self):
        return jnp.zeros((), F)

    def work(self, state, x):
        re, im = jnp.real(x), jnp.imag(x)
        mag2 = jnp.maximum(re * re + im * im, 1e-20)
        d, carry = _one_pole(2.0 * re * im / mag2, state, self.alpha)
        y = jax.lax.complex(re - d * im, im - d * re)
        return carry, y.astype(C)


class IqBalGen(SyncBlock):
    """channels.iqbal_gen(magnitude, phase, mode): IQ imbalance injector
    (iqbal_gen.py, after Schenk "RF Imperfections"). mode 0 = TX:
    out = g*(re*cos + im*sin) + j*im; mode 1 = RX: m = g*re,
    out = m*cos + j*(m*sin + im); g = 10^(mag/20), angles in degrees."""

    def __init__(self, magnitude: float = 0.0, phase: float = 0.0,
                 mode: int = 0, name=None):
        super().__init__(PortSpec(C), PortSpec(C), name)
        self.g = 10.0 ** (float(magnitude) / 20.0)
        self.cosp = math.cos(math.pi * float(phase) / 180.0)
        self.sinp = math.sin(math.pi * float(phase) / 180.0)
        self.mode = int(mode)

    def work(self, state, x):
        re, im = jnp.real(x), jnp.imag(x)
        if self.mode == 0:      # TX impairment
            y = jax.lax.complex(self.g * (re * self.cosp + im * self.sinp),
                                im)
        else:                   # RX impairment
            m = self.g * re
            y = jax.lax.complex(m * self.cosp, m * self.sinp + im)
        return state, y.astype(C)


class Distortion2Gen(SyncBlock):
    """channels.distortion_2_gen(beta): second-order memoryless
    nonlinearity out = z + beta*(z^2 + z*conj(z)) (distortion_2_gen.py)."""

    def __init__(self, beta: float = 0.0, name=None):
        super().__init__(PortSpec(C), PortSpec(C), name)
        self.beta = float(beta)

    def work(self, state, x):
        return state, (x + self.beta * (x * x + x * jnp.conj(x))).astype(C)


class Distortion3Gen(SyncBlock):
    """channels.distortion_3_gen(beta): third-order memoryless
    nonlinearity out = z + beta*|z|^2*z (distortion_3_gen.py; the
    reference's float_to_complex(magsq, null) makes the factor the REAL
    scalar |z|^2)."""

    def __init__(self, beta: float = 0.0, name=None):
        super().__init__(PortSpec(C), PortSpec(C), name)
        self.beta = float(beta)

    def work(self, state, x):
        mag2 = jnp.real(x) ** 2 + jnp.imag(x) ** 2
        return state, (x + self.beta * mag2 * x).astype(C)


class PhaseNoiseGen(SyncBlock):
    """channels.phase_noise_gen(noise_mag, alpha): multiply by
    exp(j*one_pole(gauss(noise_mag), alpha)) (phase_noise_gen.py; the
    reference fixes seed 42)."""

    def __init__(self, noise_mag: float = 0.0, alpha: float = 0.1,
                 seed: int = 42, name=None):
        super().__init__(PortSpec(C), PortSpec(C), name)
        self.noise_mag = float(noise_mag)
        self.alpha = float(alpha)
        self.seed = int(seed)

    def init_state(self):
        return {"key": jax.random.key(self.seed), "iir": jnp.zeros((), F)}

    def work(self, state, x):
        key, sub = jax.random.split(state["key"])
        nz = jax.random.normal(sub, x.shape, F) * self.noise_mag
        ph, carry = _one_pole(nz, state["iir"], self.alpha)
        y = x * jnp.exp(1j * ph.astype(jnp.complex64))
        return {"key": key, "iir": carry}, y.astype(C)


class Impairments(SyncBlock):
    """channels.impairments(phase_noise_mag, magbal, phasebal, q_ofs,
    i_ofs, freq_offset, gamma, beta): the composite TX-impairment chain
    from impairments.py — mix down by freq_offset (conj LO), phase noise,
    3rd- then 2nd-order distortion, IQ imbalance, DC offset, mix back up.
    gamma feeds distortion_3, beta distortion_2, like the reference wiring.
    """

    def __init__(self, phase_noise_mag=0.0, magbal=0.0, phasebal=0.0,
                 q_ofs=0.0, i_ofs=0.0, freq_offset=0.0, gamma=0.0, beta=0.0,
                 name=None):
        super().__init__(PortSpec(C), PortSpec(C), name)
        self.pn = PhaseNoiseGen(phase_noise_mag, 0.1)
        self.d3 = Distortion3Gen(gamma)
        self.d2 = Distortion2Gen(beta)
        self.iq = IqBalGen(magbal, phasebal, mode=0)
        self.dc = complex(i_ofs, q_ofs)
        self.freq_offset = float(freq_offset)
        from . import fxpt
        self._delta = fxpt.float_to_fxpt(2 * math.pi * self.freq_offset)

    def init_state(self):
        return {"pn": self.pn.init_state(), "phase": jnp.zeros((), jnp.int32)}

    def work(self, state, x):
        from . import fxpt
        lo, nxt = fxpt.nco_sincos(state["phase"], jnp.int32(self._delta),
                                  x.shape[0])
        z = x * jnp.conj(lo)
        pn_s, z = self.pn.work(state["pn"], z)
        _, z = self.d3.work(None, z)
        _, z = self.d2.work(None, z)
        _, z = self.iq.work(None, z)
        z = z + self.dc
        z = z * lo
        return {"pn": pn_s, "phase": nxt}, z.astype(C)


def amp_bal(alpha=0.0):
    return AmpBal(alpha)


def phase_bal(alpha=0.0):
    return PhaseBal(alpha)


def iqbal_gen(magnitude=0.0, phase=0.0, mode=0):
    return IqBalGen(magnitude, phase, mode)


def distortion_2_gen(beta=0.0):
    return Distortion2Gen(beta)


def distortion_3_gen(beta=0.0):
    return Distortion3Gen(beta)


def phase_noise_gen(noise_mag=0.0, alpha=0.1):
    return PhaseNoiseGen(noise_mag, alpha)


def impairments(phase_noise_mag=0.0, magbal=0.0, phasebal=0.0, q_ofs=0.0,
                i_ofs=0.0, freq_offset=0.0, gamma=0.0, beta=0.0):
    return Impairments(phase_noise_mag, magbal, phasebal, q_ofs, i_ofs,
                       freq_offset, gamma, beta)
