"""gr-channels analog: channel impairment simulators for loopback QA.

Reference parity map (SURVEY.md §2.2 gr-channels row):
  channel_model  (gr-channels/lib/channel_model_impl.h:29-57 — composition
      of multipath FIR + frequency-offset rotator + AWGN adder)
  cfo_model      (lib/cfo_model_impl.cc — frequency offset w/ optional noise)
  sro_model      (lib/sro_model_impl.cc — sample-rate offset via fractional
      resampler; here: exact closed-form arb resampling like ops/pfb.py)
  fading_model   (lib/flat_fader_impl.cc — sum-of-sinusoids (Jakes) flat
      Rayleigh/Rician fader)
  selective_fading_model (lib/selective_fading_model_impl.cc — tapped delay
      line of flat faders)

All simulators are vectorized over the chunk: the fader's sinusoid bank is
evaluated at absolute sample times (int64 carried offset), so there is no
per-sample recurrence anywhere — chunk-size invariant by construction.
"""
from __future__ import annotations

import math
from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

from ..core.block import SyncBlock
from ..core.stream import PortSpec, C, F
from ..kernels.fir_xla import fir_apply
from . import fxpt


class ChannelModel(SyncBlock):
    """channel_model: y = fir(x, taps) * e^{j 2 pi f_off n} + sigma * awgn
    (gr-channels/lib/channel_model_impl.cc composition; epsilon (timing sro)
    of the reference is provided separately by SroModel)."""

    def __init__(self, noise_voltage=0.0, frequency_offset=0.0, epsilon=1.0,
                 taps=(1.0 + 0j,), noise_seed=0, block_tags=False, name=None):
        super().__init__(PortSpec(C), PortSpec(C), name)
        if float(epsilon) != 1.0:
            raise NotImplementedError("epsilon != 1: compose with SroModel")
        self.noise_v = float(noise_voltage)
        self.taps = np.asarray(taps, np.complex64)
        # frequency_offset is normalized (cycles/sample) like the reference
        self._delta = fxpt.float_to_fxpt(2 * math.pi * float(frequency_offset))
        self.seed = int(noise_seed)

    def init_state(self):
        return {"tail": jnp.zeros((len(self.taps) - 1,), C),
                "phase": jnp.zeros((), jnp.int32),
                "key": jax.random.PRNGKey(self.seed)}

    def work(self, state, x):
        n = x.shape[0]
        xp = jnp.concatenate([state["tail"], x], axis=0)
        tail = (xp[xp.shape[0] - (len(self.taps) - 1):]
                if len(self.taps) > 1 else state["tail"])
        y = fir_apply(xp, jnp.asarray(self.taps), 1) if len(self.taps) > 1 \
            else x * jnp.asarray(self.taps[0])
        rot, nxt = fxpt.nco_sincos(state["phase"], jnp.int32(self._delta), n)
        y = y * rot
        key = state["key"]
        if self.noise_v > 0:
            key, sub = jax.random.split(key)
            nr = jax.random.normal(sub, (n, 2), jnp.float32)
            y = y + self.noise_v * jax.lax.complex(nr[:, 0], nr[:, 1])
        return {"tail": tail, "phase": nxt, "key": key}, y.astype(C)


def channel_model(noise_voltage=0.0, frequency_offset=0.0, epsilon=1.0,
                  taps=(1.0 + 0j,), noise_seed=0, block_tags=False):
    return ChannelModel(noise_voltage, frequency_offset, epsilon, taps,
                        noise_seed, block_tags)


class CfoModel(SyncBlock):
    """cfo_model: pure carrier frequency offset with optional random walk
    (reference adds filtered noise to the CFO; std_dev_hz of the reference
    maps to a per-chunk gaussian perturbation here)."""

    def __init__(self, sample_rate_hz, std_dev_hz, max_dev_hz, noise_seed=0,
                 name=None):
        super().__init__(PortSpec(C), PortSpec(C), name)
        self.fs = float(sample_rate_hz)
        self.std = float(std_dev_hz)
        self.max_dev = float(max_dev_hz)
        self.seed = int(noise_seed)

    def init_state(self):
        return {"phase": jnp.zeros((), F), "freq": jnp.zeros((), F),
                "key": jax.random.PRNGKey(self.seed)}

    def work(self, state, x):
        n = x.shape[0]
        key, sub = jax.random.split(state["key"])
        dfreq = self.std * jax.random.normal(sub, (), jnp.float32)
        freq = jnp.clip(state["freq"] + dfreq, -self.max_dev, self.max_dev)
        w = 2 * math.pi * freq / self.fs
        ph = state["phase"] + w * jnp.arange(n, dtype=F)
        y = x * jnp.exp(1j * ph).astype(C)
        return {"phase": jnp.mod(state["phase"] + w * n, 2 * math.pi),
                "freq": freq, "key": key}, y


class SroModel(SyncBlock):
    """sro_model: sample-rate offset — resample by 1+eps using the same
    closed-form fractional indexing as the arb resampler (linear interp
    between adjacent samples, matching the reference's mmse resampler to
    first order). Output rate == input rate (stream stays sync); the drift
    accumulates in the carried fractional position."""

    def __init__(self, sample_rate_hz=1.0, std_dev_hz=0.0, max_dev_hz=0.0,
                 epsilon=1.0000, noise_seed=0, name=None):
        super().__init__(PortSpec(C), PortSpec(C), name)
        self.eps = float(epsilon)

    def init_state(self):
        return {"tail": jnp.zeros((4,), C), "pos": jnp.float32(0.0)}

    def work(self, state, x):
        n = x.shape[0]
        xp = jnp.concatenate([state["tail"], x], axis=0)
        k = jnp.arange(n, dtype=jnp.float32)
        pos = state["pos"] + k * jnp.float32(self.eps)
        i0 = jnp.floor(pos).astype(jnp.int32)
        frac = pos - jnp.floor(pos)
        a = xp[i0 + 3]  # +3: tail offset - 1
        b = xp[i0 + 4]
        y = a + (b - a) * frac.astype(F)
        end = state["pos"] + n * jnp.float32(self.eps)
        new_pos = end - jnp.floor(end) + (jnp.floor(end) - n)  # relative drift
        # clamp drift into tail capacity (4 samples) — epsilon near 1
        new_pos = jnp.clip(new_pos, -3.0, 3.0)
        return {"tail": xp[xp.shape[0] - 4:], "pos": new_pos}, y.astype(C)


class FadingModel(SyncBlock):
    """fading_model: flat Rayleigh/Rician fader via sum-of-sinusoids
    (gr-channels/lib/flat_fader_impl.cc, N sinusoids, normalized doppler
    fDTs). Evaluated at absolute sample times — no recurrence."""

    def __init__(self, N: int = 8, fDTs: float = 0.01, LOS: bool = False,
                 K: float = 4.0, seed: int = 0, name=None):
        super().__init__(PortSpec(C), PortSpec(C), name)
        self.N = int(N)
        self.fDTs = float(fDTs)
        self.LOS = bool(LOS)
        self.K = float(K)
        rng = np.random.default_rng(seed)
        # angle-of-arrival and phases per sinusoid (flat_fader ctor)
        self.alpha = ((2 * np.pi * np.arange(1, N + 1) - np.pi + rng.uniform(
            -np.pi, np.pi, N)) / (4 * N)).astype(np.float32)
        self.phi = rng.uniform(-np.pi, np.pi, N).astype(np.float32)
        self.psi = rng.uniform(-np.pi, np.pi, N).astype(np.float32)
        self.theta_los = float(rng.uniform(-np.pi, np.pi))

    def init_state(self):
        return jnp.zeros((), jnp.int32)  # absolute sample counter (wraps)

    def gains(self, t0, n):
        """Complex fading gain h[t] for t = t0..t0+n-1 (vectorized)."""
        t = (t0 + jnp.arange(n)).astype(jnp.float32)
        doppler = 2 * math.pi * self.fDTs
        cos_a = jnp.asarray(np.cos(self.alpha))
        arg = doppler * cos_a[None, :] * t[:, None]
        re = jnp.sum(jnp.cos(arg + jnp.asarray(self.phi)[None, :]), axis=1)
        im = jnp.sum(jnp.sin(arg + jnp.asarray(self.psi)[None, :]), axis=1)
        h = (re + 1j * im) / math.sqrt(self.N)
        if self.LOS:
            los = jnp.exp(1j * (doppler * t + self.theta_los))
            h = (h + jnp.sqrt(self.K) * los) / math.sqrt(1 + self.K)
        return h.astype(C)

    def work(self, state, x):
        h = self.gains(state, x.shape[0])
        return state + x.shape[0], (x * h).astype(C)


def fading_model(N=8, fDTs=0.01, LOS=False, K=4.0, seed=0):
    return FadingModel(N, fDTs, LOS, K, seed)


class SelectiveFadingModel(SyncBlock):
    """selective_fading_model: tapped delay line of independent flat faders
    at integer-ish delays with a power-delay profile
    (gr-channels/lib/selective_fading_model_impl.cc)."""

    def __init__(self, N=8, fDTs=0.01, LOS=False, K=4.0, seed=0,
                 delays=(0.0, 1.0, 2.0), mags=(1.0, 0.5, 0.25),
                 ntaps: int = 8, name=None):
        super().__init__(PortSpec(C), PortSpec(C), name)
        assert len(delays) == len(mags)
        self.delays = np.asarray(delays, np.float32)
        self.mags = np.asarray(mags, np.float32)
        self.ntaps = int(max(ntaps, int(np.ceil(max(delays))) + 2))
        self.faders = [FadingModel(N, fDTs, LOS, K, seed + 17 * i)
                       for i in range(len(delays))]

    def init_state(self):
        return {"t": jnp.zeros((), jnp.int32),
                "tail": jnp.zeros((self.ntaps - 1,), C)}

    def work(self, state, x):
        n = x.shape[0]
        xp = jnp.concatenate([state["tail"], x], axis=0)
        tail = xp[xp.shape[0] - (self.ntaps - 1):]
        # windowed-sinc fractional-delay taps per path (impl.cc uses
        # sinc-interpolated taps into an ntaps FIR)
        y = jnp.zeros(n, C)
        for k, fader in enumerate(self.faders):
            h = fader.gains(state["t"], n) * self.mags[k]
            d = float(self.delays[k])
            taps = np.sinc(np.arange(self.ntaps) - d).astype(np.float32)
            path = fir_apply(xp, jnp.asarray(taps[::-1].copy()), 1)
            y = y + path * h
        return {"t": state["t"] + n, "tail": tail}, y.astype(C)


def selective_fading_model(N=8, fDTs=0.01, LOS=False, K=4.0, seed=0,
                           delays=(0.0, 1.0, 2.0), mags=(1.0, 0.5, 0.25),
                           ntaps=8):
    return SelectiveFadingModel(N, fDTs, LOS, K, seed, delays, mags, ntaps)
