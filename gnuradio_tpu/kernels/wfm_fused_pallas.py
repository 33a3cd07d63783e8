"""Fused WBFM front end — one Pallas kernel for channel-select FIR + FM
discriminator (round-3 item #2).

The round-2 chain ran the complex-tap channel FIR as FOUR independent real
Pallas passes (kernels/fir_pallas.py complex path), then the NCO rotator and
the quadrature demod as separate XLA ops — every stage re-materializing
quad-rate intermediates in HBM (~7 ms of the 18.7 ms step). This kernel does
the whole front end in VMEM with one HBM read of the IQ planes and one write
of the quad-rate FM samples.

Key algebraic fusion — the rotator vanishes. The freq-xlating filter's
output rotator multiplies y[k] by r[k] = e^{-j w D k}
(gr-filter freq_xlating_fir_filter: composite band-shifted taps + output
phasor; rotator renorm gr-blocks/include/gnuradio/blocks/rotator.h:30-43).
The ONLY consumer of the rotated stream in the WBFM chain is
quadrature_demod, which forms z[k] = y'[k] * conj(y'[k-1]). Since
r[k] conj(r[k-1]) = e^{-j w D} is a CONSTANT,

    z[k] = y[k] conj(y[k-1]) * e^{-j w D}

— the per-sample rotator collapses into one constant complex factor, exact
(not an approximation), with zero phase-accumulator drift by construction.

Per grid step the kernel:
  1. streams `hop` new IQ samples (two f32 planes) into VMEM (+ next-block
     halo, the two-blocks idiom from fir_pallas.py),
  2. slices R overlapping frames per plane with static VMEM copies,
  3. runs TWO (R, L2) @ (L2, 4B) MXU dots (real/imag frame x the stacked
     [cur_r | cur_i | prev_r | prev_i] band-tap matrix) producing y[k] and
     y[k-1] for all R*B outputs,
  4. forms z = y conj(y_prev) * e^{-jwD} and the FM discriminator output
     gain * atan2(im z, re z) on the VPU (polynomial atan2, max err
     ~2e-7 rad — tighter than the reference's 257-entry fast_atan2f LUT,
     gnuradio-runtime/lib/math/fast_atan2f.cc:20-25).

Numerics: dots at HIGHEST precision (f32 MXU); QA compares against the
unfused chain (tests/test_wfm_fused.py).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_LANES = 128
_B = 128     # outputs per frame row (MXU lane dim)
_R = 32      # frame rows per grid step (MXU sublane dim)

# atan(t) = t * P(t^2) on t in [0, 1]: least-squares Chebyshev-node fit,
# degree 9 in t^2 -> max |err| ~= 2e-7 rad (checked in QA). Host-side
# numpy, computed once at import.
def _atan_poly_coeffs(deg: int = 9):
    k = np.arange(2048)
    s = (np.cos((2 * k + 1) * np.pi / (2 * len(k))) + 1) / 2  # cheb nodes (0,1)
    t = np.sqrt(s)
    f = np.where(t > 0, np.arctan(t) / np.where(t > 0, t, 1.0), 1.0)
    V = np.vander(s, deg + 1, increasing=True)
    c, *_ = np.linalg.lstsq(V, f, rcond=None)
    return c.astype(np.float32)

_ATAN_C = _atan_poly_coeffs()


def _atan2(y, x):
    """Vectorized polynomial atan2 (VPU-only: no transcendental ops)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    t = mn / jnp.maximum(mx, 1e-30)
    s = t * t
    p = jnp.full_like(t, float(_ATAN_C[-1]))
    for c in _ATAN_C[-2::-1]:
        p = p * s + float(c)
    r = t * p                                   # atan(t), t in [0,1]
    r = jnp.where(ay > ax, (np.pi / 2) - r, r)
    r = jnp.where(x < 0, np.pi - r, r)
    return jnp.where(y < 0, -r, r)


def _wfm_kernel(xar, xhr, xai, xhi, w_ref, o_ref, *, R, B, D, Lpad, gain,
                c0r, c0i):
    # two slimmed dots per plane over reshaped group views (see
    # kernels/fir_pallas.py _fir_kernel): no per-frame copies, second
    # contraction spans only the ceil-to-128 tap tail
    BD = B * D
    W = w_ref[...]                   # (Lpad, 4B): cur_r|cur_i|pr_r|pr_i
    E = Lpad - BD
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)

    def plane(xa, xh):
        g = jnp.concatenate([xa[...], xh[0]], axis=0).reshape(-1, BD)
        acc = dot(g[0:R], W[:BD])
        if E:
            acc = acc + dot(g[1:R + 1, :E], W[BD:])
        return acc

    Ar = plane(xar, xhr)                        # (R, 4B)
    Ai = plane(xai, xhi)
    # complex FIR with complex taps (tc = wr + j wi), complex data:
    #   y = (Fr + jFi) * (wr + j wi)
    ycr = Ar[:, 0 * B:1 * B] - Ai[:, 1 * B:2 * B]
    yci = Ar[:, 1 * B:2 * B] + Ai[:, 0 * B:1 * B]
    ypr = Ar[:, 2 * B:3 * B] - Ai[:, 3 * B:4 * B]
    ypi = Ar[:, 3 * B:4 * B] + Ai[:, 2 * B:3 * B]
    # z = y * conj(y_prev) * e^{-jwD}
    zr0 = ycr * ypr + yci * ypi
    zi0 = yci * ypr - ycr * ypi
    zr = zr0 * c0r - zi0 * c0i
    zi = zr0 * c0i + zi0 * c0r
    o_ref[...] = gain * _atan2(zi, zr)


@functools.partial(jax.jit,
                   static_argnames=("D", "n_out", "gain", "c0", "R",
                                    "interpret"))
def _wfm_front_pallas(xqr, xqi, W, D: int, n_out: int, gain: float,
                      c0: complex, R: int = _R, interpret: bool = False):
    """xqr/xqi: (T-1+D + n_in [+pad],) f32 planes with extended history
    prepended; W: (Lpad, 4B) stacked band-tap matrix; returns (n_out,) f32
    FM-discriminated quad-rate samples. n_out % (R*B) == 0 (caller pads)."""
    Lpad, B4 = W.shape
    B = B4 // 4
    BD = B * D
    hop = R * B * D
    steps = n_out // (R * B)
    halo = BD
    need = steps * hop + halo
    xqr = jnp.pad(xqr, (0, max(0, need - xqr.shape[0])))
    xqi = jnp.pad(xqi, (0, max(0, need - xqi.shape[0])))
    H = hop // _LANES
    Hh = halo // _LANES
    idx = (jnp.arange(steps)[:, None] * H + H + jnp.arange(Hh)[None, :])

    def prep(v):
        rows = v[: steps * hop + halo].reshape(-1, _LANES)
        return rows[: steps * H], rows[idx]

    x2r, xhr = prep(xqr)
    x2i, xhi = prep(xqi)

    out = pl.pallas_call(
        functools.partial(_wfm_kernel, R=R, B=B, D=D, Lpad=Lpad,
                          gain=float(gain), c0r=float(np.real(c0)),
                          c0i=float(np.imag(c0))),
        out_shape=jax.ShapeDtypeStruct((steps * R, B), jnp.float32),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((H, _LANES), lambda i: (i, 0)),
            pl.BlockSpec((1, Hh, _LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((H, _LANES), lambda i: (i, 0)),
            pl.BlockSpec((1, Hh, _LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((Lpad, B4), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((R, B), lambda i: (i, 0)),
        interpret=interpret,
    )(x2r, xhr, x2i, xhi, W)
    return out.reshape(-1)[:n_out]


def _wfm_kernel2(xar, xhr, xai, xhi, w_ref, y0_ref, o_ref, carry_ref, *,
                 R, B, D, Lpad, gain, c0r, c0i):
    """Half-contraction variant: computes ONLY y[k] with the MXU; y[k-1]
    is the same stream shifted one output, built by a lane/sublane shift
    with a (2, B) VMEM scratch row carried across grid steps (TPU grids
    execute sequentially per core; v5e is single-core so the carry is
    safe). Halves the dot work of _wfm_kernel (W has 2B columns, not 4B)."""
    BD = B * D
    W = w_ref[...]                   # (Lpad, 2B): [wr | wi]
    E = Lpad - BD
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)

    def plane(xa, xh):
        g = jnp.concatenate([xa[...], xh[0]], axis=0).reshape(-1, BD)
        acc = dot(g[0:R], W[:BD])
        if E:
            acc = acc + dot(g[1:R + 1, :E], W[BD:])
        return acc

    Ar = plane(xar, xhr)                        # (R, 2B): [Fr.wr | Fr.wi]
    Ai = plane(xai, xhi)
    ycr = Ar[:, :B] - Ai[:, B:]
    yci = Ar[:, B:] + Ai[:, :B]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        carry_ref[0, :] = y0_ref[0, :]          # y[-1] broadcast on lanes
        carry_ref[1, :] = y0_ref[1, :]

    prev_r_rows = jnp.concatenate([carry_ref[0:1, :], ycr[:-1]], axis=0)
    prev_i_rows = jnp.concatenate([carry_ref[1:2, :], yci[:-1]], axis=0)
    ypr = jnp.concatenate([prev_r_rows[:, B - 1:B], ycr[:, :B - 1]], axis=1)
    ypi = jnp.concatenate([prev_i_rows[:, B - 1:B], yci[:, :B - 1]], axis=1)
    carry_ref[0, :] = ycr[R - 1, :]
    carry_ref[1, :] = yci[R - 1, :]

    zr0 = ycr * ypr + yci * ypi
    zi0 = yci * ypr - ycr * ypi
    zr = zr0 * c0r - zi0 * c0i
    zi = zr0 * c0i + zi0 * c0r
    o_ref[...] = gain * _atan2(zi, zr)


@functools.partial(jax.jit,
                   static_argnames=("D", "n_out", "gain", "c0", "R",
                                    "interpret"))
def _wfm_front_pallas2(xqr, xqi, W, D: int, n_out: int, gain: float,
                       c0: complex, R: int = _R, interpret: bool = False):
    """Half-contraction front: xqr/xqi carry (T-1+D) history; frames are
    sliced from offset D (the y[k] alignment), y[k-1] comes from the
    in-kernel shifted stream. W: (Lpad, 2B) unshifted band-tap matrix."""
    from jax.experimental.pallas import tpu as pltpu
    Lpad, B2 = W.shape
    B = B2 // 2
    BD = B * D
    hop = R * B * D
    steps = n_out // (R * B)
    halo = BD
    need = D + steps * hop + halo
    xqr = jnp.pad(xqr, (0, max(0, need - xqr.shape[0])))
    xqi = jnp.pad(xqi, (0, max(0, need - xqi.shape[0])))
    # y[-1]: dot of the last history window (host-XLA side, tiny)
    T = Lpad  # only the first T rows of W are nonzero; dot over Lpad is fine
    wcol_r = W[:, 0]          # wr padded to Lpad (first col pattern: b=0)
    wcol_i = W[:, B]
    y0r = jnp.dot(xqr[:Lpad], wcol_r) - jnp.dot(xqi[:Lpad], wcol_i)
    y0i = jnp.dot(xqr[:Lpad], wcol_i) + jnp.dot(xqi[:Lpad], wcol_r)
    y0 = jnp.stack([jnp.full((_LANES,), 1.0, jnp.float32) * y0r,
                    jnp.full((_LANES,), 1.0, jnp.float32) * y0i])

    H = hop // _LANES
    Hh = halo // _LANES
    idx = (jnp.arange(steps)[:, None] * H + H + jnp.arange(Hh)[None, :])

    def prep(v):
        rows = v[D: D + steps * hop + halo].reshape(-1, _LANES)
        return rows[: steps * H], rows[idx]

    x2r, xhr = prep(xqr)
    x2i, xhi = prep(xqi)

    out = pl.pallas_call(
        functools.partial(_wfm_kernel2, R=R, B=B, D=D, Lpad=Lpad,
                          gain=float(gain), c0r=float(np.real(c0)),
                          c0i=float(np.imag(c0))),
        out_shape=jax.ShapeDtypeStruct((steps * R, B), jnp.float32),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((H, _LANES), lambda i: (i, 0)),
            pl.BlockSpec((1, Hh, _LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((H, _LANES), lambda i: (i, 0)),
            pl.BlockSpec((1, Hh, _LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((Lpad, B2), lambda i: (0, 0)),
            pl.BlockSpec((2, _LANES), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((R, B), lambda i: (i, 0)),
        scratch_shapes=[pltpu.VMEM((2, B), jnp.float32)],
        interpret=interpret,
    )(x2r, xhr, x2i, xhi, W, y0)
    return out.reshape(-1)[:n_out]


class WfmFrontFused:
    """Channel-select complex-tap FIR (decim D) + quadrature demod, fused.

    Matches FreqXlatingFirFilter(D, taps, fc, fs) -> QuadratureDemod(gain)
    exactly up to f32 rounding (the rotator collapses into e^{-jwD}, see
    module docstring). Call convention mirrors kernels.fir_xla.fir_apply:
    the input carries (T-1+D) history samples prepended (zeros at stream
    start); out[k] corresponds to demod of outputs k and k-1."""

    def __init__(self, taps, center_freq: float, samp_rate: float,
                 decim: int, gain: float, R: int = _R, kernel: str = "v2"):
        base = np.asarray(taps, np.float64)
        self.T = len(base)
        self.D = int(decim)
        self.kernel = kernel
        w = 2 * np.pi * center_freq / samp_rate
        ctaps = base * np.exp(1j * w * np.arange(self.T))
        wr = ctaps[::-1]                       # reversed (conv form)
        D = self.D
        B = _B
        from .fir_pallas import _band_matrix
        if kernel == "v2":
            # v2 computes only y[k] (frames sliced from offset D);
            # y[k-1] is the shifted stream with a VMEM carry — W needs
            # just the unshifted tap family: (Lpad, 2B)
            mats = [_band_matrix(v.astype(np.float32), B, D)
                    for v in (wr.real, wr.imag)]
        else:
            # y[k]   = sum_t w[t] xq[kD + D + t]  -> taps shifted D (cur)
            # y[k-1] = sum_t w[t] xq[kD + t]      -> unshifted (prev)
            w_cur_r = np.concatenate([np.zeros(D), wr.real])
            w_cur_i = np.concatenate([np.zeros(D), wr.imag])
            mats = [_band_matrix(v.astype(np.float32), B, D)
                    for v in (w_cur_r, w_cur_i, wr.real, wr.imag)]
        Lpad = max(m.shape[0] for m in mats)

        def padl(Wm):
            if Wm.shape[0] < Lpad:
                Wm = np.concatenate(
                    [Wm, np.zeros((Lpad - Wm.shape[0], Wm.shape[1]),
                                  np.float32)])
            return Wm

        self.W = np.concatenate([padl(m) for m in mats],
                                axis=1)          # (Lpad, 4B) or (Lpad, 2B)
        self.c0 = complex(np.exp(-1j * w * D))
        self.gain = float(gain)
        self.R = int(R)   # frame rows per grid step (VMEM vs grid overhead)
        self.history = self.T - 1 + self.D

    def __call__(self, xr, xi, interpret: bool = False):
        """xr/xi: (history + n_in,) f32 — separate contiguous I/Q planes
        with history prepended (channel-major: an (n,2) interleaved layout
        tiles terribly on TPU — minor dim 2 of a (8,128) tile).
        Returns (n_in // D,) f32 demodulated quad-rate stream."""
        n_in = xr.shape[0] - self.history
        n_out = n_in // self.D
        n_pad = -(-n_out // (self.R * _B)) * (self.R * _B)
        fn = _wfm_front_pallas2 if self.kernel == "v2" else _wfm_front_pallas
        y = fn(xr, xi, jnp.asarray(self.W), self.D, n_pad,
               self.gain, self.c0, self.R, interpret)
        return y[:n_out]
