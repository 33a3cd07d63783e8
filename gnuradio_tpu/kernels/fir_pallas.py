"""Pallas FIR-decimate kernel — VMEM framing, zero HBM intermediates.

The XLA banded-matmul path (kernels/fir_xla.py) materializes the overlapped
frame matrix F (M, L) in HBM before the dot: for the WBFM channel filter
that is ~2.4x the input size written + read back per part. This kernel
builds the frames IN VMEM instead: each grid step streams `hop` new input
samples into VMEM (plus the left halo from the neighboring block), slices R
overlapping frames with static VMEM copies, and runs one (R, L) @ (L, B)
MXU dot per step. HBM traffic drops to x read (~2x for the halo block) +
y write.

Overlap trick: BlockSpec index maps cannot express overlapping windows, so
the input is passed TWICE with 2-D blocks at consecutive block rows; the
kernel concatenates them and slices the halo it needs — standard Pallas
halo idiom.

Numerics: frames dot taps in f32 with preferred_element_type=f32 on the
MXU (same contraction as lax.dot_general(precision=HIGHEST) per tile up to
reassociation); validated against the XLA path in QA (interpret mode) and
on-chip.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_ROWS = 32  # frames per grid step (MXU sublane utilization vs VMEM size)


def _fir_kernel(xa_ref, xb_ref, w_ref, o_ref, *, R, B, decim, L, hop):
    # xa: this step's hop samples (rows, 128); xb: the NEXT block (halo)
    xflat = jnp.concatenate([xa_ref[...].reshape(-1),
                             xb_ref[...].reshape(-1)])
    # frame m = xflat[m*B*decim : m*B*decim + L]
    F = jnp.stack([xflat[m * B * decim: m * B * decim + L]
                   for m in range(R)])              # (R, L) VMEM copies
    o_ref[...] = jax.lax.dot_general(
        F, w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,   # true-f32 MXU accumulation;
        preferred_element_type=jnp.float32)    # default bf16 passes lose
                                               # ~1e-3 rel vs the XLA path


@functools.partial(jax.jit, static_argnames=("decim", "n_out", "interpret"))
def _fir_pallas_real(xp, W, decim: int, n_out: int, interpret: bool = False):
    """xp: (n_in + T - 1,) f32; W: (L, B) banded tap matrix; returns
    (n_out,) f32. Requires n_out % (R*B) == 0 (caller pads)."""
    L, B = W.shape
    R = _ROWS
    hop = R * B * decim
    steps = n_out // (R * B)
    # xp padded so every (hop + halo) window is in range; halo block needs
    # hop more samples past the end
    need = steps * hop + hop
    xp = jnp.pad(xp, (0, max(0, need - xp.shape[0])))
    x2 = xp[: steps * hop + hop].reshape(-1, _LANES)  # (rows, 128)
    rows_per_block = hop // _LANES

    out = pl.pallas_call(
        functools.partial(_fir_kernel, R=R, B=B, decim=decim, L=L, hop=hop),
        out_shape=jax.ShapeDtypeStruct((steps * R, B), jnp.float32),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((rows_per_block, _LANES), lambda i: (i, 0)),
            pl.BlockSpec((rows_per_block, _LANES), lambda i: (i + 1, 0)),
            pl.BlockSpec((L, B), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((R, B), lambda i: (i, 0)),
        interpret=interpret,
    )(x2, x2, W)
    return out.reshape(-1)[:n_out]


def fir_apply_pallas(xp, taps, decim: int = 1, interpret: bool = False):
    """Drop-in for kernels.fir_xla.fir_apply on TPU (same convention:
    history prepended, y[k] = sum_j taps[j] * xp[(T-1) + k*decim - j])."""
    taps = np.asarray(taps)  # taps must be CONCRETE (band matrix on host)
    T = taps.shape[0]
    n_out = (xp.shape[0] - (T - 1)) // decim
    w = taps[::-1]
    B = _LANES * max(1, -(-T // (_LANES * decim)))
    L = (B - 1) * decim + T
    x_c = jnp.iscomplexobj(xp)
    t_c = np.iscomplexobj(taps)
    n_pad = -(-n_out // (_ROWS * B)) * (_ROWS * B)

    def run_real(v, wr):
        # band matrix built in pure numpy (taps are concrete; jnp constants
        # become tracers under an outer jit and break host-side prep)
        Wm = np.zeros((L, B), np.float32)
        for b in range(B):
            Wm[b * decim:b * decim + T, b] = np.asarray(wr, np.float32)
        return _fir_pallas_real(v.astype(jnp.float32), jnp.asarray(Wm),
                                decim, n_pad, interpret)[:n_out]

    if not x_c and not t_c:
        return run_real(xp, w)
    if x_c and not t_c:
        yr = run_real(xp.real, w)
        yi = run_real(xp.imag, w)
        return jax.lax.complex(yr, yi)
    if x_c and t_c:
        yrr = run_real(xp.real, w.real)
        yri = run_real(xp.imag, w.real)
        yir = run_real(xp.real, w.imag)
        yii = run_real(xp.imag, w.imag)
        return jax.lax.complex(yrr - yii, yir + yri)
    yr = run_real(xp, w.real)
    yi = run_real(xp, w.imag)
    return jax.lax.complex(yr, yi)
