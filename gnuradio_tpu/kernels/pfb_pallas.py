"""Fused Pallas PFB channelizer: polyphase arm filter + DFT in ONE kernel
pass (round-4 VERDICT item #3 — apply the WBFM fused-kernel playbook to
BASELINE config #2).

Key layout insight: in the NATURAL commutator layout S[t, i] = x[t*M + i]
(one reshape, no transpose), arm m = M-1-i lives in COLUMN i, so

    V[t, i] = sum_l h[M-1-i, l] * S[t-l, i]        (arm conv)
    y[t, c] = sum_i E[c, M-1-i] * V[t, i]          (M * IFFT across arms)

— the arm convolution is an L-term shifted multiply-accumulate along the
SUBLANE axis (VPU, no relayout: each term is a static VMEM slice times a
broadcast tap row), and the DFT is one (T_b, M) @ (M, C) MXU matmul per
plane combination. The unfused XLA chain materializes the arm-view
transpose, the conv output, and the IFFT output in HBM (3+ passes of
~33 MB each for the 64ch/4M-sample config); this kernel reads the input
slab once and writes the channelized output once.

Output stays in the natural (T, C) layout (complex as two f32 planes);
the arb resampler consumes it with frames along t built from flat shifted
reshapes, so the whole config has no transpose anywhere. Overlapping
reads use the halo-operand idiom from kernels/fir_pallas.py (a gathered
(G, L, M) rows array blocked per grid step).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_LANES = 128


def _chan_kernel(h0_r, xa_r, h0_i, xa_i, h_ref, er_ref, ei_ref,
                 or_ref, oi_ref, cr_ref, ci_ref, *, TB, L, M):
    """Halo rides a VMEM scratch carried across the SEQUENTIAL grid (TPU
    grids execute in order per core; v5e is single-core — the same carry
    argument as kernels/wfm_fused_pallas._wfm_kernel2). Grid step g=0
    seeds the carry from the history operand; every step leaves its last
    L rows for the next."""
    @pl.when(pl.program_id(0) == 0)
    def _init():
        cr_ref[...] = h0_r[0]
        ci_ref[...] = h0_i[0]

    Sr = jnp.concatenate([cr_ref[...], xa_r[...]], axis=0)  # (L + TB, M)
    Si = jnp.concatenate([ci_ref[...], xa_i[...]], axis=0)
    cr_ref[...] = Sr[TB: TB + L, :]
    ci_ref[...] = Si[TB: TB + L, :]
    H = h_ref[...]                                       # (L, M)
    accr = jnp.zeros((TB, M), jnp.float32)
    acci = jnp.zeros((TB, M), jnp.float32)
    # lag decomposition l = 8a + b: only the 8 b-shifts need sublane
    # rotates (one materialized shifted copy each); the a-offsets are
    # multiples of the (8, 128) tile row — free static slices. A naive
    # 37-term shifted MAC paid one sublane rotate per lag.
    A = -(-L // 8)
    span = 8 * (A - 1) + TB
    for b in range(8):
        if b >= L:
            break
        Srb = Sr[b: b + span, :]
        Sib = Si[b: b + span, :]
        for a in range(A):
            l = 8 * a + b
            if l >= L:
                break
            hrow = H[l, :][None, :]
            accr = accr + Srb[8 * a: 8 * a + TB, :] * hrow
            acci = acci + Sib[8 * a: 8 * a + TB, :] * hrow
    Er = er_ref[...]                                     # (M, C)
    Ei = ei_ref[...]
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    or_ref[...] = dot(accr, Er) - dot(acci, Ei)
    oi_ref[...] = dot(accr, Ei) + dot(acci, Er)


def _chan_kernel_dense(h0_r, xa_r, h0_i, xa_i, w2r_ref, w2i_ref,
                       or_ref, oi_ref, cr_ref, ci_ref, *, TB, L, M):
    """Dense variant: the L-lag frame tensor F (TB, L*M) contracts with
    the COMBINED conv+DFT weights W2[(l, i), c] = H[l, i] * E2[i, c] in
    one MXU dot per plane pair. Densifying overcomputes C x M work
    (79 GFLOP for the 64ch/4M config) but the MXU eats it at ~0.9 ms
    where the (TB, 64) half-lane VPU MAC of the shifted-accumulate
    variant measured ~3.4 ms."""
    @pl.when(pl.program_id(0) == 0)
    def _init():
        cr_ref[...] = h0_r[0]
        ci_ref[...] = h0_i[0]

    Sr = jnp.concatenate([cr_ref[...], xa_r[...]], axis=0)  # (L + TB, M)
    Si = jnp.concatenate([ci_ref[...], xa_i[...]], axis=0)
    cr_ref[...] = Sr[TB: TB + L, :]
    ci_ref[...] = Si[TB: TB + L, :]
    W2r = w2r_ref[...].reshape(L, M, -1)                 # (L, M, C)
    W2i = w2i_ref[...].reshape(L, M, -1)
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    accr = jnp.zeros((TB, W2r.shape[2]), jnp.float32)
    acci = jnp.zeros((TB, W2r.shape[2]), jnp.float32)
    for l in range(L):
        Sl_r = Sr[l: l + TB, :]
        Sl_i = Si[l: l + TB, :]
        accr = accr + dot(Sl_r, W2r[l]) - dot(Sl_i, W2i[l])
        acci = acci + dot(Sl_r, W2i[l]) + dot(Sl_i, W2r[l])
    or_ref[...] = accr
    oi_ref[...] = acci


@functools.partial(jax.jit, static_argnames=("M", "L", "TB", "interpret",
                                             "dense"))
def pfb_channelize_fused(xr, xi, H, Er, Ei, M: int, L: int, TB: int = 512,
                         interpret: bool = False, dense: bool = False):
    """xr/xi: (L*M - 1 + n,) f32 planes with L*M - 1 history samples
    prepended (the PfbChannelizer state convention; zeros at stream
    start); H: (L, M) with H[l, i] = arms[M-1-i, L-1-l] (pre-flipped so
    kernel slice offset l pairs with tap row l); Er/Ei: (M, C) with
    Er[i, c] + j Ei[i, c] = e^{+2j pi c (M-1-i) / M}.
    Returns (yr, yi): (T, C) f32 with T = n // M — identical to
    PfbChannelizer's maximally-decimated output (QA:
    tests/test_pfb_fused.py): with xp = [hist; x],
    out[t, c] = sum_i E2[i, c] sum_l H[l, i] xp[(t + l) M + i].
    """
    n = xr.shape[0] - (L * M - 1)
    T = n // M
    G = -(-T // TB)
    Tp = G * TB
    need = (Tp + L) * M
    pad = need - xr.shape[0]
    if pad > 0:
        xr = jnp.pad(xr, (0, pad))
        xi = jnp.pad(xi, (0, pad))
    rows_r = xr.reshape(-1, M)              # (L + Tp [+..], M)
    rows_i = xi.reshape(-1, M)
    # initial halo: the first L history rows; subsequent halos are VMEM
    # carries inside the kernel (no (G, L, M) row gather — measured
    # ~1.5 us/row on the axon chip, dominating the kernel at G*L rows)
    halo_r = rows_r[None, :L]               # (1, L, M)
    halo_i = rows_i[None, :L]
    main_r = rows_r[L: L + Tp]              # (Tp, M)
    main_i = rows_i[L: L + Tp]

    from jax.experimental.pallas import tpu as pltpu
    C = Er.shape[1]
    if dense:
        # W2[(l, i), c] = H[l, i] * E2[i, c] (complex via plane pair)
        He = H[:, :, None]                                # (L, M, 1)
        W2r = (He * Er[None]).reshape(L * M, C)
        W2i = (He * Ei[None]).reshape(L * M, C)
        out_r, out_i = pl.pallas_call(
            functools.partial(_chan_kernel_dense, TB=TB, L=L, M=M),
            out_shape=(jax.ShapeDtypeStruct((Tp, C), jnp.float32),
                       jax.ShapeDtypeStruct((Tp, C), jnp.float32)),
            grid=(G,),
            in_specs=[
                pl.BlockSpec((1, L, M), lambda g: (0, 0, 0)),
                pl.BlockSpec((TB, M), lambda g: (g, 0)),
                pl.BlockSpec((1, L, M), lambda g: (0, 0, 0)),
                pl.BlockSpec((TB, M), lambda g: (g, 0)),
                pl.BlockSpec((L * M, C), lambda g: (0, 0)),
                pl.BlockSpec((L * M, C), lambda g: (0, 0)),
            ],
            out_specs=(pl.BlockSpec((TB, C), lambda g: (g, 0)),
                       pl.BlockSpec((TB, C), lambda g: (g, 0))),
            scratch_shapes=[pltpu.VMEM((L, M), jnp.float32),
                            pltpu.VMEM((L, M), jnp.float32)],
            interpret=interpret,
        )(halo_r, main_r, halo_i, main_i, W2r, W2i)
        return out_r[:T], out_i[:T]
    out_r, out_i = pl.pallas_call(
        functools.partial(_chan_kernel, TB=TB, L=L, M=M),
        out_shape=(jax.ShapeDtypeStruct((Tp, C), jnp.float32),
                   jax.ShapeDtypeStruct((Tp, C), jnp.float32)),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, L, M), lambda g: (0, 0, 0)),
            pl.BlockSpec((TB, M), lambda g: (g, 0)),
            pl.BlockSpec((1, L, M), lambda g: (0, 0, 0)),
            pl.BlockSpec((TB, M), lambda g: (g, 0)),
            pl.BlockSpec((L, M), lambda g: (0, 0)),
            pl.BlockSpec((M, C), lambda g: (0, 0)),
            pl.BlockSpec((M, C), lambda g: (0, 0)),
        ],
        out_specs=(pl.BlockSpec((TB, C), lambda g: (g, 0)),
                   pl.BlockSpec((TB, C), lambda g: (g, 0))),
        scratch_shapes=[pltpu.VMEM((L, M), jnp.float32),
                        pltpu.VMEM((L, M), jnp.float32)],
        interpret=interpret,
    )(halo_r, main_r, halo_i, main_i, H, Er, Ei)
    return out_r[:T], out_i[:T]


def chan_fused_consts(arms: np.ndarray, M: int):
    """Precompute (H, Er, Ei) for pfb_channelize_fused from the channelizer
    arm matrix arms[m, l] (ops/pfb._pad_arms output, conv taps per arm)."""
    L = arms.shape[1]
    # column i carries arm m = M-1-i; kernel slice offset l must see the
    # tap for lag (L-1-l): out[t] += S[t - (L-1) + l] * H[l]
    Hm = np.zeros((L, M), np.float32)
    for i in range(M):
        Hm[:, i] = arms[M - 1 - i, ::-1]
    k = np.arange(M)
    E = np.exp(2j * np.pi * np.outer(k, k) / M)      # E[c, m]
    E2 = E[:, ::-1].T                                # E2[i, c] = E[c, M-1-i]
    return (Hm, E2.real.astype(np.float32).copy(),
            E2.imag.astype(np.float32).copy())
