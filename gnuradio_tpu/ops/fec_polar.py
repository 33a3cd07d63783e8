"""Polar codes: encoder butterflies + successive-cancellation decoding.

Reference parity:
  gr-fec polar_encoder / polar_encoder_systematic (lib/polar_encoder*.cc):
      x = u F^{(x) log2 n} with F = [[1,0],[1,1]] — the butterfly network;
      frozen bit positions carry frozen values (0s)
  polar_decoder_sc (lib/polar_decoder_sc.cc): successive cancellation with
      the min-sum f/g LLR recursions
  channel construction: Bhattacharyya-parameter ordering for the BEC
      (lib/polar/channel_construction.cc 'default constructor')

TPU design: encoding is log2(n) fully-parallel XOR butterfly stages.
SC decoding is the standard recursive f/g formulation written over STATIC
shapes — Python recursion over halves traces to a fixed XLA graph (n is a
compile-time constant); the sequential dependency is inherent to SC
(SURVEY.md §7 hard part (a)) but each level's f/g ops vectorize, and the
batch axis decodes codewords in parallel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def polar_encode_full(u):
    """u [..., n] -> x = u F^{(x)m} (all positions, frozen already placed)."""
    u = u.astype(jnp.int32) & 1
    n = u.shape[-1]
    x = u
    s = 1
    while s < n:
        xr = x.reshape(x.shape[:-1] + (n // (2 * s), 2, s))
        upper = xr[..., 0, :] ^ xr[..., 1, :]
        x = jnp.concatenate([upper[..., None, :], xr[..., 1:2, :]],
                            axis=-2).reshape(x.shape)
        s *= 2
    return x


def bhattacharyya_order(n: int, design_eps: float = 0.5) -> np.ndarray:
    """Channel reliability order via BEC Bhattacharyya parameters
    (channel_construction 'default' method): z_{2i} = 2z - z^2,
    z_{2i+1} = z^2. Returns indices sorted most->least reliable."""
    z = np.array([design_eps], np.float64)
    while len(z) < n:
        z = np.concatenate([2 * z - z * z, z * z])
    # bit-reversal mapping: the recursion above yields natural order already
    return np.argsort(z, kind="stable")


class PolarCode:
    """(n, k) polar code with frozen-set from Bhattacharyya ordering."""

    def __init__(self, n: int, k: int, design_eps: float = 0.5,
                 frozen_positions=None):
        assert n & (n - 1) == 0, "n must be a power of 2"
        self.n, self.k = n, k
        if frozen_positions is None:
            order = bhattacharyya_order(n, design_eps)
            self.info_pos = np.sort(order[:k])
        else:
            frozen = np.asarray(frozen_positions)
            self.info_pos = np.setdiff1d(np.arange(n), frozen)
            assert len(self.info_pos) == k
        self.frozen_mask = np.ones(n, np.int8)
        self.frozen_mask[self.info_pos] = 0

    def encode(self, info):
        """info [..., k] -> codeword [..., n]."""
        info = info.astype(jnp.int32) & 1
        u = jnp.zeros(info.shape[:-1] + (self.n,), jnp.int32)
        u = u.at[..., jnp.asarray(self.info_pos)].set(info)
        return polar_encode_full(u).astype(jnp.int8)

    # ---- SC decode ----
    def decode(self, llr):
        """llr [..., n] (positive = bit 0) -> info bits [..., k].

        Recursive SC with min-sum f and g:
            f(a, b) = sign(a)sign(b) min(|a|, |b|)
            g(a, b, u) = b + (1-2u) a
        """
        frozen = jnp.asarray(self.frozen_mask)

        def sc(llrs, mask):
            n = llrs.shape[-1]
            if n == 1:
                bit = jnp.where(mask[0] > 0, 0, (llrs[..., 0] < 0)
                                .astype(jnp.int32))
                return bit[..., None], bit[..., None]
            half = n // 2
            a, b = llrs[..., :half], llrs[..., half:]
            f = jnp.sign(a) * jnp.sign(b) * jnp.minimum(jnp.abs(a),
                                                        jnp.abs(b))
            u1, x1 = sc(f, mask[:half])
            g = b + (1 - 2 * x1) * a
            u2, x2 = sc(g, mask[half:])
            u = jnp.concatenate([u1, u2], axis=-1)
            x = jnp.concatenate([x1 ^ x2, x2], axis=-1)
            return u, x

        u, _ = sc(llr.astype(jnp.float32), frozen)
        return u[..., jnp.asarray(self.info_pos)].astype(jnp.int8)
