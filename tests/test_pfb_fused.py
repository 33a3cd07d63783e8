"""Fused Pallas PFB channelizer QA (round 4): the one-kernel arm-conv +
DFT form must match the unfused PfbChannelizer/arb-resampler chain
exactly (same taps, same maximally-decimated semantics), including
across chunk boundaries (carried history)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnuradio_tpu.models.channelize import (make_channelizer_step,
                                            make_channelizer_step_fused)


@pytest.mark.parametrize("with_rs", [False, True])
def test_fused_channelizer_matches_unfused(rng, with_rs):
    rate = 0.9375 if with_rs else None
    init_u, step_u, meta = make_channelizer_step(6_400_000.0, 64, rate)
    init_f, step_f, meta_f = make_channelizer_step_fused(
        6_400_000.0, 64, rate, TB=64)
    assert meta["in_multiple"] == meta_f["in_multiple"]
    n = meta["in_multiple"] * 24
    su, sf = init_u(), init_f()
    for it in range(3):
        iq = (rng.standard_normal((n, 2)) * 0.5).astype(np.float32)
        su, yu = step_u(su, jnp.asarray(iq[:, 0] + 1j * iq[:, 1],
                                        jnp.complex64))
        sf, yf = step_f(sf, jnp.asarray(iq))
        yu = np.asarray(yu)
        yf = np.asarray(yf)
        assert yu.shape == yf.shape, (yu.shape, yf.shape)
        err = np.abs(yu - yf).max()
        ref = np.abs(yu).max() + 1e-12
        assert err / ref < 1e-4, (it, err, ref)
