"""Pallas FIR kernel QA — must match the XLA banded-matmul path exactly
(interpret mode on CPU; the on-chip comparison lives in
benchmarks/ + the bench logs)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnuradio_tpu.kernels.fir_xla import fir_apply
from gnuradio_tpu.kernels.fir_pallas import fir_apply_pallas


@pytest.mark.parametrize("T,d,cx,ct", [
    (107, 4, True, True),    # WBFM stage 1 (complex taps)
    (215, 5, False, False),  # WBFM audio FIR
    (63, 1, True, False),    # sync complex filter
    (33, 2, False, True),    # real in, complex taps (hilbert-ish)
])
def test_pallas_fir_matches_xla(rng, T, d, cx, ct):
    n = 4096 * d
    x = rng.standard_normal(n + T - 1).astype(np.float32)
    if cx:
        x = (x + 1j * rng.standard_normal(n + T - 1)).astype(np.complex64)
    taps = rng.standard_normal(T).astype(np.float32)
    if ct:
        taps = (taps + 1j * rng.standard_normal(T)).astype(np.complex64)
    a = np.asarray(fir_apply(jnp.asarray(x), jnp.asarray(taps), d))
    b = np.asarray(fir_apply_pallas(jnp.asarray(x), jnp.asarray(taps), d,
                                    interpret=True))
    assert a.shape == b.shape
    scale = max(float(np.max(np.abs(a))), 1e-9)
    np.testing.assert_allclose(b / scale, a / scale, atol=2e-6)
