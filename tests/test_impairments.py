"""QA: gr-channels impairment blocks (ops/impairments.py) vs literal NumPy
transcriptions of the reference hier graphs
(gr-channels/python/channels/*.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from gnuradio_tpu.ops.impairments import (AmpBal, Distortion2Gen,
                                          Distortion3Gen, Impairments,
                                          IqBalGen, PhaseBal, PhaseNoiseGen)


def _one_pole_np(x, alpha):
    y = np.zeros(len(x))
    acc = 0.0
    for i, v in enumerate(x):
        acc = alpha * v + (1 - alpha) * acc
        y[i] = acc
    return y


def test_amp_bal(rng):
    a = 0.01
    x = (rng.standard_normal(3000) + 1j * 0.5 * rng.standard_normal(3000)
         ).astype(np.complex64)
    ms_re = _one_pole_np(x.real.astype(np.float64) ** 2, a)
    ms_im = _one_pole_np(x.imag.astype(np.float64) ** 2, a)
    ref = x.real + 1j * x.imag * np.sqrt(ms_re) / np.sqrt(ms_im)
    blk = AmpBal(a)
    st = blk.init_state()
    st, got = jax.jit(blk.work)(st, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref.astype(np.complex64),
                               rtol=2e-3, atol=2e-3)


def test_phase_bal(rng):
    a = 0.02
    x = np.exp(1j * rng.uniform(0, 2 * np.pi, 2000)).astype(np.complex64)
    mag2 = np.abs(x.astype(np.complex128)) ** 2
    d = _one_pole_np(2 * x.real * x.imag / mag2, a)
    ref = (x.real - d * x.imag) + 1j * (x.imag - d * x.real)
    blk = PhaseBal(a)
    st = blk.init_state()
    st, got = jax.jit(blk.work)(st, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref.astype(np.complex64),
                               rtol=2e-3, atol=2e-3)


def test_iqbal_gen_tx_rx(rng):
    x = (rng.standard_normal(500) + 1j * rng.standard_normal(500)
         ).astype(np.complex64)
    mag, ph = 2.0, 10.0
    g = 10 ** (mag / 20)
    c, s = np.cos(np.pi * ph / 180), np.sin(np.pi * ph / 180)
    ref_tx = g * (x.real * c + x.imag * s) + 1j * x.imag
    ref_rx = (g * x.real) * c + 1j * ((g * x.real) * s + x.imag)
    for mode, ref in ((0, ref_tx), (1, ref_rx)):
        blk = IqBalGen(mag, ph, mode)
        _, got = jax.jit(blk.work)(None, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got),
                                   ref.astype(np.complex64), rtol=1e-5,
                                   atol=1e-5)


def test_distortions(rng):
    x = (0.5 * (rng.standard_normal(400) + 1j * rng.standard_normal(400))
         ).astype(np.complex64)
    b = 0.2
    _, got2 = jax.jit(Distortion2Gen(b).work)(None, jnp.asarray(x))
    ref2 = x + b * (x * x + x * np.conj(x))
    np.testing.assert_allclose(np.asarray(got2), ref2, rtol=1e-5, atol=1e-5)
    _, got3 = jax.jit(Distortion3Gen(b).work)(None, jnp.asarray(x))
    ref3 = x + b * (np.abs(x) ** 2) * x
    np.testing.assert_allclose(np.asarray(got3), ref3, rtol=1e-5, atol=1e-5)


def test_phase_noise_and_impairments_run(rng):
    x = np.exp(1j * rng.uniform(0, 2 * np.pi, 1000)).astype(np.complex64)
    blk = PhaseNoiseGen(0.1, 0.1)
    st = blk.init_state()
    st, y = jax.jit(blk.work)(st, jnp.asarray(x))
    # phase noise preserves magnitude
    np.testing.assert_allclose(np.abs(np.asarray(y)), 1.0, atol=1e-5)
    imp = Impairments(0.01, 1.0, 2.0, 0.01, 0.02, 1e-4, 0.05, 0.05)
    st = imp.init_state()
    st, z = jax.jit(imp.work)(st, jnp.asarray(x))
    assert np.all(np.isfinite(np.asarray(z)))
    # with all impairments zero, the chain is identity
    imp0 = Impairments()
    st = imp0.init_state()
    st, z0 = jax.jit(imp0.work)(st, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(z0), x, rtol=1e-5, atol=1e-5)
