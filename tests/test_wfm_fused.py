"""QA: fused WBFM front-end Pallas kernel (kernels/wfm_fused_pallas.py)
vs the unfused reference-parity chain (models/wfm.make_wfm_step), interpret
mode on CPU — same golden-comparison discipline as tests/test_fir_pallas.py."""
import numpy as np
import jax
import jax.numpy as jnp

from gnuradio_tpu.kernels.wfm_fused_pallas import _atan2, WfmFrontFused
from gnuradio_tpu.models.wfm import make_wfm_step, make_wfm_step_fused


def test_atan2_poly_accuracy(rng):
    y = rng.standard_normal(20000).astype(np.float32) * 3
    x = rng.standard_normal(20000).astype(np.float32) * 3
    got = np.asarray(jax.jit(_atan2)(jnp.asarray(y), jnp.asarray(x)))
    ref = np.arctan2(y.astype(np.float64), x.astype(np.float64))
    assert np.max(np.abs(got - ref)) < 2e-6
    # edge cases: atan2(0, 0) must be 0 (stream-start demod convention)
    z = np.asarray(jax.jit(_atan2)(jnp.zeros(4), jnp.zeros(4)))
    np.testing.assert_array_equal(z, 0.0)


def _fm_like_iq(rng, n, fs=1e6, fdev=75e3):
    """FM-modulated noise (band-limited message), complex64."""
    msg = np.convolve(rng.standard_normal(n + 64), np.ones(64) / 64,
                      "valid")[:n]
    msg = msg / (np.abs(msg).max() + 1e-9)
    phase = np.cumsum(2 * np.pi * fdev * msg / fs)
    iq = np.exp(1j * phase) + 0.01 * (rng.standard_normal(n)
                                      + 1j * rng.standard_normal(n))
    return iq.astype(np.complex64)


def test_fused_matches_unfused(rng):
    n = 120_000
    iq = _fm_like_iq(rng, n)
    planes = np.stack([iq.real, iq.imag], -1).astype(np.float32)

    init_u, step_u, mult = make_wfm_step(1e6, 250e3, 50e3)
    su = init_u()
    su, ref = jax.jit(step_u)(su, jnp.asarray(iq))

    init_f, step_f, _ = make_wfm_step_fused(1e6, 250e3, 50e3, interpret=True)
    sf = init_f()
    sf, got = jax.jit(step_f)(sf, jnp.asarray(planes))

    ref = np.asarray(ref)
    got = np.asarray(got)
    assert got.shape == ref.shape
    # stream-start transient: sample 0 of the demod is arg(y0 * conj(0)) —
    # jnp.arctan2(+0,-0)=pi in the unfused chain vs 0 from the kernel's
    # polynomial atan2. Both are arbitrary on that dead sample; its value
    # smears across the audio FIR's warmup, so compare past the transient.
    skip = 64
    ref, got = ref[skip:], got[skip:]
    err = np.max(np.abs(got - ref))
    scale = np.max(np.abs(ref)) + 1e-9
    assert err / scale < 2e-4, f"fused/unfused mismatch: {err} (scale {scale})"


def test_fused_freq_xlating_matches(rng):
    """Nonzero center frequency: the collapsed-rotator algebra must match
    the fxpt-NCO rotator chain within the fxpt quantization bound."""
    n = 80_000
    fs, fc = 1e6, 120e3
    base = _fm_like_iq(rng, n, fs=fs)
    iq = (base * np.exp(2j * np.pi * fc / fs * np.arange(n))
          ).astype(np.complex64)
    planes = np.stack([iq.real, iq.imag], -1).astype(np.float32)

    init_u, step_u, _ = make_wfm_step(1e6, 250e3, 50e3, center_freq=fc)
    su = init_u()
    su, ref = jax.jit(step_u)(su, jnp.asarray(iq))
    init_f, step_f, _ = make_wfm_step_fused(1e6, 250e3, 50e3, center_freq=fc,
                                            interpret=True)
    sf = init_f()
    sf, got = jax.jit(step_f)(sf, jnp.asarray(planes))
    skip = 64  # dead-sample transient, see test_fused_matches_unfused
    err = np.max(np.abs(np.asarray(got)[skip:] - np.asarray(ref)[skip:]))
    scale = np.max(np.abs(np.asarray(ref))) + 1e-9
    assert err / scale < 1e-3, f"freq-xlating mismatch: {err}"


def test_fused_chunk_invariance(rng):
    n = 160_000
    iq = _fm_like_iq(rng, n)
    planes = jnp.asarray(np.stack([iq.real, iq.imag], -1).astype(np.float32))
    init_f, step_f, mult = make_wfm_step_fused(1e6, 250e3, 50e3,
                                               interpret=True)
    s = init_f()
    s, yA = jax.jit(step_f)(s, planes)
    half = (n // (2 * mult)) * mult
    s = init_f()
    s, y1 = jax.jit(step_f)(s, planes[:half])
    s, y2 = jax.jit(step_f)(s, planes[half:])
    yB = jnp.concatenate([y1, y2])
    np.testing.assert_allclose(np.asarray(yA), np.asarray(yB),
                               rtol=2e-4, atol=2e-5)


def test_fused_split_stage2_matches(rng):
    """stage2="split" (215-tap quad-rate LPF + audio-rate deemph FIR) is
    numerically equivalent to the folded 775-tap form across chunked calls
    (carry discipline intact for both tails)."""
    n = 200_000
    iq = _fm_like_iq(rng, n)
    planes = np.stack([iq.real, iq.imag], -1).astype(np.float32)

    outs = {}
    for mode in ("folded", "split"):
        init, step, mult = make_wfm_step_fused(1e6, 250e3, 50e3,
                                               interpret=True, stage2=mode)
        s = init()
        step_j = jax.jit(step)
        parts = []
        for c in range(2):                      # chunk-invariance included
            s, y = step_j(s, jnp.asarray(planes[c * 100_000:(c + 1) * 100_000]))
            parts.append(np.asarray(y))
        outs[mode] = np.concatenate(parts)
    skip = 64
    a, b = outs["folded"][skip:], outs["split"][skip:]
    err = np.max(np.abs(a - b))
    scale = np.max(np.abs(a)) + 1e-9
    assert err / scale < 2e-4, f"split/folded mismatch {err} vs {scale}"
