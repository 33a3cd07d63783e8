"""Per-stage WBFM chain profile on the real chip.

Times the full chain and each stage in isolation at the stage's own rate,
so the chain's time budget decomposes:  which stage dominates, and is it
MXU- or HBM-bound?  (VERDICT r01 weak #1/#2: perf accounting.)

Run: nohup python -u benchmarks/profile_wfm.py > /tmp/profile_wfm.log 2>&1 &
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from benchmarks.bench_util import setup_cache, sync, time_fn_carry, CHIP


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    setup_cache()

    from gnuradio_tpu.models.wfm import make_wfm_step, channel_taps, wfm_taps
    from gnuradio_tpu.ops.filter import FreqXlatingFirFilter, FirFilter
    from gnuradio_tpu.ops.analog import QuadratureDemod, fm_deemph
    from gnuradio_tpu.kernels.fir_xla import fir_apply
    from gnuradio_tpu.ops import fxpt

    fs, qr, ar = 1_000_000.0, 250_000.0, 50_000.0
    n = 1 << 22
    rng = np.random.default_rng(0)
    iq_host = rng.standard_normal((n, 2), dtype=np.float32) * 0.5
    iq = jax.device_put(iq_host)

    results = {}

    def bench(name, make_step, n_items, iters=20):
        init, step = make_step()
        state = jax.jit(init)()
        f = jax.jit(step)
        dt = time_fn_carry(f, state, iq, iters=iters)
        msps = n_items / dt / 1e6
        results[name] = round(msps, 2)
        print(f"{name:36s} {dt*1e3:8.2f} ms  {msps:10.1f} Msps(in)", flush=True)
        return dt

    # --- full chain ---
    init_state, step, mult = make_wfm_step(fs, qr, ar)

    def full():
        def stp(state, iq_f32):
            x = lax.complex(iq_f32[:, 0], iq_f32[:, 1])
            return step(state, x)
        return init_state, stp
    t_full = bench("full_chain", full, n)

    # --- stage 1: freq_xlating_fir (complex taps, decim 4) ---
    chan = FreqXlatingFirFilter(4, channel_taps(fs, qr), 0.0, fs)

    def stage1():
        def stp(state, iq_f32):
            x = lax.complex(iq_f32[:, 0], iq_f32[:, 1])
            s, (y,) = chan.apply(state, (x,), (n,))
            return s, y
        return chan.init_state, stp
    t1 = bench("stage1_freq_xlating_fir", stage1, n)

    # --- stage 1 variants ---
    ctaps = chan.ctaps

    def s1_fir_only():
        def stp(state, iq_f32):
            x = lax.complex(iq_f32[:, 0], iq_f32[:, 1])
            xp = jnp.concatenate([state, x])
            y = fir_apply(xp, jnp.asarray(ctaps), 4)
            return xp[-106:], y
        return (lambda: jnp.zeros(106, jnp.complex64)), stp
    bench("stage1_fir_only_complex_taps", s1_fir_only, n)

    rtaps = np.real(ctaps).astype(np.float32)

    def s1_fir_real_taps():
        def stp(state, iq_f32):
            x = lax.complex(iq_f32[:, 0], iq_f32[:, 1])
            xp = jnp.concatenate([state, x])
            y = fir_apply(xp, jnp.asarray(rtaps), 4)
            return xp[-106:], y
        return (lambda: jnp.zeros(106, jnp.complex64)), stp
    bench("stage1_fir_only_real_taps", s1_fir_real_taps, n)

    def s1_rotator_only():
        delta = fxpt.float_to_fxpt(-2 * np.pi * 0.1)

        def stp(state, iq_f32):
            x = lax.complex(iq_f32[:, 0], iq_f32[:, 1])
            y = x[: n // 4]
            rot, nxt = fxpt.nco_sincos(state, jnp.int32(delta), n // 4)
            return nxt, y * rot
        return (lambda: jnp.zeros((), jnp.int32)), stp
    bench("stage1_rotator_only(out-rate)", s1_rotator_only, n)

    # --- stage 2: quadrature demod at quad rate (n/4 items) ---
    demod = QuadratureDemod(1.0)

    def stage2():
        def stp(state, iq_f32):
            x = lax.complex(iq_f32[: n // 4, 0], iq_f32[: n // 4, 1])
            s, (y,) = demod.apply(state, (x,), (n // 4,))
            return s, y
        return demod.init_state, stp
    bench("stage2_quad_demod(quad-rate)", stage2, n)

    # --- stage 3: audio FIR 215 taps decim 5 at quad rate ---
    audio = FirFilter(5, wfm_taps(qr, ar), in_complex=False)

    def stage3():
        def stp(state, iq_f32):
            x = iq_f32[: n // 4, 0]
            s, (y,) = audio.apply(state, (x,), (n // 4,))
            return s, y
        return audio.init_state, stp
    bench("stage3_audio_fir(quad-rate)", stage3, n)

    # --- stage 4: deemph IIR at audio rate ---
    de = fm_deemph(ar)

    def stage4():
        def stp(state, iq_f32):
            x = iq_f32[: n // 20, 0]
            s, (y,) = de.apply(state, (x,), (n // 20,))
            return s, y
        return de.init_state, stp
    bench("stage4_deemph_iir(audio-rate)", stage4, n)

    # --- dispatch floor: trivial jit ---
    def noopf():
        def stp(state, iq_f32):
            return state, iq_f32[:8, 0] + state
        return (lambda: jnp.zeros((), jnp.float32)), stp
    bench("dispatch_floor(noop)", noopf, n, iters=50)

    # --- input HBM read floor: one pass over the 32MB input ---
    def readfloor():
        def stp(state, iq_f32):
            return state, jnp.sum(iq_f32, axis=0) + state
        return (lambda: jnp.zeros(2, jnp.float32)), stp
    bench("hbm_read_floor(sum)", readfloor, n, iters=50)

    print(json.dumps({"chip": CHIP["kind"], "n": n, "results_msps_in": results}))


if __name__ == "__main__":
    main()
