"""Headline benchmark: WBFM receive chain throughput (BASELINE.json config #1).

Measures complex Msamples/s through freq_xlating_fir(4x decim, 107 taps) ->
quadrature_demod -> fir(5x decim, 215 taps) -> deemph IIR on one chip, steady
state, host transfers excluded (device-resident input, like the reference's
mp-sched synthetic which sources from null_source).

vs_baseline: the reference has no published Msamples/s (BASELINE.md); its
mp-sched synthetic saturates ~14.4 GFLOPS on a Core2 Duo. We report
vs_baseline as achieved GFLOPS / 14.4 (the reference's best saturated
figure) for a comparable FIR-dominated chain.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

import numpy as np

# persistent compilation cache: the axon tunnel makes first compiles slow
# (minutes for conv-heavy programs); cache them across runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from gnuradio_tpu.models.wfm import make_wfm_step

    samp_rate, quad_rate, audio_rate = 1_000_000.0, 250_000.0, 50_000.0
    init_state, step, mult = make_wfm_step(samp_rate, quad_rate, audio_rate)

    n = 1 << 22  # 4M complex samples per step

    @jax.jit
    def run(state, iq_f32):
        x = lax.complex(iq_f32[:, 0], iq_f32[:, 1])
        return step(state, x)

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    rng = np.random.default_rng(0)
    iq_host = rng.standard_normal((n, 2), dtype=np.float32) * 0.5
    iq = jax.device_put(iq_host)
    # init under jit: eager complex array creation is unsupported on the
    # axon backend (complex exists only inside compiled programs)
    state = jax.jit(init_state)()

    # warm up + compile (fetch a scalar: on some experimental backends
    # block_until_ready returns before execution completes, so a host fetch
    # is the only reliable synchronization barrier)
    state, audio = run(state, iq)
    np.asarray(audio[-8:])  # 1-d slice: 0-d fetches are unimplemented on axon

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, audio = run(state, iq)
    np.asarray(audio[-8:])
    dt = time.perf_counter() - t0

    msps = n * iters / dt / 1e6
    # FLOP model (complex MAC = 8 FLOPs, real MAC = 2):
    # chan FIR: 107 taps complex-in real-taps -> 4 real FLOPs/tap per input..
    # count at input rate: 107*4; demod ~ at quad rate; audio FIR 215*2 at
    # quad rate; conservative: FIR work only.
    flops_per_in = 107 * 4 + (215 * 2) / 4
    gflops = msps * 1e6 * flops_per_in / 1e9
    ref_gflops = 14.4  # reference mp-sched best saturated (BASELINE.md)
    out = {
        "metric": "wbfm_chain_throughput",
        "value": round(msps, 2),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(gflops / ref_gflops, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
