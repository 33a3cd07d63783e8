"""TPU session 7: OFDM loopback stage dissection (target >= 300 Msps).

Stages timed separately over B=4096 vmapped bursts:
  tx_only          — modulate path
  metric_only      — S&C metric on pre-built bursts
  detect_only      — metric + argmax + fine CFO
  demod_path       — detect + CFO rotate + row slice + FFT
  rx_full_static   — everything incl. chanest/eq/decision
  full_loopback    — tx + rx (the benchmark config)

Run: nohup python -u benchmarks/tpu_session7_r03.py > /tmp/tpu_s7.log 2>&1 &
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from benchmarks.bench_util import setup_cache, sync, time_fn, time_fn_carry


def J(**kw):
    print(json.dumps(kw), flush=True)


def main():
    setup_cache()
    import jax
    import jax.numpy as jnp
    from gnuradio_tpu.models.ofdm import ofdm_rx_burst, ofdm_tx_burst
    from gnuradio_tpu.ops import ofdm as O

    n_occ = len(O.default_occupied_carriers(64))
    nf = 8
    B = 4096
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 4, (B, nf * n_occ)).astype(np.int32))
    burst_len = 32 * 2 + (2 + nf) * (64 + 16)

    @jax.jit
    def tx_only(si):
        return jax.vmap(lambda s: ofdm_tx_burst(s, 64, 16, pad=32)[0])(si)

    iq = tx_only(idx)
    dt = time_fn(tx_only, idx, iters=10)
    J(stage="tx_only", dt_ms=round(dt * 1e3, 3),
      msps=round(B * burst_len / dt / 1e6, 1))

    @jax.jit
    def metric_only(x):
        return jax.vmap(lambda v: O.schmidl_cox_metric(v, 64)[0])(x)

    dt = time_fn(metric_only, iq, iters=10)
    J(stage="metric_only", dt_ms=round(dt * 1e3, 3))

    @jax.jit
    def detect_only(x):
        return jax.vmap(lambda v: O.schmidl_cox_detect(v, 64, 16)[0])(x)

    dt = time_fn(detect_only, iq, iters=10)
    J(stage="detect_only", dt_ms=round(dt * 1e3, 3))

    @jax.jit
    def demod_path(x):
        def one(v):
            d, fine = O.schmidl_cox_detect(v, 64, 16)
            n = v.shape[0]
            xc = v * jnp.exp(-1j * fine * jnp.arange(n, dtype=jnp.float32))
            start = ((d + 6) // 8) * 8
            sym_len = 80
            need = nf + 2
            pad_rows = -((-(n + 8 * 16)) // 8)
            x8 = jnp.pad(xc, (0, max(0, pad_rows * 8 - n))).reshape(-1, 8)
            seg = jax.lax.dynamic_slice(
                x8, (d // 8, 0), (need * sym_len // 8, 8)).reshape(-1)
            return O.ofdm_demodulate(seg, need, 64, 16, 0)
        return jax.vmap(one)(x)

    dt = time_fn(demod_path, iq, iters=10)
    J(stage="demod_path", dt_ms=round(dt * 1e3, 3))

    @jax.jit
    def rx_full(x):
        return jax.vmap(lambda v: ofdm_rx_burst(v, nf, 64, 16,
                                                equalizer="static")[0])(x)

    dt = time_fn(rx_full, iq, iters=10)
    J(stage="rx_full_static", dt_ms=round(dt * 1e3, 3))

    @jax.jit
    def loop(state, si):
        def one(s):
            iqv, _ = ofdm_tx_burst(s, 64, 16, pad=32)
            out, _ = ofdm_rx_burst(iqv, nf, 64, 16, equalizer="static")
            return out
        return state, jax.vmap(one)(si)

    st = jnp.zeros(())
    dt = time_fn_carry(loop, st, idx, iters=10)
    J(stage="full_loopback", dt_ms=round(dt * 1e3, 3),
      msps=round(B * burst_len / dt / 1e6, 1))


if __name__ == "__main__":
    main()
