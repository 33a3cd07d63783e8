"""TPU session 10: dispatch-floor hypothesis + OFDM batch sweep.

Run: nohup python -u benchmarks/tpu_session10_r03.py > /tmp/tpu_s10.log 2>&1 &
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
from benchmarks.bench_util import setup_cache, time_fn, time_fn_carry


def J(**kw):
    print(json.dumps(kw), flush=True)


def main():
    setup_cache()
    import jax
    import jax.numpy as jnp
    from gnuradio_tpu.models.ofdm import ofdm_rx_burst, ofdm_tx_burst
    from gnuradio_tpu.ops import ofdm as O

    # floor: trivial program on a 28 MB operand
    x = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0),
                                          (4096, 864, 2), jnp.float32))()
    triv = jax.jit(lambda v: v[:, :8, 0] + 1.0)
    J(stage="trivial_28MB_in", dt_ms=round(time_fn(triv, x, iters=20)*1e3, 3))
    sm = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0),
                                           (128,), jnp.float32))()
    triv2 = jax.jit(lambda v: v + 1.0)
    J(stage="trivial_128", dt_ms=round(time_fn(triv2, sm, iters=20)*1e3, 3))

    n_occ = len(O.default_occupied_carriers(64))
    nf = 8
    rng = np.random.default_rng(0)
    burst_len = 32 * 2 + (2 + nf) * (64 + 16)
    for B in (4096, 8192, 16384):
        idx = jnp.asarray(rng.integers(0, 4, (B, nf * n_occ)
                                       ).astype(np.int32))

        @jax.jit
        def loop(state, si):
            def one(s):
                iqv, _ = ofdm_tx_burst(s, 64, 16, pad=32)
                out, _ = ofdm_rx_burst(iqv, nf, 64, 16, equalizer="static")
                return out
            return state, jax.vmap(one)(si)

        st = jnp.zeros(())
        dt = time_fn_carry(loop, st, idx, iters=10)
        J(stage=f"loopback_B{B}", dt_ms=round(dt*1e3, 3),
          msps=round(B * burst_len / dt / 1e6, 1))


if __name__ == "__main__":
    main()
