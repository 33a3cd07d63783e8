"""TPU session 9: OFDM new-path micro costs.

Run: nohup python -u benchmarks/tpu_session9_r03.py > /tmp/tpu_s9.log 2>&1 &
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
from benchmarks.bench_util import setup_cache, time_fn


def J(**kw):
    print(json.dumps(kw), flush=True)


def main():
    setup_cache()
    import jax
    import jax.numpy as jnp
    from gnuradio_tpu.models.ofdm import ofdm_tx_burst
    from gnuradio_tpu.ops import ofdm as O

    n_occ = len(O.default_occupied_carriers(64))
    nf, B = 8, 4096
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 4, (B, nf * n_occ)).astype(np.int32))

    @jax.jit
    def tx_only(si):
        return jax.vmap(lambda s: ofdm_tx_burst(s, 64, 16, pad=32)[0])(si)

    iq = tx_only(idx)
    n = iq.shape[1]
    need = nf + 2
    sym_len = 80
    need_rows = need * sym_len // 8

    # tx pieces
    from gnuradio_tpu.ops.digital import constellation_qpsk
    const = constellation_qpsk()
    occ = O.default_occupied_carriers(64)
    w1, w2 = O.schmidl_cox_preamble(64)

    @jax.jit
    def tx_alloc(si):
        def one(s):
            syms = jnp.asarray(const.points)[s]
            return O.allocate_carriers(syms, nf, 64, occ,
                                       O.DEFAULT_PILOT_CARRIERS,
                                       O.DEFAULT_PILOT_SYMBOLS,
                                       sync_words=[w1, w2])
        return jax.vmap(one)(si)

    frames = tx_alloc(idx)
    J(stage="tx_alloc", dt_ms=round(time_fn(tx_alloc, idx, iters=10)*1e3, 3))

    @jax.jit
    def tx_mod(fr):
        return jax.vmap(lambda f: O.ofdm_modulate(f, 16))(fr)

    J(stage="tx_mod_idft", dt_ms=round(time_fn(tx_mod, frames, iters=10)*1e3, 3))

    # rx pieces on fixed start (slice cost isolated below)
    rows = -((-(n + 8 * 16)) // 8)
    starts = jnp.asarray(rng.integers(0, 14, B).astype(np.int32))

    @jax.jit
    def slice_onehot(x, r0):
        def one(v, s):
            x8 = jnp.pad(v, (0, rows * 8 - n)).reshape(-1, 8)
            K = x8.shape[0] - need_rows + 1
            oh = (jnp.arange(K) == s).astype(jnp.float32)
            seg = jnp.zeros((need_rows, 8), v.dtype)
            for k in range(K):
                seg = seg + oh[k] * jax.lax.slice_in_dim(x8, k, k + need_rows)
            return seg
        return jax.vmap(one)(x, r0)

    segs = slice_onehot(iq, starts)
    J(stage="slice_onehot", dt_ms=round(time_fn(slice_onehot, iq, starts,
                                                iters=10)*1e3, 3))

    fines = jnp.asarray(rng.standard_normal(B).astype(np.float32)*1e-3)

    @jax.jit
    def rot_fact(sg, f, r0):
        def one(s, fine, row0):
            s0 = jnp.exp(-1j * fine * (8.0 * row0.astype(jnp.float32)))
            A = jnp.exp(-1j * fine * 80 * jnp.arange(need, dtype=jnp.float32))
            Cc = jnp.exp(-1j * fine * jnp.arange(80, dtype=jnp.float32))
            return (s.reshape(need, 80) * (s0*A)[:, None] * Cc[None, :])
        return jax.vmap(one)(sg, f, r0)

    rotted = rot_fact(segs, fines, starts)
    J(stage="rot_factorized", dt_ms=round(time_fn(rot_fact, segs, fines,
                                                  starts, iters=10)*1e3, 3))

    @jax.jit
    def dft_path(fr):
        return O.dft_apply(fr[:, :, 16:], 64)

    F = dft_path(rotted)
    J(stage="dft_matmul", dt_ms=round(time_fn(dft_path, rotted, iters=10)*1e3, 3))

    @jax.jit
    def tail(Fv):
        def one(Fb):
            H = O.ls_channel_estimate(Fb[1], jnp.asarray(w2), 64)
            eq = O.equalize_static(Fb[2:], H)
            syms = O.serialize_carriers(eq, 64, occ)
            return const.decision(syms)
        return jax.vmap(one)(Fv)

    J(stage="chanest_eq_tail", dt_ms=round(time_fn(tail, F, iters=10)*1e3, 3))

    # detect pieces
    @jax.jit
    def metric_P_only(x):
        def one(v):
            return O.schmidl_cox_metric(v, 64)[0]
        return jax.vmap(one)(x)

    J(stage="metric", dt_ms=round(time_fn(metric_P_only, iq, iters=10)*1e3, 3))

    @jax.jit
    def argmax_only(M):
        return jnp.argmax(M > 0.8, axis=1)

    Mv = metric_P_only(iq)
    J(stage="argmax", dt_ms=round(time_fn(argmax_only, Mv, iters=10)*1e3, 3))


if __name__ == "__main__":
    main()
