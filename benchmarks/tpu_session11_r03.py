"""TPU session 11: QPSK feedforward dissection + DVB-T profile.

Run: nohup python -u benchmarks/tpu_session11_r03.py > /tmp/tpu_s11.log 2>&1 &
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
    from gnuradio_tpu.kernels.fir_xla import fir_apply
    from gnuradio_tpu.models.qpsk import rrc_taps

    sps, block = 4, 1024
    n = 1 << 23
    nb = n // block
    mf = rrc_taps(sps, 0.35) / sps
    T = len(mf)
    J(meta=dict(T=T, nb=nb))

    xr = jax.jit(lambda: 0.3 * jax.random.normal(
        jax.random.PRNGKey(0), (2, n + T - 1), dtype="float32"))()

    @jax.jit
    def mf_only(v):
        x = jax.lax.complex(v[0], v[1])
        return fir_apply(x, jnp.asarray(mf), 1)

    y = mf_only(xr)
    J(stage="mf_only", dt_ms=round(time_fn(mf_only, xr, iters=10)*1e3, 3))

    @jax.jit
    def om_only(yv):
        yb = yv[: nb * block].reshape(nb, block)
        ph = jnp.exp(-2j * jnp.pi * (jnp.arange(block) % sps) / sps
                     ).astype(jnp.complex64)
        S = jnp.sum((jnp.abs(yb) ** 2).astype(jnp.complex64) * ph[None, :],
                    axis=1)
        return -sps / (2 * jnp.pi) * jnp.angle(S)

    tau = om_only(y)
    J(stage="om_only", dt_ms=round(time_fn(om_only, y, iters=10)*1e3, 3))

    # scan-based per-block sampling (current)
    spb = block // sps
    seg_len = block + sps + 2

    @jax.jit
    def scan_sample(yv, tau_u):
        o_b = jnp.floor(tau_u).astype(jnp.int32)
        frac_b = (tau_u - o_b.astype(jnp.float32)).astype(jnp.complex64)
        PADL, PADR = 8, sps + 18
        yp2 = jnp.concatenate([jnp.zeros(PADL, yv.dtype), yv,
                               jnp.zeros(PADR, yv.dtype)])
        starts = jnp.clip(jnp.arange(nb, dtype=jnp.int32) * block + o_b + PADL,
                          0, yp2.shape[0] - seg_len)

        def sample_block(_, inp):
            start, fr = inp
            seg = jax.lax.dynamic_slice(yp2, (start,), (seg_len,))
            cols = seg[: spb * sps + 2]
            s0 = cols[: spb * sps].reshape(spb, sps)[:, 0]
            s1 = cols[1: spb * sps + 1].reshape(spb, sps)[:, 0]
            return 0, s0 * (1 - fr) + s1 * fr
        _, sb = jax.lax.scan(sample_block, 0, (starts, frac_b))
        return sb.reshape(-1)

    tu = jnp.cumsum(jnp.zeros(nb) + 0.001) + tau[0]
    sym = scan_sample(y, tu)
    J(stage="scan_sample", dt_ms=round(time_fn(scan_sample, y, tu,
                                               iters=10)*1e3, 3))

    # one-hot re-centered sampling (candidate): K small residual shifts
    K = 9

    @jax.jit
    def onehot_sample(yv, tau_u):
        o_b = jnp.floor(tau_u).astype(jnp.int32)
        frac_b = (tau_u - o_b.astype(jnp.float32)).astype(jnp.complex64)
        o_mid = o_b[nb // 2]
        res = jnp.clip(o_b - o_mid, -(K // 2), K // 2) + K // 2  # [0,K)
        PAD = 32
        yp2 = jnp.concatenate([jnp.zeros(PAD, yv.dtype), yv,
                               jnp.zeros(PAD + K + sps, yv.dtype)])
        base = jax.lax.dynamic_slice(
            yp2, (o_mid + PAD - K // 2,), (nb * block + K + sps,))
        oh = (jnp.arange(K)[None, :] == res[:, None]).astype(jnp.float32)
        acc0 = jnp.zeros((nb, spb), yv.dtype)
        acc1 = jnp.zeros((nb, spb), yv.dtype)
        for k in range(K):
            blkv = base[k: k + nb * block].reshape(nb, block)
            s0 = blkv.reshape(nb, spb, sps)[:, :, 0]
            blkv1 = base[k + 1: k + 1 + nb * block].reshape(nb, block)
            s1 = blkv1.reshape(nb, spb, sps)[:, :, 0]
            w = oh[:, k][:, None]
            acc0 = acc0 + w * s0
            acc1 = acc1 + w * s1
        return (acc0 * (1 - frac_b[:, None])
                + acc1 * frac_b[:, None]).reshape(-1)

    sym2 = onehot_sample(y, tu)
    J(stage="onehot_sample", dt_ms=round(time_fn(onehot_sample, y, tu,
                                                 iters=10)*1e3, 3))
    d = jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))(sym, sym2)
    J(stage="onehot_vs_scan_err", err=float(np.asarray(d)))

    # V&V tail
    @jax.jit
    def vv_tail(symv):
        nsb = symv.shape[0] // spb
        s4 = (symv[: nsb * spb].reshape(nsb, spb)) ** 4
        th = jnp.angle(jnp.sum(s4, axis=1)) / 4.0
        th_full = jnp.repeat(th, spb, total_repeat_length=nsb * spb)
        corr = symv[: nsb * spb] * jnp.exp(-1j * th_full)
        ang = jnp.angle(corr)
        return jnp.round(ang / (jnp.pi / 2)).astype(jnp.int32) % 4

    J(stage="vv_tail", dt_ms=round(time_fn(vv_tail, sym, iters=10)*1e3, 3))

    # ---- DVB-T profile: stages of dvbt_tx ----
    from gnuradio_tpu.ops import dtv
    cfg = dtv.DVBTConfig()
    pil = dtv.DVBTPilots(cfg)
    nb1 = dtv.dvbt_tx_bytes_per_superframe(cfg)
    k0 = next(k for k in range(1, 9) if (k * nb1) % 1504 == 0)
    nbytes = nb1 * k0 * 4
    ts = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, nbytes).astype(np.int8))
    full = jax.jit(lambda b: dtv.dvbt_tx(b, cfg, pil))
    out = full(ts)
    J(stage="dvbt_full", dt_ms=round(time_fn(full, ts, iters=10)*1e3, 3),
      n_out=int(out.shape[0]))


if __name__ == "__main__":
    main()
