"""One TPU session running ALL round-3 probes back-to-back (the tunnel
warm-up costs minutes per fresh process — amortize it once).

Order: WBFM stage probe (v3b kernels) -> TopBlock composed path -> DVB-T
per-stage profile -> OFDM per-stage profile -> tracker configs.

Run: nohup python -u benchmarks/tpu_session_r03.py > /tmp/tpu_session.log 2>&1 &
"""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from benchmarks.bench_util import setup_cache, sync, time_fn, time_fn_carry


def J(**kw):
    print(json.dumps(kw), flush=True)


def sect(name):
    print(f"### {name}", flush=True)


def wfm_stages():
    import jax
    import jax.numpy as jnp
    from gnuradio_tpu.models.wfm import (channel_taps, make_wfm_step,
                                         make_wfm_step_fused, wfm_taps)
    from gnuradio_tpu.models.wfm_sharded import _deemph_coeffs
    from gnuradio_tpu.ops.iir_core import first_order_fir_taps
    from gnuradio_tpu.kernels.wfm_fused_pallas import WfmFrontFused
    from gnuradio_tpu.kernels.fir_xla import fir_apply

    n = 1 << 25
    iq = jax.jit(lambda: 0.5 * jax.random.normal(
        jax.random.PRNGKey(0), (n + 110, 2), dtype="float32"))()
    for R in (32, 64, 128):
        front = WfmFrontFused(channel_taps(1e6, 250e3), 0.0, 1e6, 4,
                              0.53, R=R)
        xq = iq[: n + front.history]
        f = jax.jit(lambda x: front(x))
        dt = time_fn(f, xq, iters=10)
        J(stage=f"front_R{R}", dt_ms=round(dt * 1e3, 3),
          msps_in=round(n / dt / 1e6, 1))

    a_taps = np.asarray(wfm_taps(250e3, 50e3), np.float32)
    nq = n // 4
    y = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(1), (nq + len(a_taps) - 1,), dtype="float32"))()
    g = jax.jit(lambda v: fir_apply(v, jnp.asarray(a_taps), 5))
    J(stage="audio_fir", dt_ms=round(time_fn(g, y, iters=10) * 1e3, 3))
    b0, b1, rr = _deemph_coeffs(50e3, 75e-6)
    d_taps = np.asarray(first_order_fir_taps(b0, b1, rr), np.float32)
    na = nq // 5
    z = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(2), (na + len(d_taps) - 1,), dtype="float32"))()
    h = jax.jit(lambda v: fir_apply(v, jnp.asarray(d_taps), 1))
    J(stage="deemph_fir", dt_ms=round(time_fn(h, z, iters=10) * 1e3, 3))

    for R in (32, 64, 128):
        init, step, mult = make_wfm_step_fused(1e6, 250e3, 50e3, R=R)
        run = jax.jit(step)
        st = jax.jit(init)()
        dt = time_fn_carry(run, st, iq[:n], iters=10)
        J(stage=f"full_fused_R{R}", dt_ms=round(dt * 1e3, 3),
          msps=round(n / dt / 1e6, 1))
    # unfused for reference (uses the new generic FIR kernel)
    init, step, mult = make_wfm_step(1e6, 250e3, 50e3)

    @jax.jit
    def runu(state, iqp):
        import jax.lax as lax
        return step(state, jax.lax.complex(iqp[:, 0], iqp[:, 1]))

    st = jax.jit(init)()
    dt = time_fn_carry(runu, st, iq[:n], iters=10)
    J(stage="full_unfused", dt_ms=round(dt * 1e3, 3),
      msps=round(n / dt / 1e6, 1))


def topblock_bench():
    from benchmarks.bench_topblock import (bench_bare, bench_topblock_device,
                                           bench_topblock_fed)
    for fn, kw in [(bench_bare, dict(n=1 << 22)),
                   (bench_topblock_device, dict(n_per_step=1 << 22)),
                   (bench_topblock_fed, dict(n_per_step=1 << 22)),
                   (bench_bare, dict(n=1 << 24)),
                   (bench_topblock_device, dict(n_per_step=1 << 24))]:
        try:
            J(**fn(**kw))
        except Exception as e:
            import traceback
            J(err=traceback.format_exc()[-400:])


def dvbt_profile():
    import jax
    import jax.numpy as jnp
    from gnuradio_tpu.ops import dtv
    cfg = dtv.DVBTConfig()
    pil = dtv.DVBTPilots(cfg)
    nb1 = dtv.dvbt_tx_bytes_per_superframe(cfg)
    k = next(k for k in range(1, 9) if (k * nb1) % 1504 == 0)
    nb = nb1 * k
    rng = np.random.default_rng(0)
    ts = jnp.asarray(rng.integers(0, 256, nb).astype(np.int8))

    stages = []
    x = jax.jit(dtv.energy_dispersal)(ts)
    stages.append(("energy_dispersal", dtv.energy_dispersal, ts))
    x2 = jax.jit(dtv.rs_encode_packets)(x)
    stages.append(("rs_encode", dtv.rs_encode_packets, x))
    ci = lambda v: dtv.conv_interleave(v.reshape(-1),
                                       dtv.conv_interleaver_init())[0]
    x3 = jax.jit(ci)(x2)
    stages.append(("conv_interleave", ci, x2))
    bb = jax.jit(dtv.bytes_to_bits)(x3)
    stages.append(("bytes_to_bits", dtv.bytes_to_bits, x3))
    icb = lambda b: dtv.inner_code_bits(b, cfg.code_rate)
    cb = jax.jit(icb)(bb)
    stages.append(("inner_code", icb, bb))
    b2s = lambda b: dtv.bits_to_symbols(b, cfg.m)
    sy = jax.jit(b2s)(cb)
    stages.append(("bits_to_symbols", b2s, cb))
    bii = lambda s: dtv.bit_inner_interleave(s, cfg.m)
    bi = jax.jit(bii)(sy)
    stages.append(("bit_inner_interleave", bii, sy))
    nsym = bi.shape[0] // cfg.payload_length
    bi2 = bi.reshape(nsym, cfg.payload_length)
    sil = lambda s: dtv.symbol_interleave(s, cfg.mode)
    si = jax.jit(sil)(bi2)
    stages.append(("symbol_interleave", sil, bi2))
    mp = lambda s: dtv.dvbt_map(s, cfg)
    pts = jax.jit(mp)(si)
    stages.append(("dvbt_map", mp, si))
    grid = jax.jit(pil.insert)(pts)
    stages.append(("pilots_insert", pil.insert, pts))
    om = lambda g: dtv.ofdm_modulate(g, cfg)
    td = jax.jit(om)(grid)
    stages.append(("ofdm_mod", om, grid))
    cpf = lambda t: dtv.cyclic_prefix(t, cfg).reshape(-1)
    stages.append(("cyclic_prefix", cpf, td))
    full = lambda b: dtv.dvbt_tx(b, cfg, pil)
    stages.append(("FULL_dvbt_tx", full, ts))
    out = jax.jit(full)(ts)
    n_out = int(out.shape[0])
    for name, fn, arg in stages:
        try:
            dt = time_fn(jax.jit(fn), arg, iters=10)
            J(dvbt_stage=name, dt_ms=round(dt * 1e3, 3))
            if name == "FULL_dvbt_tx":
                J(dvbt_full_msps=round(n_out / dt / 1e6, 2), n_out=n_out)
        except Exception as e:
            J(dvbt_stage=name, error=repr(e)[:200])


def ofdm_profile():
    import jax
    import jax.numpy as jnp
    from gnuradio_tpu.models.ofdm import ofdm_rx_burst, ofdm_tx_burst
    from gnuradio_tpu.ops import ofdm as O
    n_occ = len(O.default_occupied_carriers(64))
    nf = 8
    B = 1024
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 4, (B, nf * n_occ)).astype(np.int32))

    @jax.jit
    def tx_only(si):
        return jax.vmap(lambda s: ofdm_tx_burst(s, 64, 16, pad=32)[0])(si)

    iqs = tx_only(idx)
    dt = time_fn(tx_only, idx, iters=10)
    J(ofdm_stage="tx_burst_vmap", dt_ms=round(dt * 1e3, 3))

    @jax.jit
    def sync_only(x):
        return jax.vmap(lambda v: O.schmidl_cox_detect(v, 64, 16)[0])(x)

    dt = time_fn(sync_only, iqs, iters=10)
    J(ofdm_stage="schmidl_cox_detect", dt_ms=round(dt * 1e3, 3))

    @jax.jit
    def rx_only(x):
        return jax.vmap(
            lambda v: ofdm_rx_burst(v, nf, 64, 16, equalizer="static")[0])(x)

    dt = time_fn(rx_only, iqs, iters=10)
    J(ofdm_stage="rx_full", dt_ms=round(dt * 1e3, 3))

    @jax.jit
    def loop(state, si):
        def one(s):
            iq, _ = ofdm_tx_burst(s, 64, 16, pad=32)
            out, _ = ofdm_rx_burst(iq, nf, 64, 16, equalizer="static")
            return out
        return state, jax.vmap(one)(si)

    st = jnp.zeros(())
    dt = time_fn_carry(loop, st, idx, iters=10)
    burst_len = 32 * 2 + (2 + nf) * (64 + 16)
    J(ofdm_stage="FULL_loopback", dt_ms=round(dt * 1e3, 3),
      msps=round(B * burst_len / dt / 1e6, 1))


def trackers():
    from benchmarks.probe_r03 import probe_blockparallel, probe_tracker
    J(**probe_tracker(C=1024, K=4096, sps=2))
    J(**probe_tracker(C=1024, K=4096, sps=4))
    J(**probe_blockparallel(nsamp=1 << 23, sps=2, nblocks=2048))


def main():
    setup_cache()
    for name, fn in [("wfm_stages", wfm_stages),
                     ("topblock", topblock_bench),
                     ("dvbt", dvbt_profile),
                     ("ofdm", ofdm_profile),
                     ("trackers", trackers)]:
        sect(name)
        t0 = time.time()
        try:
            fn()
        except Exception:
            import traceback
            J(section=name, error=traceback.format_exc()[-600:])
        J(section=name, wall_s=round(time.time() - t0, 1))


if __name__ == "__main__":
    main()
