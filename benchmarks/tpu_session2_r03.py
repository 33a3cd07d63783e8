"""TPU session 2: calibration + post-relayout re-profiles.

1. HBM calibration at bench-relevant sizes (what IS the ceiling for a
   268 MB streaming pass on this deployment?)
2. folded fused WBFM chain, R sweep (incl. 256/512)
3. composed TopBlock graph: device-step-only timing + stage prefixes
4. DVB-T TX re-profile after the one-hot-matmul relayouts
5. OFDM loopback re-profile (B=4096) after serialize/allocate matmuls

Run: nohup python -u benchmarks/tpu_session2_r03.py > /tmp/tpu_s2.log 2>&1 &
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from benchmarks.bench_util import setup_cache, sync, time_fn, time_fn_carry


def J(**kw):
    print(json.dumps(kw), flush=True)


def hbm_calibration():
    import jax
    import jax.numpy as jnp
    for mb in (64, 256, 1024):
        n = mb * (1 << 20) // 4
        x = jax.jit(lambda: jax.random.normal(
            jax.random.PRNGKey(0), (n,), dtype="float32"))()
        f = jax.jit(lambda v: v * 1.000001 + 0.5)
        dt = time_fn(f, x, iters=10)
        J(cal=f"copy_{mb}MB", dt_ms=round(dt * 1e3, 3),
          eff_gbps=round(2 * n * 4 / dt / 1e9, 1))
    # read 2 planes of 2^25, write 2^23 (front-kernel IO shape)
    n = 1 << 25
    x = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(1), (n, 2), dtype="float32"))()
    g = jax.jit(lambda v: (v[::4, 0] + v[::4, 1]))
    # strided — use reshape form instead
    g2 = jax.jit(lambda v: jnp.sum(v.reshape(-1, 4, 2), axis=(1, 2)))
    dt = time_fn(g2, x, iters=10)
    J(cal="read268MB_write33MB", dt_ms=round(dt * 1e3, 3),
      eff_gbps=round((n * 8 + n) / dt / 1e9, 1))


def wfm_folded():
    import jax
    from gnuradio_tpu.models.wfm import make_wfm_step_fused
    n = 1 << 25
    iq = jax.jit(lambda: 0.5 * jax.random.normal(
        jax.random.PRNGKey(0), (n, 2), dtype="float32"))()
    for R in (128, 256, 512):
        try:
            init, step, mult = make_wfm_step_fused(1e6, 250e3, 50e3, R=R)
            run = jax.jit(step)
            st = jax.jit(init)()
            dt = time_fn_carry(run, st, iq, iters=10)
            J(stage=f"folded_fused_R{R}", dt_ms=round(dt * 1e3, 3),
              msps=round(n / dt / 1e6, 1))
        except Exception as e:
            J(stage=f"folded_fused_R{R}", error=repr(e)[:300])


def topblock_stages():
    import jax
    import jax.numpy as jnp
    from gnuradio_tpu.core.graph import Flowgraph
    from gnuradio_tpu.core.runtime import TopBlock
    from gnuradio_tpu.core.stream import PortSpec, F, C
    from gnuradio_tpu.ops.analog import (noise_source_c, fm_deemph,
                                         quadrature_demod_cf)
    from gnuradio_tpu.ops.blocks import null_sink
    from gnuradio_tpu.ops.filter import (fir_filter_fff,
                                         freq_xlating_fir_filter_ccf)
    from gnuradio_tpu.models.wfm import channel_taps, wfm_taps

    def build(n_stages):
        src = noise_source_c("gaussian", 0.5, seed=1)
        chain = [src]
        if n_stages >= 1:
            chain.append(freq_xlating_fir_filter_ccf(
                4, channel_taps(1e6, 250e3), 0.0, 1e6))
        if n_stages >= 2:
            chain.append(quadrature_demod_cf(0.53))
        if n_stages >= 3:
            chain.append(fir_filter_fff(5, wfm_taps(250e3, 50e3)))
        if n_stages >= 4:
            chain.append(fm_deemph(50e3, 75e-6))
        last_c = n_stages < 2
        chain.append(null_sink(C if last_c else F))
        fg = Flowgraph()
        fg.connect(*chain)
        tb = TopBlock(fg, target_items=1 << 22)
        return tb

    for ns in (0, 1, 2, 3, 4):
        tb = build(ns)
        cg = tb.compile()
        st = cg.init_state()
        dt = time_fn_carry(lambda s, _: cg.step(s, {}), st, None, iters=10)
        J(tb_stages=ns, device_step_ms=round(dt * 1e3, 3))
    # full graph through tb.run (host loop included)
    tb = build(4)
    tb.run(n_steps=2)
    sync(tb.state)
    t0 = time.perf_counter()
    tb.run(n_steps=10)
    sync(tb.state)
    J(tb_full_run_ms=round((time.perf_counter() - t0) / 10 * 1e3, 3))


def dvbt_reprofile():
    import jax
    import jax.numpy as jnp
    from gnuradio_tpu.ops import dtv
    cfg = dtv.DVBTConfig()
    pil = dtv.DVBTPilots(cfg)
    nb1 = dtv.dvbt_tx_bytes_per_superframe(cfg)
    k0 = next(k for k in range(1, 9) if (k * nb1) % 1504 == 0)
    for mult in (1, 4):
        nb = nb1 * k0 * mult
        rng = np.random.default_rng(0)
        ts = jnp.asarray(rng.integers(0, 256, nb).astype(np.int8))
        full = jax.jit(lambda b: dtv.dvbt_tx(b, cfg, pil))
        out = full(ts)
        n_out = int(out.shape[0])
        dt = time_fn(full, ts, iters=10)
        J(dvbt=f"full_x{mult}", dt_ms=round(dt * 1e3, 3),
          msps=round(n_out / dt / 1e6, 2))
    # stage spot checks
    ts = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, nb1 * k0).astype(np.int8))
    x = jax.jit(dtv.energy_dispersal)(ts)
    x = jax.jit(dtv.rs_encode_packets)(x)
    x = jax.jit(lambda v: dtv.conv_interleave(
        v.reshape(-1), dtv.conv_interleaver_init())[0])(x)
    b = jax.jit(dtv.bytes_to_bits)(x)
    cb = jax.jit(lambda v: dtv.inner_code_bits(v, cfg.code_rate))(b)
    sy = jax.jit(lambda v: dtv.bits_to_symbols(v, cfg.m))(cb)
    bi = jax.jit(lambda v: dtv.bit_inner_interleave(v, cfg.m))(sy)
    nsym = bi.shape[0] // cfg.payload_length
    bi2 = bi.reshape(nsym, cfg.payload_length)
    si = jax.jit(lambda v: dtv.symbol_interleave(v, cfg.mode))(bi2)
    pts = jax.jit(lambda v: dtv.dvbt_map(v, cfg))(si)
    for name, fn, arg in [
        ("symbol_interleave", lambda v: dtv.symbol_interleave(v, cfg.mode),
         bi2),
        ("pilots_insert", pil.insert, pts),
    ]:
        dt = time_fn(jax.jit(fn), arg, iters=10)
        J(dvbt_stage=name, dt_ms=round(dt * 1e3, 3))


def ofdm_reprofile():
    import jax
    import jax.numpy as jnp
    from gnuradio_tpu.models.ofdm import ofdm_rx_burst, ofdm_tx_burst
    from gnuradio_tpu.ops import ofdm as O
    n_occ = len(O.default_occupied_carriers(64))
    nf = 8
    rng = np.random.default_rng(0)
    for B in (1024, 4096):
        idx = jnp.asarray(rng.integers(0, 4, (B, nf * n_occ)
                                       ).astype(np.int32))

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
        J(ofdm=f"loopback_B{B}", dt_ms=round(dt * 1e3, 3),
          msps=round(B * burst_len / dt / 1e6, 1))


def main():
    setup_cache()
    for name, fn in [("hbm", hbm_calibration), ("wfm", wfm_folded),
                     ("topblock", topblock_stages),
                     ("dvbt", dvbt_reprofile), ("ofdm", ofdm_reprofile)]:
        print(f"### {name}", flush=True)
        t0 = time.time()
        try:
            fn()
        except Exception:
            import traceback
            J(section=name, error=traceback.format_exc()[-600:])
        J(section=name, wall_s=round(time.time() - t0, 1))


if __name__ == "__main__":
    main()
