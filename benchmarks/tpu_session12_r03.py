"""TPU session 12: DVB-T TX per-stage dissection.

Run: nohup python -u benchmarks/tpu_session12_r03.py > /tmp/tpu_s12.log 2>&1 &
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
    from gnuradio_tpu.ops import dtv

    cfg = dtv.DVBTConfig()
    pil = dtv.DVBTPilots(cfg)
    nb1 = dtv.dvbt_tx_bytes_per_superframe(cfg)
    k0 = next(k for k in range(1, 9) if (k * nb1) % 1504 == 0)
    nbytes = nb1 * k0 * 4
    rng = np.random.default_rng(0)
    ts = jnp.asarray(rng.integers(0, 256, nbytes).astype(np.int8))

    stages = {}

    @jax.jit
    def s_disp(b):
        return dtv.energy_dispersal(b)
    disp = s_disp(ts)
    J(stage="disp", dt_ms=round(time_fn(s_disp, ts, iters=10)*1e3, 3))

    @jax.jit
    def s_rs(b):
        return dtv.rs_encode_packets(b)
    coded = s_rs(disp)
    J(stage="rs", dt_ms=round(time_fn(s_rs, disp, iters=10)*1e3, 3))

    @jax.jit
    def s_conv(c):
        return dtv.conv_interleave(c.reshape(-1),
                                   dtv.conv_interleaver_init())[0]
    intl = s_conv(coded)
    J(stage="conv_il", dt_ms=round(time_fn(s_conv, coded, iters=10)*1e3, 3))

    @jax.jit
    def s_bits(v):
        return dtv.inner_code_bits(dtv.bytes_to_bits(v), cfg.code_rate)
    cbits = s_bits(intl)
    J(stage="bits+inner_code", dt_ms=round(time_fn(s_bits, intl,
                                                   iters=10)*1e3, 3))

    @jax.jit
    def s_sym(cb):
        syms = dtv.bits_to_symbols(cb, cfg.m)
        syms = dtv.bit_inner_interleave(syms, cfg.m)
        nsym = syms.shape[0] // cfg.payload_length
        return dtv.symbol_interleave(syms.reshape(nsym, cfg.payload_length),
                                     cfg.mode)
    syms = s_sym(cbits)
    J(stage="sym+interleave", dt_ms=round(time_fn(s_sym, cbits,
                                                  iters=10)*1e3, 3))

    @jax.jit
    def s_map(sv):
        return pil.insert(dtv.dvbt_map(sv, cfg))
    grid = s_map(syms)
    J(stage="map+pilots", dt_ms=round(time_fn(s_map, syms, iters=10)*1e3, 3))

    @jax.jit
    def s_ofdm(g):
        return dtv.cyclic_prefix(dtv.ofdm_modulate(g, cfg), cfg).reshape(-1)
    out = s_ofdm(grid)
    J(stage="ifft+cp", dt_ms=round(time_fn(s_ofdm, grid, iters=10)*1e3, 3),
      n_out=int(out.shape[0]))


if __name__ == "__main__":
    main()
