"""Per-stage chip profile of the DVB-T TX chain (VERDICT r03 item #4 prep):
times each stage of ops/dtv.dvbt_tx separately to find the 14.6 ms.

Run: nohup python -u benchmarks/profile_dvbt.py > /tmp/profile_dvbt.log 2>&1 &
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from benchmarks.bench_util import setup_cache, time_fn


def main():
    setup_cache()
    import jax
    import jax.numpy as jnp
    from gnuradio_tpu.ops import dtv, fec
    cfg = dtv.DVBTConfig()
    pil = dtv.DVBTPilots(cfg)
    nb1 = dtv.dvbt_tx_bytes_per_superframe(cfg)
    k = next(k for k in range(1, 9) if (k * nb1) % 1504 == 0)
    nb = nb1 * k
    rng = np.random.default_rng(0)
    ts = jnp.asarray(rng.integers(0, 256, nb).astype(np.int8))

    # build staged inputs by running the chain once
    def full(ts_bytes):
        return dtv.dvbt_tx(ts_bytes, cfg, pil)

    stages = {}
    disp = jax.jit(dtv.energy_dispersal)(ts)
    stages["energy_dispersal"] = (dtv.energy_dispersal, ts)
    coded = jax.jit(dtv.rs_encode_packets)(disp)
    stages["rs_encode"] = (dtv.rs_encode_packets, disp)
    ci = jax.jit(lambda x: dtv.conv_interleave(
        x.reshape(-1), dtv.conv_interleaver_init())[0])
    intl = ci(coded)
    stages["conv_interleave"] = (lambda x: dtv.conv_interleave(
        x.reshape(-1), dtv.conv_interleaver_init())[0], coded)
    bits = jax.jit(dtv.bytes_to_bits)(intl)
    stages["bytes_to_bits"] = (dtv.bytes_to_bits, intl)
    cb = jax.jit(lambda b: dtv.inner_code_bits(b, cfg.code_rate))(bits)
    stages["inner_code"] = (lambda b: dtv.inner_code_bits(b, cfg.code_rate),
                            bits)
    sy = jax.jit(lambda b: dtv.bits_to_symbols(b, cfg.m))(cb)
    stages["bits_to_symbols"] = (lambda b: dtv.bits_to_symbols(b, cfg.m), cb)
    bi = jax.jit(lambda s: dtv.bit_inner_interleave(s, cfg.m))(sy)
    stages["bit_inner_interleave"] = (
        lambda s: dtv.bit_inner_interleave(s, cfg.m), sy)
    nsym = bi.shape[0] // cfg.payload_length
    bi2 = bi.reshape(nsym, cfg.payload_length)
    si = jax.jit(lambda s: dtv.symbol_interleave(s, cfg.mode))(bi2)
    stages["symbol_interleave"] = (
        lambda s: dtv.symbol_interleave(s, cfg.mode), bi2)
    pts = jax.jit(lambda s: dtv.dvbt_map(s, cfg))(si)
    stages["dvbt_map"] = (lambda s: dtv.dvbt_map(s, cfg), si)
    grid = jax.jit(pil.insert)(pts)
    stages["pilots_insert"] = (pil.insert, pts)
    td = jax.jit(lambda g: dtv.ofdm_modulate(g, cfg))(grid)
    stages["ofdm_mod"] = (lambda g: dtv.ofdm_modulate(g, cfg), grid)
    stages["cyclic_prefix"] = (
        lambda t: dtv.cyclic_prefix(t, cfg).reshape(-1), td)
    stages["FULL_dvbt_tx"] = (full, ts)

    out = jax.jit(full)(ts)
    n_out = int(out.shape[0])
    results = {"n_ts_bytes": int(nb), "n_out_samples": n_out}
    for name, (fn, arg) in stages.items():
        jfn = jax.jit(fn)
        try:
            dt = time_fn(jfn, arg, iters=10)
            results[name] = round(dt * 1e3, 3)
        except Exception as e:
            results[name] = f"ERR {repr(e)[:120]}"
        print(json.dumps({name: results[name]}), flush=True)
    results["full_msps_out"] = round(
        n_out / results["FULL_dvbt_tx"] / 1e3, 2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
