"""TPU session 3: input-layout experiment + TopBlock host-loop dissection.

Run: nohup python -u benchmarks/tpu_session3_r03.py > /tmp/tpu_s3.log 2>&1 &
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from benchmarks.bench_util import setup_cache, sync, time_fn, time_fn_carry


def J(**kw):
    print(json.dumps(kw), flush=True)


def dispatch_floor():
    import jax
    import jax.numpy as jnp
    x = jax.jit(lambda: jnp.zeros(1024, jnp.float32))()
    f = jax.jit(lambda v: v + 1.0)
    dt = time_fn(f, x, iters=50)
    J(cal="tiny_dispatch", dt_ms=round(dt * 1e3, 3))


def layout_experiment():
    import jax
    from gnuradio_tpu.models.wfm import make_wfm_step_fused
    n = 1 << 25
    for layout, shape in (("interleaved", (n, 2)), ("planes", (2, n))):
        init, step, mult = make_wfm_step_fused(1e6, 250e3, 50e3, R=128,
                                               layout=layout)
        run = jax.jit(step)
        iq = jax.jit(lambda: 0.5 * jax.random.normal(
            jax.random.PRNGKey(0), shape, dtype="float32"))()
        st = jax.jit(init)()
        dt = time_fn_carry(run, st, iq, iters=10)
        J(stage=f"fused_{layout}", dt_ms=round(dt * 1e3, 3),
          msps=round(n / dt / 1e6, 1))
    # front kernel alone, planes layout, R sweep
    from gnuradio_tpu.kernels.wfm_fused_pallas import WfmFrontFused
    from gnuradio_tpu.models.wfm import channel_taps
    xr = jax.jit(lambda: 0.5 * jax.random.normal(
        jax.random.PRNGKey(1), (n + 128,), dtype="float32"))()
    xi = jax.jit(lambda: 0.5 * jax.random.normal(
        jax.random.PRNGKey(2), (n + 128,), dtype="float32"))()
    for R in (128, 256, 512):
        front = WfmFrontFused(channel_taps(1e6, 250e3), 0.0, 1e6, 4,
                              0.53, R=R)
        h = front.history
        f = jax.jit(lambda a, b: front(a[:n + h], b[:n + h]))
        dt = time_fn(f, xr, xi, iters=10)
        J(stage=f"front_planes_R{R}", dt_ms=round(dt * 1e3, 3),
          msps_in=round(n / dt / 1e6, 1))


def topblock_dissect():
    import jax
    from benchmarks.bench_topblock import bench_topblock_device
    from gnuradio_tpu.core.graph import Flowgraph
    from gnuradio_tpu.core.runtime import TopBlock
    from gnuradio_tpu.core.stream import F
    from gnuradio_tpu.ops.analog import noise_source_c
    from gnuradio_tpu.ops.blocks import null_sink
    from gnuradio_tpu.models.wfm import WfmRcvFull

    src = noise_source_c("gaussian", 0.5, seed=1)
    rcv = WfmRcvFull(1e6, 250e3, 50e3)
    snk = null_sink(F)
    tb = TopBlock(target_items=1 << 22)
    tb.connect(src, rcv, snk)
    tb.run(n_steps=2)       # compile + warm
    sync(tb.state)
    tb.perf.reset()
    t0 = time.perf_counter()
    tb.run(n_steps=32)
    sync(tb.state)
    wall = (time.perf_counter() - t0) / 32
    J(tb="run32", wall_ms=round(wall * 1e3, 3),
      step_call_ms=round(tb.perf.work_time_avg() * 1e3, 3),
      n=tb.perf.n)


def ofdm_rx_dissect():
    import jax
    import jax.numpy as jnp
    from gnuradio_tpu.models.ofdm import ofdm_tx_burst
    from gnuradio_tpu.ops import ofdm as O
    from gnuradio_tpu.ops.digital import constellation_qpsk
    n_occ = len(O.default_occupied_carriers(64))
    nf, B = 8, 4096
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 4, (B, nf * n_occ)).astype(np.int32))
    iqs = jax.jit(lambda si: jax.vmap(
        lambda s: ofdm_tx_burst(s, 64, 16, pad=32)[0])(si))(idx)
    const = constellation_qpsk()

    def t(name, fn, *args):
        f = jax.jit(fn)
        dt = time_fn(f, *args, iters=10)
        J(ofdm_rx=name, dt_ms=round(dt * 1e3, 3))

    t("metric", lambda x: jax.vmap(
        lambda v: O.schmidl_cox_metric(v, 64)[0])(x), iqs)
    t("detect", lambda x: jax.vmap(
        lambda v: O.schmidl_cox_detect(v, 64, 16)[0])(x), iqs)

    def demod_dyn(x):
        def one(v):
            d, fine = O.schmidl_cox_detect(v, 64, 16)
            n = v.shape[0]
            xc = v * jnp.exp(-1j * fine * jnp.arange(n, dtype=jnp.float32))
            return O.ofdm_demodulate(xc, nf + 2, 64, 16, d)
        return jax.vmap(one)(x)

    t("detect+cfo+demod", demod_dyn, iqs)

    def tail(x):
        F = demod_dyn(x)

        def one(Fb):
            w1, w2 = O.schmidl_cox_preamble(64)
            H = O.ls_channel_estimate(Fb[1], jnp.asarray(w2), 64)
            eq = O.equalize_static(Fb[2:], H)
            syms = O.serialize_carriers(eq, 64)
            return const.decision(syms)
        return jax.vmap(one)(F)

    t("full_rx", tail, iqs)


def main():
    setup_cache()
    for name, fn in [("floor", dispatch_floor),
                     ("layout", layout_experiment),
                     ("ofdm_rx", ofdm_rx_dissect),
                     ("topblock", topblock_dissect)]:
        print(f"### {name}", flush=True)
        try:
            fn()
        except Exception:
            import traceback
            J(section=name, error=traceback.format_exc()[-600:])


if __name__ == "__main__":
    main()
