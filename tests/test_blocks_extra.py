"""QA for the extended gr-blocks catalog (blocks_extra)."""
import numpy as np
import jax.numpy as jnp
import pytest

from gnuradio_tpu import Flowgraph, TopBlock
from gnuradio_tpu.ops import blocks as blk
from gnuradio_tpu.ops import blocks_extra as bx


def run_graph(*chain):
    fg = Flowgraph()
    fg.connect(*chain)
    TopBlock(fg).run()


def test_logic_ops(rng):
    a = rng.integers(0, 128, 256).astype(np.int8)
    b = rng.integers(0, 128, 256).astype(np.int8)
    for factory, op in [(bx.and_bb, np.bitwise_and), (bx.or_bb, np.bitwise_or),
                        (bx.xor_bb, np.bitwise_xor)]:
        sa = blk.vector_source(a, dtype=jnp.int8)
        sb = blk.vector_source(b, dtype=jnp.int8)
        g = factory(2)
        snk = blk.vector_sink_b()
        fg = Flowgraph()
        fg.connect(sa, (g, 0))
        fg.connect(sb, (g, 1))
        fg.connect(g, snk)
        TopBlock(fg).run()
        assert (snk.data() == op(a, b)).all()


def test_count_bits(rng):
    x = rng.integers(0, 2**20, 128).astype(np.int32)
    src = blk.vector_source(x, dtype=jnp.int32)
    cb = bx.count_bits()
    snk = blk.vector_sink_i()
    run_graph(src, cb, snk)
    want = np.array([bin(int(v) & 0xFFFFFFFF).count("1") for v in x])
    assert (snk.data() == want).all()


def test_endian_swap():
    x = np.array([0x01020304, 0x0A0B0C0D], np.int32)
    src = blk.vector_source(x, dtype=jnp.int32)
    es = bx.endian_swap(jnp.int32)
    snk = blk.vector_sink_i()
    run_graph(src, es, snk)
    want = x.byteswap()
    assert (snk.data() == want).all()


def test_max_min(rng):
    a = rng.standard_normal(512).astype(np.float32)
    b = rng.standard_normal(512).astype(np.float32)
    for factory, op in [(bx.max_ff, np.maximum), (bx.min_ff, np.minimum)]:
        sa = blk.vector_source(a, dtype=jnp.float32)
        sb = blk.vector_source(b, dtype=jnp.float32)
        g = factory(2)
        snk = blk.vector_sink_f()
        fg = Flowgraph()
        fg.connect(sa, (g, 0))
        fg.connect(sb, (g, 1))
        fg.connect(g, snk)
        TopBlock(fg).run()
        np.testing.assert_allclose(snk.data(), op(a, b))


def test_argmax(rng):
    x = rng.standard_normal((64, 16)).astype(np.float32)
    src = blk.vector_source(x, dtype=jnp.float32, vlen=16)
    am = bx.argmax_fs(16)
    snk = blk.vector_sink_s()
    run_graph(src, am, snk)
    assert (snk.data() == x.argmax(axis=1)).all()


def test_transcendental(rng):
    x = np.abs(rng.standard_normal(256)).astype(np.float32) + 0.1
    src = blk.vector_source(x, dtype=jnp.float32)
    t = bx.transcendental("log", jnp.float32)
    snk = blk.vector_sink_f()
    run_graph(src, t, snk)
    np.testing.assert_allclose(snk.data(), np.log(x), rtol=1e-6)


def test_multiply_matrix(rng):
    A = np.array([[1.0, 2.0], [0.5, -1.0], [3.0, 0.0]], np.float32)
    x0 = rng.standard_normal(128).astype(np.float32)
    x1 = rng.standard_normal(128).astype(np.float32)
    s0 = blk.vector_source(x0, dtype=jnp.float32)
    s1 = blk.vector_source(x1, dtype=jnp.float32)
    mm = bx.multiply_matrix_ff(A)
    sinks = [blk.vector_sink_f() for _ in range(3)]
    fg = Flowgraph()
    fg.connect(s0, (mm, 0))
    fg.connect(s1, (mm, 1))
    for m, sk in enumerate(sinks):
        fg.connect((mm, m), sk)
    TopBlock(fg).run()
    X = np.stack([x0, x1])
    for m, sk in enumerate(sinks):
        np.testing.assert_allclose(sk.data(), (A @ X)[m], rtol=1e-5)


def test_magphase_roundtrip(rng):
    x = (rng.standard_normal(256) + 1j * rng.standard_normal(256)
         ).astype(np.complex64)
    src = blk.vector_source(x)
    c2mp = bx.complex_to_magphase()
    mp2c = bx.magphase_to_complex()
    snk = blk.vector_sink_c()
    fg = Flowgraph()
    fg.connect(src, c2mp)
    fg.connect((c2mp, 0), (mp2c, 0))
    fg.connect((c2mp, 1), (mp2c, 1))
    fg.connect(mp2c, snk)
    TopBlock(fg).run()
    np.testing.assert_allclose(snk.data(), x, atol=1e-5)


def test_sample_and_hold(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    ctrl = (rng.random(1000) < 0.1).astype(np.int8)
    ctrl[0] = 1
    sx = blk.vector_source(x, dtype=jnp.float32)
    sc = blk.vector_source(ctrl, dtype=jnp.int8)
    sh = bx.sample_and_hold_ff()
    snk = blk.vector_sink_f()
    fg = Flowgraph()
    fg.connect(sx, (sh, 0))
    fg.connect(sc, (sh, 1))
    fg.connect(sh, snk)
    TopBlock(fg).run()
    want = np.zeros_like(x)
    held = 0.0
    for i in range(len(x)):
        if ctrl[i]:
            held = x[i]
        want[i] = held
    np.testing.assert_allclose(snk.data(), want)


def test_threshold_hysteresis():
    x = np.array([0, 0.2, 0.6, 0.9, 0.5, 0.3, 0.05, 0.5, 0.95, 0.2, 0.05],
                 np.float32)
    src = blk.vector_source(x, dtype=jnp.float32)
    th = bx.threshold_ff(0.1, 0.8)
    snk = blk.vector_sink_f()
    run_graph(src, th, snk)
    # scalar golden
    want, out = [], 0.0
    for v in x:
        if v > 0.8:
            out = 1.0
        elif v < 0.1:
            out = 0.0
        want.append(out)
    np.testing.assert_allclose(snk.data(), want)


def test_plateau_detector():
    x = np.zeros(100, np.float32)
    x[30:45] = 1.0
    src = blk.vector_source(x, dtype=jnp.float32)
    pd = bx.plateau_detector_fb(10, 0.5)
    snk = blk.vector_sink_b()
    run_graph(src, pd, snk)
    out = snk.data()
    assert out[39] == 1  # fires when run length hits 10 (index 30+10-1)
    assert out.sum() == 1


def test_mute_and_selector(rng):
    x = rng.standard_normal(256).astype(np.float32)
    src = blk.vector_source(x, dtype=jnp.float32)
    m = bx.mute_ff(mute=True)
    snk = blk.vector_sink_f()
    run_graph(src, m, snk)
    assert (snk.data() == 0).all()

    a = rng.standard_normal(128).astype(np.float32)
    b = rng.standard_normal(128).astype(np.float32)
    sa = blk.vector_source(a, dtype=jnp.float32)
    sb = blk.vector_source(b, dtype=jnp.float32)
    sel = bx.selector(2, input_index=1, dtype=jnp.float32)
    snk2 = blk.vector_sink_f()
    fg = Flowgraph()
    fg.connect(sa, (sel, 0))
    fg.connect(sb, (sel, 1))
    fg.connect(sel, snk2)
    TopBlock(fg).run()
    np.testing.assert_allclose(snk2.data(), b)


def test_stream_mux(rng):
    a = rng.standard_normal(60).astype(np.float32)
    b = rng.standard_normal(40).astype(np.float32)
    sa = blk.vector_source(a, dtype=jnp.float32)
    sb = blk.vector_source(b, dtype=jnp.float32)
    mux = bx.stream_mux([3, 2], dtype=jnp.float32)
    snk = blk.vector_sink_f()
    fg = Flowgraph()
    fg.connect(sa, (mux, 0))
    fg.connect(sb, (mux, 1))
    fg.connect(mux, snk)
    TopBlock(fg).run()
    out = snk.data()
    want = []
    ia = ib = 0
    while ia < 60 and ib < 40:
        want += list(a[ia:ia + 3]) + list(b[ib:ib + 2])
        ia += 3
        ib += 2
    np.testing.assert_allclose(out[:len(want)], want)


def test_patterned_interleaver(rng):
    a = np.arange(100, dtype=np.float32)
    b = -np.arange(50, dtype=np.float32)
    sa = blk.vector_source(a, dtype=jnp.float32)
    sb = blk.vector_source(b, dtype=jnp.float32)
    pi = bx.patterned_interleaver([0, 0, 1, 0, 0, 1], dtype=jnp.float32)
    snk = blk.vector_sink_f()
    fg = Flowgraph()
    fg.connect(sa, (pi, 0))
    fg.connect(sb, (pi, 1))
    fg.connect(pi, snk)
    TopBlock(fg).run()
    out = snk.data()
    np.testing.assert_allclose(out[:6], [0, 1, -0.0, 2, 3, -1.0])


def test_packed_unpacked_roundtrip(rng):
    data = rng.integers(0, 256, 64).astype(np.uint8).view(np.int8)
    src = blk.vector_source(data, dtype=jnp.int8)
    p2u = bx.packed_to_unpacked_bb(2)
    u2p = bx.unpacked_to_packed_bb(2)
    snk = blk.vector_sink_b()
    run_graph(src, p2u, u2p, snk)
    assert (snk.data() == data).all()


def test_repack_bits(rng):
    x = rng.integers(0, 4, 96).astype(np.int8)  # 2-bit items
    src = blk.vector_source(x, dtype=jnp.int8)
    rp = bx.repack_bits_bb(2, 3)
    snk = blk.vector_sink_b()
    run_graph(src, rp, snk)
    bits = np.concatenate([[(v >> 1) & 1, v & 1] for v in x])
    want = [int("".join(map(str, bits[i:i + 3])), 2)
            for i in range(0, len(bits), 3)]
    assert (snk.data() == want).all()


def test_rotator_cc(rng):
    x = np.ones(4096, np.complex64)
    w = 0.01
    src = blk.vector_source(x)
    rot = bx.rotator_cc(w)
    snk = blk.vector_sink_c()
    TopBlock_ = TopBlock
    fg = Flowgraph()
    fg.connect(src, rot, snk)
    TopBlock_(fg, target_items=1024).run()  # multiple chunks: phase carries
    out = snk.data()
    want = np.exp(1j * w * np.arange(4096)).astype(np.complex64)
    np.testing.assert_allclose(out, want, atol=1e-4)


def test_vco_c(rng):
    ctrl = np.full(2048, 0.5, np.float32)
    sens = 0.02
    src = blk.vector_source(ctrl, dtype=jnp.float32)
    v = bx.vco_c(sens)
    snk = blk.vector_sink_c()
    fg = Flowgraph()
    fg.connect(src, v, snk)
    TopBlock(fg, target_items=512).run()
    out = snk.data()
    want = np.exp(1j * sens * 0.5 * np.arange(1, 2049))
    np.testing.assert_allclose(out, want.astype(np.complex64), atol=1e-3)


def test_correctiq_removes_dc(rng):
    x = (rng.standard_normal(50_000) + 1j * rng.standard_normal(50_000)
         ).astype(np.complex64) + (0.5 - 0.25j)
    src = blk.vector_source(x)
    ciq = bx.correctiq(rate=1e-3)
    snk = blk.vector_sink_c()
    run_graph(src, ciq, snk)
    out = snk.data()
    tail = out[20_000:]
    assert abs(tail.mean()) < 0.02  # DC removed in steady state


def test_device_cycle_source_tile_and_slice():
    """DeviceCycleSource cycles a device-resident buffer with zero per-step
    host traffic (mp-sched null/synthetic source analog; used by
    benchmarks/bench_topblock.py for the composed-path overhead number)."""
    buf = (np.arange(12) + 1j * np.arange(12)).astype(np.complex64)
    src = blk.device_cycle_source(buf)         # L=12 < n=24: tile path
    snk = blk.vector_sink_c()
    fg = Flowgraph()
    fg.connect(src, snk)
    TopBlock(fg, chunk_mult=24).run(n_steps=2)
    np.testing.assert_allclose(snk.data(), np.tile(buf, 4))

    buf2 = np.arange(40).astype(np.float32)    # L=40 > n=24: doubled slice
    src2 = blk.device_cycle_source(buf2)
    snk2 = blk.vector_sink_f()
    fg2 = Flowgraph()
    fg2.connect(src2, snk2)
    TopBlock(fg2, chunk_mult=24).run(n_steps=3)
    want = np.array([buf2[i % 40] for i in range(72)], np.float32)
    np.testing.assert_allclose(snk2.data(), want)
