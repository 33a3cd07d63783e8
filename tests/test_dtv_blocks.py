"""QA: DVB-T TX stage blocks (ops/dtv_blocks.py) — the composed TopBlock
graph must be byte/sample-exact against the fused functional chain
(ops/dtv.dvbt_tx), mirroring the reference's loopback QA discipline."""
import numpy as np
import jax
import jax.numpy as jnp

from gnuradio_tpu.core.graph import Flowgraph
from gnuradio_tpu.core.runtime import TopBlock
from gnuradio_tpu.core.stream import PortSpec, B, C
from gnuradio_tpu.ops import dtv
from gnuradio_tpu.ops.blocks import StreamSource, VectorSink
from gnuradio_tpu.ops.dtv_blocks import (
    DvbtBitInnerInterleaver, DvbtConvolutionalInterleaver,
    DvbtCyclicPrefixer, DvbtEnergyDispersal, DvbtInnerCoder, DvbtMap,
    DvbtReedSolomonEnc, DvbtReferenceSignals, DvbtSymbolInnerInterleaver)


def test_dvbt_tx_block_graph_matches_functional(rng):
    cfg = dtv.DVBTConfig()   # 2k 16QAM 1/2
    pil = dtv.DVBTPilots(cfg)
    nb1 = dtv.dvbt_tx_bytes_per_superframe(cfg)
    k = next(k for k in range(1, 9) if (k * nb1) % 1504 == 0)
    nb = nb1 * k
    ts = rng.integers(0, 256, nb).astype(np.uint8)
    ref = np.asarray(jax.jit(
        lambda b: dtv.dvbt_tx(b, cfg, pil))(jnp.asarray(ts.view(np.int8))))

    # conv interleaver delays the byte stream by I*M*(I-1); the functional
    # chain consumes its own output immediately — the graph form is
    # identical because both start from a zero tail
    src = StreamSource(ts.view(np.int8), out_port=PortSpec(B))
    snk = VectorSink(PortSpec(C))
    fg = Flowgraph()
    fg.connect(src, DvbtEnergyDispersal(), DvbtReedSolomonEnc(),
               DvbtConvolutionalInterleaver(), DvbtInnerCoder(cfg),
               DvbtBitInnerInterleaver(cfg), DvbtSymbolInnerInterleaver(cfg),
               DvbtMap(cfg), DvbtReferenceSignals(cfg),
               DvbtCyclicPrefixer(cfg.fft_length, cfg.guard_length), snk)
    tb = TopBlock(fg)
    tb.run()
    got = np.asarray(snk.data())
    assert got.shape[0] >= ref.shape[0] * (k - 1) // k  # at least k-1 sf
    m = min(len(got), len(ref))
    assert m > 0
    np.testing.assert_allclose(got[:m], ref[:m], rtol=2e-5, atol=2e-5)
