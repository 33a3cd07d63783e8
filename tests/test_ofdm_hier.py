"""digital_ofdm_tx/rx hier QA (round 4): fixed-packet loopback byte-exact
through channel_model, and ofdm_loopback.grc runs through the importer."""
import numpy as np
import jax.numpy as jnp

from gnuradio_tpu.core.graph import Flowgraph
from gnuradio_tpu.core.runtime import TopBlock
from gnuradio_tpu.core.stream import PortSpec
from gnuradio_tpu.ops.blocks import StreamSource, vector_sink_b
from gnuradio_tpu.ops.channels import channel_model
from gnuradio_tpu.ops.ofdm_hier import ofdm_rx, ofdm_tx


def test_ofdm_hier_loopback_channel(rng):
    plen, npkt = 50, 24
    data = rng.integers(0, 256, plen * npkt).astype(np.uint8).view(np.int8)
    fg = Flowgraph()
    src = StreamSource(data, out_port=PortSpec(jnp.int8))
    tx = ofdm_tx(packet_len=plen)
    # burst rms is ~0.112 (IFFT 1/N scaling: sqrt(48)/64), so 0.005 noise
    # voltage is ~27 dB SNR — comfortable for QPSK with a one-shot LS
    # channel estimate; CFO 0.002 rad/sample is inside S&C pull-in.
    ch = channel_model(noise_voltage=0.005, frequency_offset=0.002)
    rx = ofdm_rx(packet_len=plen)
    snk = vector_sink_b()
    fg.connect(src, tx, ch, rx, snk)
    TopBlock(fg).run()
    out = np.asarray(snk.data()).astype(np.uint8)
    want = data.view(np.uint8)
    assert out.size == want.size
    assert np.array_equal(out, want)


def test_ofdm_loopback_grc_runs(tmp_path):
    from gnuradio_tpu.grc_import import load_reference_grc
    tb, blocks = load_reference_grc(
        "/root/reference/gr-digital/examples/ofdm/ofdm_loopback.grc")
    assert "digital_ofdm_tx_0" in blocks and "digital_ofdm_rx_0" in blocks
    tb.run(n_steps=1)
