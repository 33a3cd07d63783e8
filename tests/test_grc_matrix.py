"""GRC interop QA matrix (round-3 item #6): load + run reference in-tree
examples end-to-end through the importer. Also checks the mechanical
adapter layer resolves >= 150 reference block ids."""
import numpy as np
import pytest

from gnuradio_tpu.grc_import import auto_adapter_ids, load_reference_grc

REF = "/root/reference/"

# examples that load and run headless with no external inputs
EXAMPLES = [
    "gr-analog/examples/fm_tx.grc",
    "gr-analog/examples/noise_power.grc",
    "gr-audio/examples/grc/dial_tone.grc",
    "gr-blocks/examples/ctrlport/comparing_resamplers.grc",
    "gr-blocks/examples/ctrlport/usrp_source_control.grc",
    "gr-blocks/examples/peak_detector2.grc",
    "gr-blocks/examples/vector_source_with_tags.grc",
    "gr-channels/examples/channel_tone_response.grc",
    "gr-channels/examples/demo_ofdm.grc",
    "gr-channels/examples/demo_qam.grc",
    "gr-channels/examples/demo_two_tone.grc",
    "gr-dtv/examples/uhd_atsc_capture.grc",
    "gr-filter/examples/polyphase_channelizer_demo.grc",
    "gr-filter/examples/resampler_demo.grc",
    "gr-network/examples/test_udp_sink.grc",
    "gr-network/examples/test_udp_sink_seq.grc",
    "gr-network/examples/test_udp_source.grc",
    "gr-network/examples/test_udp_source_ipv6.grc",
    "gr-qtgui/apps/grc_qt_example.grc",
    "gr-qtgui/examples/qtgui_multi_input.grc",
    "gr-qtgui/examples/qtgui_tags_viewing.grc",
    "gr-qtgui/examples/show_controls.grc",
    "gr-qtgui/examples/show_controls2.grc",
    "gr-qtgui/examples/show_dialgauge1.grc",
    "gr-qtgui/examples/show_dialgauge2.grc",
    "gr-qtgui/examples/test_appbackground.grc",
    "gr-qtgui/examples/test_autocorrelator.grc",
    "gr-qtgui/examples/test_compass.grc",
    "gr-qtgui/examples/test_dialcontrol.grc",
    "gr-qtgui/examples/test_dialcontrol2.grc",
    "gr-qtgui/examples/test_distanceradar.grc",
    "gr-qtgui/examples/test_graphicitem.grc",
    "gr-qtgui/examples/test_graphicscaled.grc",
    "gr-qtgui/examples/test_led.grc",
    "gr-qtgui/examples/test_levelgauge.grc",
    "gr-qtgui/examples/test_msgcheckbox.grc",
    "gr-qtgui/examples/test_msgcheckbox_str.grc",
    "gr-qtgui/examples/test_msgpush.grc",
    "gr-qtgui/examples/test_toggle.grc",
    "gr-qtgui/examples/test_toggleswitch.grc",
    "gr-qtgui/examples/test_toggleswitch2.grc",
    "gr-uhd/examples/grc/uhd_const_wave.grc",
    "gr-uhd/examples/grc/uhd_normalized_gain.grc",
    "gr-uhd/examples/grc/uhd_siggen_gui.grc",
    "grc/tests/resources/test_compiler.grc",
    "grc/tests/resources/test_cpp.grc",
]


@pytest.mark.parametrize("path", EXAMPLES)
def test_reference_example_runs(path):
    tb, blocks = load_reference_grc(REF + path)
    assert len(blocks) >= 2
    tb.run(n_steps=1)


def test_fm_rx_grc_runs(tmp_path):
    """fm_rx.grc sources a recorded IQ file — synthesize one."""
    rng = np.random.default_rng(1)
    n = 1 << 18
    iq = (0.3 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
          ).astype(np.complex64)
    p = tmp_path / "dummy.dat"
    iq.tofile(p)
    tb, blocks = load_reference_grc(
        REF + "gr-analog/examples/fm_rx.grc",
        overrides={"blocks_file_source_0": {"file": str(p)}})
    tb.run(n_steps=1)


def _dvbt_ts_file(tmp_path, cfg):
    from gnuradio_tpu.ops import dtv
    nb1 = dtv.dvbt_tx_bytes_per_superframe(cfg)
    rng = np.random.default_rng(0)
    ts = rng.integers(0, 256, nb1).astype(np.uint8)
    p = tmp_path / "test.ts"
    p.write_bytes(ts.tobytes())
    return str(p), ts


def test_dvbt_tx_8k_grc_runs(tmp_path):
    """BASELINE config #5's .grc (gr-dtv/examples/dvbt_tx_8k.grc:595-605)
    loads through the importer and runs a superframe."""
    from gnuradio_tpu.ops import dtv
    cfg = dtv.DVBTConfig("64qam", "2/3", "8k", "1/32")
    path, ts = _dvbt_ts_file(tmp_path, cfg)
    tb, blocks = load_reference_grc(
        REF + "gr-dtv/examples/dvbt_tx_8k.grc",
        overrides={"blocks_file_source_0": {"file": path}})
    assert "dtv_dvbt_reference_signals_0" in blocks
    tb.run(n_steps=1)


def test_dvbt_tx_2k_grc_runs(tmp_path):
    from gnuradio_tpu.ops import dtv
    cfg = dtv.DVBTConfig("qpsk", "1/2", "2k", "1/32")
    path, ts = _dvbt_ts_file(tmp_path, cfg)
    tb, blocks = load_reference_grc(
        REF + "gr-dtv/examples/dvbt_tx_2k.grc",
        overrides={"blocks_file_source_0": {"file": path}})
    tb.run(n_steps=1)


def test_auto_adapter_coverage():
    ids = auto_adapter_ids()
    assert len(ids) >= 150, f"only {len(ids)} mechanical adapter ids"
