"""QA for the GRC analog: YAML load, run, and codegen round trip
(grc/tests platform-load + generator round-trip pattern)."""
import subprocess
import sys

import numpy as np

from gnuradio_tpu import grc

SIMPLE = """
name: simple
blocks:
  - {id: src, type: vector_source_f, params: {data: [1.0, -2.0, 3.0]}}
  - {id: snk, type: vector_sink_f}
connections:
  - [src, 0, snk, 0]
"""


def test_registry_has_core_blocks():
    reg = grc.registry()
    for name in ["vector_source_c", "fir_filter_ccf", "quadrature_demod_cf",
                 "pfb_channelizer_ccf", "vector_sink_f", "add",
                 "costas_loop_cc", "fft_vcc"]:
        assert name in reg, name


def test_load_and_run_simple():
    tb, blocks = grc.load(SIMPLE)
    tb.run()
    np.testing.assert_allclose(blocks["snk"].data(), [1.0, -2.0, 3.0])


def test_generate_emits_runnable_code(tmp_path):
    out = tmp_path / "gen_simple.py"
    code = grc.generate(SIMPLE, str(out))
    assert "def make_simple" in code
    ns = {}
    exec(compile(code, str(out), "exec"), ns)
    tb, blocks = ns["make_simple"]()
    tb.run()
    np.testing.assert_allclose(blocks["snk"].data(), [1.0, -2.0, 3.0])


def test_grcc_cli(tmp_path):
    graph = tmp_path / "g.yml"
    graph.write_text(SIMPLE)
    out = tmp_path / "gen.py"
    r = subprocess.run([sys.executable, "-m", "gnuradio_tpu.grc",
                        str(graph), "-o", str(out)],
                       capture_output=True, cwd="/root/repo", timeout=120)
    assert r.returncode == 0, r.stderr
    assert out.exists() and "TopBlock" in out.read_text()


def test_unknown_block_type_errors():
    import pytest
    bad = SIMPLE.replace("vector_source_f", "no_such_block")
    with pytest.raises(ValueError, match="unknown block type"):
        grc.load(bad)
