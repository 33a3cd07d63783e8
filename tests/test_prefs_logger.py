"""QA for prefs (layering + env overrides, prefs.h API) and logging."""
import os

from gnuradio_tpu.utils.prefs import Prefs
from gnuradio_tpu.utils import logger as grlog


def test_prefs_env_override(monkeypatch):
    monkeypatch.setenv("GRTPU_CONF_perfcounters_on", "true")
    monkeypatch.setenv("GRTPU_CONF_log_log_level", "debug")
    p = Prefs()  # fresh instance picks up env
    assert p.get_bool("perfcounters", "on") is True
    assert p.get_string("log", "log_level") == "debug"


def test_prefs_typed_getters_and_save(tmp_path):
    p = Prefs()
    p.set_string("controlport", "on", "1")
    p.set_string("audio", "rate", "48000")
    assert p.get_long("audio", "rate") == 48000
    assert p.get_double("audio", "rate") == 48000.0
    assert p.get_string("missing", "key", "dflt") == "dflt"
    out = p.save(str(tmp_path / "cfg.conf"))
    assert os.path.exists(out)
    assert "audio" in open(out).read()


def test_logger_hierarchies():
    lg = grlog.get_logger("fir_filter0")
    dlg = grlog.get_debug_logger("fir_filter0")
    assert lg.name == "gr.fir_filter0"
    assert dlg.name == "gr.debug.fir_filter0"
    grlog.set_level("fir_filter0", "error")
    import logging
    assert logging.getLogger("gr.fir_filter0").level == logging.ERROR
