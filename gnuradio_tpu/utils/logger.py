"""Logging: per-block dual loggers configured from prefs.

Reference parity: gr::logger (gnuradio-runtime/include/gnuradio/logger.h:
28-120) — every block owns `d_logger` + `d_debug_logger` (log4cpp), levels
set from the prefs [LOG] section (gnuradio-runtime.conf.in). Here the
backend is stdlib logging; the [log] section keys `log_level` and
`debug_level` configure the two hierarchies, `log_file` adds a file handler.
"""
from __future__ import annotations

import logging
import sys

from .prefs import prefs

_configured = False


def _configure():
    global _configured
    if _configured:
        return
    _configured = True
    p = prefs()
    level = p.get_string("log", "log_level", "info").upper()
    dlevel = p.get_string("log", "debug_level", "warning").upper()
    fmt = logging.Formatter(
        "%(asctime)s :%(levelname)s: %(name)s - %(message)s")
    for root_name, lvl in [("gr", level), ("gr.debug", dlevel)]:
        lg = logging.getLogger(root_name)
        lg.setLevel(getattr(logging, lvl, logging.INFO))
        if not lg.handlers:
            h = logging.StreamHandler(sys.stderr)
            h.setFormatter(fmt)
            lg.addHandler(h)
            lg.propagate = False
    logfile = p.get_string("log", "log_file", "")
    if logfile and logfile not in ("stderr", "stdout"):
        fh = logging.FileHandler(logfile)
        fh.setFormatter(fmt)
        logging.getLogger("gr").addHandler(fh)


def get_logger(name: str) -> logging.Logger:
    """d_logger analog for a block/module name."""
    _configure()
    return logging.getLogger(f"gr.{name}")


def get_debug_logger(name: str) -> logging.Logger:
    """d_debug_logger analog."""
    _configure()
    return logging.getLogger(f"gr.debug.{name}")


def set_level(name: str, level: str):
    """block.set_log_level analog."""
    logging.getLogger(f"gr.{name}").setLevel(
        getattr(logging, level.upper(), logging.INFO))
