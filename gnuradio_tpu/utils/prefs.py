"""Preferences: layered INI config singleton.

Reference parity: gr::prefs (gnuradio-runtime/include/gnuradio/prefs.h:34-127,
lib/prefs.cc): reads `<prefix>/etc/gnuradio/conf.d/*.conf` then
`~/.gnuradio/config.conf`, with `GR_CONF_<SECTION>_<KEY>` environment
overrides; typed getters (get_bool/long/double/string) and save().

Here: `conf.d/*.conf` next to the package (shippable defaults), then
`~/.gnuradio_tpu/config.conf`, then `GRTPU_CONF_<SECTION>_<KEY>` env vars.
"""
from __future__ import annotations

import configparser
import os
import threading

_ENV_PREFIX = "GRTPU_CONF_"


class Prefs:
    _instance = None
    _lock = threading.Lock()

    def __init__(self):
        self._cp = configparser.ConfigParser()
        self._load()

    @classmethod
    def singleton(cls) -> "Prefs":
        with cls._lock:
            if cls._instance is None:
                cls._instance = cls()
            return cls._instance

    # ---- loading ----
    def _load(self):
        paths = []
        pkg_confd = os.path.join(os.path.dirname(__file__), "..", "conf.d")
        if os.path.isdir(pkg_confd):
            paths += sorted(
                os.path.join(pkg_confd, f) for f in os.listdir(pkg_confd)
                if f.endswith(".conf"))
        user = os.path.expanduser("~/.gnuradio_tpu/config.conf")
        if os.path.exists(user):
            paths.append(user)
        self._cp.read(paths)
        # env overrides: GRTPU_CONF_section_key=value
        for k, v in os.environ.items():
            if not k.startswith(_ENV_PREFIX):
                continue
            rest = k[len(_ENV_PREFIX):]
            if "_" not in rest:
                continue
            section, key = rest.split("_", 1)
            section, key = section.lower(), key.lower()
            if not self._cp.has_section(section):
                self._cp.add_section(section)
            self._cp.set(section, key, v)

    # ---- prefs.h API ----
    def has_section(self, section: str) -> bool:
        return self._cp.has_section(section)

    def has_option(self, section: str, option: str) -> bool:
        return self._cp.has_option(section, option)

    def get_string(self, section, option, default=""):
        return self._cp.get(section, option, fallback=default)

    def get_bool(self, section, option, default=False):
        try:
            return self._cp.getboolean(section, option, fallback=default)
        except ValueError:
            return default

    def get_long(self, section, option, default=0):
        try:
            return self._cp.getint(section, option, fallback=default)
        except ValueError:
            return default

    def get_double(self, section, option, default=0.0):
        try:
            return self._cp.getfloat(section, option, fallback=default)
        except ValueError:
            return default

    def set_string(self, section, option, value):
        if not self._cp.has_section(section):
            self._cp.add_section(section)
        self._cp.set(section, option, str(value))

    set_bool = set_long = set_double = set_string

    def save(self, path: str | None = None):
        path = path or os.path.expanduser("~/.gnuradio_tpu/config.conf")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            self._cp.write(f)
        return path

    def to_string(self) -> str:
        import io
        buf = io.StringIO()
        self._cp.write(buf)
        return buf.getvalue()


def prefs() -> Prefs:
    return Prefs.singleton()
