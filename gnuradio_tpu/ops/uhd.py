"""gr-uhd analog: SDR hardware source/sink seam.

Reference parity: gr-uhd/lib/usrp_source_impl.cc / usrp_sink_impl.cc —
device-backed streaming blocks with tuning/gain/rate control, timed
commands, and stream tags (rx_time/rx_rate/rx_freq). No UHD driver exists
in this environment, so the device layer is a registry: the default
`loopback` backend serves IQ from a host array or file (the hardware-less
QA pattern), and real radio backends register a driver implementing
RadioBackend. The block API mirrors usrp_source/usrp_sink so flowgraphs
port unchanged.
"""
from __future__ import annotations

import numpy as np

from ..core.block import SinkBlock
from ..core.stream import PortSpec, C
from ..core.tags import Tag
from .blocks import StreamSource


class RadioBackend:
    """Driver interface: implement and register for real hardware."""

    def recv(self, nsamps: int) -> np.ndarray:
        raise NotImplementedError

    def send(self, samples: np.ndarray):
        raise NotImplementedError

    def set_samp_rate(self, rate: float):
        pass

    def set_center_freq(self, freq: float, chan: int = 0):
        pass

    def set_gain(self, gain: float, chan: int = 0):
        pass


_BACKENDS: dict = {}


def register_backend(name: str, factory):
    _BACKENDS[name] = factory


class LoopbackBackend(RadioBackend):
    """Hardware-less backend: serves from a host array (or .cfile path)."""

    def __init__(self, data=None, path: str | None = None):
        if data is None and path:
            data = np.fromfile(path, np.complex64)
        self.data = np.asarray(data if data is not None else [],
                               np.complex64)
        self.pos = 0
        self.samp_rate = 1e6
        self.center_freq = 0.0
        self.gain = 0.0
        self.sent: list = []

    def recv(self, nsamps):
        chunk = self.data[self.pos:self.pos + nsamps]
        self.pos += len(chunk)
        return chunk

    def send(self, samples):
        self.sent.append(np.asarray(samples))

    def set_samp_rate(self, rate):
        self.samp_rate = float(rate)

    def set_center_freq(self, freq, chan=0):
        self.center_freq = float(freq)

    def set_gain(self, gain, chan=0):
        self.gain = float(gain)


register_backend("loopback", LoopbackBackend)


class UsrpSource(StreamSource):
    """usrp_source analog: streams IQ from the backend; emits rx_time /
    rx_rate / rx_freq tags at stream start like the reference."""

    def __init__(self, backend: RadioBackend | None = None,
                 samp_rate: float = 1e6, center_freq: float = 0.0,
                 gain: float = 0.0, name=None):
        self.backend = backend or LoopbackBackend()
        self.backend.set_samp_rate(samp_rate)
        self.backend.set_center_freq(center_freq)
        self.backend.set_gain(gain)
        self._samp_rate = samp_rate
        self._center_freq = center_freq
        data = getattr(self.backend, "data", np.zeros(0, np.complex64))
        tags = [Tag(0, "rx_rate", samp_rate, "usrp_source"),
                Tag(0, "rx_freq", center_freq, "usrp_source"),
                Tag(0, "rx_time", (0, 0.0), "usrp_source")]
        super().__init__(data, PortSpec(C), repeat=False, name=name,
                         tags=tags)

    # control surface (usrp_block_impl.cc)
    def set_samp_rate(self, rate):
        self._samp_rate = rate
        self.backend.set_samp_rate(rate)

    def get_samp_rate(self):
        return self._samp_rate

    def set_center_freq(self, freq, chan=0):
        self._center_freq = freq
        self.backend.set_center_freq(freq, chan)
        return freq

    def get_center_freq(self, chan=0):
        return self._center_freq

    def set_gain(self, gain, chan=0):
        self.backend.set_gain(gain, chan)


class UsrpSink(SinkBlock):
    """usrp_sink analog: forwards chunks to the backend transmitter."""

    def __init__(self, backend: RadioBackend | None = None,
                 samp_rate: float = 1e6, center_freq: float = 0.0,
                 gain: float = 0.0, name=None):
        super().__init__(PortSpec(C), name)
        self.backend = backend or LoopbackBackend()
        self.backend.set_samp_rate(samp_rate)
        self.backend.set_center_freq(center_freq)
        self.backend.set_gain(gain)
        self._buf: list = []

    def collect(self, value):
        # buffer; the runner's trim() tells us the exact item count (the
        # final chunk arrives zero-padded to the static step size)
        self._buf.append(np.asarray(value))

    def trim(self, n_items: int):
        data = np.concatenate(self._buf) if self._buf else np.zeros(
            0, np.complex64)
        self.backend.send(data[:n_items])
        self._buf = []

    def set_center_freq(self, freq, chan=0):
        self.backend.set_center_freq(freq, chan)
        return freq


def usrp_source(backend=None, samp_rate=1e6, center_freq=0.0, gain=0.0):
    return UsrpSource(backend, samp_rate, center_freq, gain)


def usrp_sink(backend=None, samp_rate=1e6, center_freq=0.0, gain=0.0):
    return UsrpSink(backend, samp_rate, center_freq, gain)
