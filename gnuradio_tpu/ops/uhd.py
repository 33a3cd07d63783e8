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


# --- stream-command model (uhd::stream_cmd_t, usrp_source_impl.cc) --------

STREAM_MODE_START_CONTINUOUS = "start_cont"
STREAM_MODE_STOP_CONTINUOUS = "stop_cont"
STREAM_MODE_NUM_SAMPS_AND_DONE = "num_done"
STREAM_MODE_NUM_SAMPS_AND_MORE = "num_more"


class StreamCmd:
    """uhd::stream_cmd_t analog: mode + optional num_samps + timing."""

    def __init__(self, stream_mode, num_samps: int = 0,
                 stream_now: bool = True, time_spec: float = 0.0):
        self.stream_mode = stream_mode
        self.num_samps = int(num_samps)
        self.stream_now = bool(stream_now)
        self.time_spec = float(time_spec)


def _time_to_pair(t: float):
    full = int(t)
    return (full, t - full)


class UsrpSource(StreamSource):
    """usrp_source analog with the reference's streaming contract
    (gr-uhd/lib/usrp_source_impl.cc / usrp_block_impl.cc:283-340):

      * issue_stream_cmd(StreamCmd) — START/STOP_CONTINUOUS and
        NUM_SAMPS_AND_DONE/MORE, with stream_now or a device-time
        time_spec (the loopback backend models the device clock as
        sample_count / samp_rate);
      * set_command_time()/clear_command_time() — subsequent tune/gain
        commands apply AT that device time, mid-stream;
      * tag semantics: whenever `_tag_now` fires (stream start, rate or
        freq change, stream command — usrp_source_impl.cc:541 region),
        the NEXT emitted sample carries rx_time/rx_rate/rx_freq tags at
        its absolute offset.

    By default (`issue_stream_cmd_on_start=True`, like the reference) a
    START_CONTINUOUS is issued at first chunk; with it False the source
    produces nothing until a command is issued (timed-capture QA)."""

    mints_tags = True    # tags are minted as the stream advances

    def __init__(self, backend: RadioBackend | None = None,
                 samp_rate: float = 1e6, center_freq: float = 0.0,
                 gain: float = 0.0, issue_stream_cmd_on_start: bool = True,
                 name=None):
        self.backend = backend or LoopbackBackend()
        self.backend.set_samp_rate(samp_rate)
        self.backend.set_center_freq(center_freq)
        self.backend.set_gain(gain)
        self._samp_rate = float(samp_rate)
        self._center_freq = float(center_freq)
        self._auto_start = bool(issue_stream_cmd_on_start)
        self._cmds: list[StreamCmd] = []
        self._cmd_time: float | None = None
        self._timed: list[tuple[float, str, float]] = []  # (t, kind, value)
        self._tag_now = True
        self._device_samples = 0     # device clock = samples / samp_rate
        self._streaming = False
        self._samps_left = None      # None = continuous
        data = getattr(self.backend, "data", np.zeros(0, np.complex64))
        super().__init__(data, PortSpec(C), repeat=False, name=name,
                         tags=[])
        # 'command' message port (usrp_block_impl.cc msg_handler_command):
        # dict keys freq/lo_freq/gain/rate apply like the setter calls
        self.message_port_register_in("command", self._on_command)

    def _on_command(self, msg):
        if not isinstance(msg, dict):
            return
        if "freq" in msg or "lo_freq" in msg:
            self.set_center_freq(float(msg.get("freq", msg.get("lo_freq"))))
        if "gain" in msg:
            self.set_gain(float(msg["gain"]))
        if "rate" in msg:
            self.set_samp_rate(float(msg["rate"]))

    # --- control surface (usrp_block_impl.cc) ---
    def issue_stream_cmd(self, cmd: StreamCmd):
        self._cmds.append(cmd)
        self._tag_now = True

    def set_command_time(self, time_spec: float, mboard: int = 0):
        self._cmd_time = float(time_spec)

    def clear_command_time(self, mboard: int = 0):
        self._cmd_time = None

    def get_time_now(self):
        return self._device_samples / self._samp_rate

    def set_samp_rate(self, rate):
        self._samp_rate = float(rate)
        self.backend.set_samp_rate(rate)
        self._tag_now = True

    def get_samp_rate(self):
        return self._samp_rate

    def set_center_freq(self, freq, chan=0):
        if self._cmd_time is not None:
            # timed tune: applies when the device clock reaches cmd_time
            self._timed.append((self._cmd_time, "freq", float(freq)))
            self._timed.sort()
        else:
            self._center_freq = float(freq)
            self.backend.set_center_freq(freq, chan)
            self._tag_now = True
        return freq

    def get_center_freq(self, chan=0):
        return self._center_freq

    def set_gain(self, gain, chan=0):
        if self._cmd_time is not None:
            self._timed.append((self._cmd_time, "gain", float(gain)))
            self._timed.sort()
        else:
            self.backend.set_gain(gain, chan)

    # --- streaming engine (replaces StreamSource.chunks) ---
    def _emit_tags(self, offset: int):
        t = self.get_time_now()
        self.stream_tags.extend([
            Tag(offset, "rx_time", _time_to_pair(t), self.name),
            Tag(offset, "rx_rate", self._samp_rate, self.name),
            Tag(offset, "rx_freq", self._center_freq, self.name)])

    def _apply_cmd(self, cmd: StreamCmd):
        if not cmd.stream_now and cmd.time_spec > self.get_time_now():
            # jump the device clock to the command time (idle radio)
            self._device_samples = int(round(cmd.time_spec
                                             * self._samp_rate))
        if cmd.stream_mode == STREAM_MODE_START_CONTINUOUS:
            self._streaming, self._samps_left = True, None
        elif cmd.stream_mode == STREAM_MODE_STOP_CONTINUOUS:
            self._streaming = False
        elif cmd.stream_mode == STREAM_MODE_NUM_SAMPS_AND_DONE:
            self._streaming = True
            self._samps_left = cmd.num_samps
        elif cmd.stream_mode == STREAM_MODE_NUM_SAMPS_AND_MORE:
            self._streaming = True
            self._samps_left = (cmd.num_samps
                                + (self._samps_left or 0))
        self._tag_now = True

    def _serve_events(self, offset: int):
        """Apply queued commands and due timed commands; returns samples
        until the next pending timed command (or None)."""
        while self._cmds:
            self._apply_cmd(self._cmds.pop(0))
        now_samp = self._device_samples
        while self._timed and int(round(self._timed[0][0]
                                        * self._samp_rate)) <= now_samp:
            _, kind, val = self._timed.pop(0)
            if kind == "freq":
                self._center_freq = val
                self.backend.set_center_freq(val)
            else:
                self.backend.set_gain(val)
            self._tag_now = True
        if self._tag_now and self._streaming:
            self._emit_tags(offset)
            self._tag_now = False
        if self._timed:
            return (int(round(self._timed[0][0] * self._samp_rate))
                    - now_samp)
        return None

    def chunks(self, n: int):
        self.items_supplied = 0
        self.stream_tags = []
        offset = 0
        if self._auto_start and not self._cmds and not self._streaming:
            self._cmds.append(StreamCmd(STREAM_MODE_START_CONTINUOUS))
        from ..core.stream import host_encode
        exhausted = False
        while not exhausted:
            parts = []
            filled = 0
            while filled < n:
                to_event = self._serve_events(offset + filled)
                if not self._streaming:
                    break
                want = n - filled
                if self._samps_left is not None:
                    want = min(want, self._samps_left)
                if to_event is not None and 0 < to_event < want:
                    want = to_event
                seg = np.asarray(self.backend.recv(want), np.complex64)
                if len(seg) == 0:
                    exhausted = True
                    break
                parts.append(seg)
                filled += len(seg)
                self._device_samples += len(seg)
                if self._samps_left is not None:
                    self._samps_left -= len(seg)
                    if self._samps_left <= 0:
                        self._streaming = False
                        self._samps_left = None
                        if not self._cmds:
                            break
            if filled == 0:
                return
            offset += filled
            self.items_supplied += filled
            chunk = np.concatenate(parts)
            if len(chunk) < n:
                chunk = np.concatenate(
                    [chunk, np.zeros(n - len(chunk), np.complex64)])
                yield host_encode(chunk)
                return
            yield host_encode(chunk)
            if not self._streaming and not self._cmds:
                return


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
