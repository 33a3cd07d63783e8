"""gr-video-sdl analog: video sink.

Reference parity: gr-video-sdl/lib/sink_uc_impl.cc — consumes interleaved
YUV/RGB byte planes and displays via SDL. Headless environments have no
display, so this sink writes raw frames to a file (playable with ffplay
-f rawvideo) and keeps frame statistics; a `display_cb` hook lets a GUI
attach the same way the reference attaches SDL.
"""
from __future__ import annotations

import numpy as np

from ..core.block import SinkBlock
from ..core.stream import PortSpec, B


class VideoSink(SinkBlock):
    """video_sdl.sink_uc analog: [width*height]-byte frames."""

    def __init__(self, width: int, height: int, path: str | None = None,
                 display_cb=None, name=None):
        super().__init__(PortSpec(B), name)
        self.width, self.height = int(width), int(height)
        self.frame_size = self.width * self.height
        self.path = path
        self.display_cb = display_cb
        self.frames_out = 0
        self._buf = np.zeros(0, np.uint8)
        self._fh = open(path, "wb") if path else None

    def collect(self, value):
        # buffer; trim() reveals the exact byte count (final chunk arrives
        # zero-padded to the static step size)
        arr = np.asarray(value).astype(np.uint8).reshape(-1)
        self._buf = np.concatenate([self._buf, arr])

    def trim(self, n_items: int):
        self._buf = self._buf[:n_items]
        self.flush()

    def flush(self):
        while len(self._buf) >= self.frame_size:
            frame, self._buf = (self._buf[:self.frame_size],
                                self._buf[self.frame_size:])
            if self._fh:
                self._fh.write(frame.tobytes())
            if self.display_cb:
                self.display_cb(frame.reshape(self.height, self.width))
            self.frames_out += 1

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None


def video_sink(width, height, path=None, display_cb=None):
    return VideoSink(width, height, path, display_cb)
