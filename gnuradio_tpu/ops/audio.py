"""gr-audio analog: audio source/sink with a runtime backend registry.

Reference parity: gr-audio/lib/audio_registry.cc:31-91 — backends register
with priorities (ALSA > OSS > JACK > PortAudio ...), source/sink factories
pick the best available at runtime. In this headless image no soundcard
exists; the registry ships two backends mirroring the reference's model:
  * "wav"  — file-backed audio (sink writes a WAV, source reads one)
  * "null" — silence source / discard sink
A real ALSA backend would register here the same way (via utils.native for
the device I/O)."""
from __future__ import annotations

import numpy as np

from ..core.stream import PortSpec, F
from .blocks import NullSource, NullSink
from .fileio import WavfileSource, WavfileSink

_REGISTRY: list = []  # (priority, name, source_factory, sink_factory)


def register(name: str, priority: int, source_factory, sink_factory):
    _REGISTRY.append((priority, name, source_factory, sink_factory))
    _REGISTRY.sort(reverse=True)


def backends():
    return [name for _, name, _, _ in _REGISTRY]


def _wav_source(sample_rate, device):
    return WavfileSource(device or "audio_in.wav", repeat=False)


def _wav_sink(sample_rate, device):
    return WavfileSink(device or "audio_out.wav", sample_rate)


def _null_source(sample_rate, device):
    return NullSource(PortSpec(F))


def _null_sink(sample_rate, device):
    return NullSink(PortSpec(F))


register("null", 0, _null_source, _null_sink)
register("wav", 10, _wav_source, _wav_sink)


def audio_source(sample_rate: int, device: str = "", ok_to_block=True):
    """audio.source analog: picks the highest-priority usable backend.
    A device ending in .wav selects the wav backend explicitly."""
    if device.endswith(".wav"):
        return _wav_source(sample_rate, device)
    for _, name, src, _ in _REGISTRY:
        if name == "null" and len(_REGISTRY) > 1 and not device:
            continue
        try:
            return src(sample_rate, device)
        except Exception:
            continue
    return _null_source(sample_rate, device)


def audio_sink(sample_rate: int, device: str = "", ok_to_block=True):
    if device.endswith(".wav"):
        return _wav_sink(sample_rate, device)
    return _null_sink(sample_rate, device)
