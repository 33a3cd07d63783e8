"""Mesh construction helpers.

The framework's standard mesh axes (SURVEY.md §2.4 mapping):
  "time" — sequence parallelism: one stream chunk split into contiguous
           time slices, halo-exchanged (halo.py). Replaces the reference's
           pipeline-over-blocks threading.
  "chan" — data parallelism over independent channels/pipes (the mp-sched
           N-pipes axis, or PFB channelizer outputs fanned across chips).
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_time: int | None = None, n_chan: int = 1, devices=None) -> Mesh:
    """Build a (time, chan) mesh. Defaults to all devices on the time axis."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_time is None:
        n_time = devices.size // n_chan
    devices = devices[: n_time * n_chan].reshape(n_time, n_chan)
    return Mesh(devices, ("time", "chan"))


def time_sharding(mesh: Mesh, extra_dims: int = 0) -> NamedSharding:
    """Sharding for a (N, ...) stream chunk split along time."""
    return NamedSharding(mesh, P("time", *([None] * extra_dims)))
