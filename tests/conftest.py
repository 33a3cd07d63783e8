"""Test config: run everything on a virtual 8-device CPU mesh so sharding
tests work without TPU hardware (SURVEY.md §4 'multi-node without a cluster'
analog — the reference runs gr-zeromq QA over localhost; we run shard_map QA
over a host-device mesh).

NOTE: this image's sitecustomize imports jax and registers the axon TPU
backend in every python process, so env vars alone don't switch platforms —
we must override via jax.config AFTER import but BEFORE first backend use.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
