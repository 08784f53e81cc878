"""Test config: force a virtual 8-device CPU mesh so sharding paths are
exercised without TPU hardware (SURVEY.md §4 implication).

Note: this image's sitecustomize registers a remote-TPU ('axon') backend and
forces jax_platforms='axon,cpu', so env vars alone don't select CPU — we
override via jax.config before any computation runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
