"""Test configuration: force an 8-device CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4).

NOTE: in this environment the axon TPU plugin ignores the JAX_PLATFORMS
env var — the `jax.config.update` API is the reliable way to pin CPU.
"""

import os

# Must run before jax initializes a backend.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
