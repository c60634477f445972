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


# ---------------------------------------------------------------------------
# fast/slow split (VERDICT r2 weak #5): `pytest -m "not slow"` is the <3 min
# inner loop; the full suite (~20 min single-run) is the CI/pre-commit run.
# Modules dominated by Pallas-interpreter sweeps, torch golden comparisons or
# CLI end-to-end smokes are marked slow wholesale.
SLOW_MODULES = {
    "test_cli",
    "test_trainer",
    "test_losses_metrics",
    "test_frame_render",
    "test_mesh_raster",
    "test_splat",
    "test_tile_parallel",
    "test_parallel",
    "test_prepare",
    "test_gom_model",
    "test_eval_budget",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
