"""Device mesh helpers.

The reference is strictly single-GPU single-process (SURVEY.md §2.F: no
torch.distributed / NCCL anywhere; the renderer even asserts batch==1,
models/modules/renderer/gaussian.py:24).  This module is the TPU-native
scaling layer the reference never had: named-axis `jax.sharding.Mesh`
construction for data-parallel multi-frame training and multi-scene
batched rendering, with XLA collectives over ICI.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, PartitionSpec, NamedSharding

DATA_AXIS = "data"
SCENE_AXIS = "scene"


def make_mesh(n_devices: int | None = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def sharded_batch(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec(axis))
