"""Minimal pure-pytree neural net layer.

The reference's MLPs are tiny (width <= 256); flax adds nothing here, so
modules are plain dicts of arrays with init/apply function pairs — fully
transparent to jit/vmap/shard_map and to orbax checkpointing.

Init matches the reference exactly: xavier-uniform with ReLU gain sqrt(2)
for layers followed by ReLU, gain 1 for the last layer
(utils/network_util.py:403-461 initmod/initseq), with the "tiny last layer"
override (uniform +-1e-5, zero bias) the reference applies to all predictive
heads (e.g. non_rigid_module.py:114-120).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xavier_uniform(key, shape, gain: float = 1.0, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[1]
    limit = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def linear_init(key, d_in: int, d_out: int, gain: float = 1.0):
    return {
        "w": xavier_uniform(key, (d_in, d_out), gain=gain),
        "b": jnp.zeros((d_out,), jnp.float32),
    }


def linear_apply(p, x):
    return jnp.matmul(x, p["w"], precision="highest") + p["b"]


RELU_GAIN = math.sqrt(2.0)


def mlp_init(
    key,
    d_in: int,
    width: int,
    depth: int,
    d_out: int,
    skips: tuple[int, ...] = (),
    skip_dim: int = 0,
    last_init_scale: float = 1e-5,
):
    """Reference-style MLP: ``depth`` hidden linears (ReLU), skip-concat of
    the ``skip_dim``-sized embedding before hidden layer i for i in
    ``skips`` (1-indexed like the reference's loop, non_rigid_module.py:92),
    then a linear head initialized uniform +-last_init_scale."""
    keys = jax.random.split(key, depth + 1)
    layers = []
    d = d_in
    for i in range(depth):
        din_i = d + (skip_dim if (i in skips and i > 0) else 0)
        layers.append(linear_init(keys[i], din_i, width, gain=RELU_GAIN))
        d = width
    head = {
        "w": jax.random.uniform(
            keys[-1], (width, d_out), jnp.float32, -last_init_scale, last_init_scale
        ),
        "b": jnp.zeros((d_out,), jnp.float32),
    }
    # NOTE: ``skips`` is static structure, not parameters — callers pass the
    # same tuple to mlp_apply (keeping the params dict a pure array pytree).
    return {"layers": layers, "head": head}


def mlp_apply(p, x, skips: tuple[int, ...] = (), skip_input=None):
    h = x
    for i, layer in enumerate(p["layers"]):
        if i in skips and i > 0 and skip_input is not None:
            h = jnp.concatenate([h, skip_input], axis=-1)
        h = jax.nn.relu(linear_apply(layer, h))
    return linear_apply(p["head"], h)
