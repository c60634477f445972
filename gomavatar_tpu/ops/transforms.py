"""Rotation / rigid-transform primitives in pure JAX.

Provides the TPU-native equivalents of the reference's rotation helpers:
PyTorch3D ``so3_exp_map`` (reference use: models/model.py:229),
``RodriguesModule`` (reference: utils/network_util.py:66-92) and the numpy
Rodrigues in utils/body_util.py:288-307.  One robust, Taylor-switched
implementation serves all call sites; everything is batched and jit/vmap
friendly (no data-dependent control flow).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_SMALL_ANGLE = 1e-8

# This JAX build (like TPU hardware) lowers f32 matmuls to bf16 MXU passes by
# default; for tiny geometry matmuls (3x3 rotation chains) that costs real
# accuracy for zero speed win, so all geometry math pins full precision.
mm = functools.partial(jnp.matmul, precision="highest")
einsum_hi = functools.partial(jnp.einsum, precision="highest")


def hat(v: jax.Array) -> jax.Array:
    """Skew-symmetric (cross-product) matrix of ``v``: (..., 3) -> (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    rows = [
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def so3_exp(rvec: jax.Array) -> jax.Array:
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3).

    Rodrigues formula with a Taylor switch at tiny angles so gradients stay
    finite at theta == 0 (same contract as PyTorch3D's so3_exp_map, which the
    reference uses for per-face rotations, models/model.py:229).
    """
    theta_sq = jnp.sum(rvec * rvec, axis=-1)
    small = theta_sq < 1e-8
    # masked-safe sqrt: gradients stay finite at theta == 0 because the small
    # branch sees a constant 1.0 under the sqrt
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks near 0.
    sin_over = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    one_minus_cos_over = jnp.where(
        small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta_sq)
    )
    K = hat(rvec)
    KK = mm(K, K)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    return eye + sin_over[..., None, None] * K + one_minus_cos_over[..., None, None] * KK


# The reference exposes several numerically-slightly-different Rodrigues
# implementations; they agree for non-infinitesimal angles.  We alias them all
# to the robust one.
rodrigues = so3_exp


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3) (principal branch)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_theta)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    scale = jnp.where(theta < 1e-4, 0.5 + theta * theta / 12.0, theta / (2.0 * jnp.maximum(sin_theta, 1e-8)))
    return w * scale[..., None]


def construct_G(R: jax.Array, T: jax.Array) -> jax.Array:
    """Pack rotation (..., 3, 3) + translation (..., 3) into a 4x4 rigid
    transform (reference: utils/body_util.py _construct_G / _construct_G_tensor)."""
    batch = R.shape[:-2]
    G = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    G = G.at[..., :3, :3].set(R)
    G = G.at[..., :3, 3].set(T)
    G = G.at[..., 3, 3].set(1.0)
    return G


def quat_to_mat(q: jax.Array) -> jax.Array:
    """Unit quaternion (..., 4) [w, x, y, z] -> rotation matrix (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rows = [
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)
