"""Steiner-ellipse frame of a triangle -> 3D Gaussian covariance transform.

TPU-native equivalent of ``get_transformation_from_triangle_steiner``
(reference: models/model.py:27-41).  Given a batch of triangles, returns the
3x3 transform whose columns are (2*axis0, 2*axis1, sigma*normal) where
axis0/axis1 are the semi-axes of the triangle's Steiner circumellipse.  The
per-face Gaussian covariance is then ``T @ cov_local @ T^T``.

Fully vectorized over faces; runs inside the jitted render step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SQRT3 = 1.7320508075688772


def steiner_transform(triangles: jax.Array, sigma: float = 0.001) -> jax.Array:
    """triangles: (..., 3, 3) (three vertices, xyz) -> (..., 3, 3) transform.

    The Steiner ellipse of a triangle with centroid c has the parametrization
    p(t) = c + f1 cos(t) + f2 sin(t), with f1 = (v2 - c)/... ; the principal
    axes are found by the standard conjugate-diameter angle t0
    (models/model.py:30-36 in the reference).
    """
    centroid = triangles.mean(axis=-2)
    f1 = 0.5 * (triangles[..., 2, :] - centroid)
    f2 = (1.0 / (2.0 * _SQRT3)) * (triangles[..., 1, :] - triangles[..., 0, :])

    cross_term = 2.0 * jnp.sum(f1 * f2, axis=-1)
    diff_term = jnp.sum(f1 * f1, axis=-1) - jnp.sum(f2 * f2, axis=-1)
    t0 = 0.5 * jnp.arctan2(cross_term, diff_term)
    t0 = t0[..., None]

    cos_t0 = jnp.cos(t0)
    sin_t0 = jnp.sin(t0)
    axis0 = f1 * cos_t0 + f2 * sin_t0
    # cos(t0 + pi/2) = -sin(t0), sin(t0 + pi/2) = cos(t0)
    axis1 = -f1 * sin_t0 + f2 * cos_t0

    normal = jnp.cross(axis0, axis1)
    normal = normal / (jnp.linalg.norm(normal, axis=-1, keepdims=True) + 1e-20) * sigma
    return jnp.stack([axis0 * 2.0, axis1 * 2.0, normal], axis=-1)


def face_covariances(
    vertices: jax.Array,
    faces: jax.Array,
    so3_params: jax.Array,
    scale_params: jax.Array,
    sigma: float = 0.001,
) -> jax.Array:
    """Per-face 3D Gaussian covariance in the given vertex space.

    cov = T @ (R S S^T R^T) @ T^T with T the Steiner frame of the face and
    (R, S) the learnable local rotation/scale (models/model.py:227-234).

    Args:
      vertices: (N, 3); faces: (F, 3) int; so3_params: (F, 3);
      scale_params: (F, 3).
    Returns:
      (F, 3, 3) covariances.
    """
    return face_covariances_tri(vertices[faces], so3_params, scale_params, sigma)


def face_covariances_tri(
    tris: jax.Array,
    so3_params: jax.Array,
    scale_params: jax.Array,
    sigma: float = 0.001,
) -> jax.Array:
    """:func:`face_covariances` on pre-gathered triangles (F, 3, 3) — lets
    the train step share ONE vertex gather (and one gather transpose in the
    backward) across covariance/centroid/normal consumers."""
    from gomavatar_tpu.ops.transforms import so3_exp

    T = steiner_transform(tris, sigma)  # (F, 3, 3)
    R = so3_exp(so3_params)  # (F, 3, 3)
    RS = R * scale_params[..., None, :]  # R @ diag(s)
    # batched 3x3 matmuls expressed elementwise: tiny contractions lower
    # poorly to the MXU, the VPU does them in two fused passes
    M = _mm3(T, RS)
    return _mm3(M, jnp.swapaxes(M, -1, -2))


def _mm3(A: jax.Array, B: jax.Array) -> jax.Array:
    """Elementwise batched (..., 3, 3) @ (..., 3, 3)."""
    rows = []
    for i in range(3):
        cols = [
            A[..., i, 0] * B[..., 0, j] + A[..., i, 1] * B[..., 1, j] + A[..., i, 2] * B[..., 2, j]
            for j in range(3)
        ]
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)
