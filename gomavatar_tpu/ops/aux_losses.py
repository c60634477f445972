"""Auxiliary losses & point-cloud ops.

Counterparts of the reference's mostly-dormant aux library
(utils/network_util.py: TVLoss :169-184, 2D/3D Chamfer :274-326, sparse
LaplacianLoss :187-231 — the shipped training loss uses the mesh-based
Laplacian instead, see losses.py) and the PyTorch3D ``knn_points`` surface
(utils/network_util.py:8).  Provided for API completeness; pure jnp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tv_loss(img: jax.Array) -> jax.Array:
    """Total-variation regularizer over (..., H, W, C) images — the
    reference's TVLoss semantics (mean squared forward differences,
    normalized per element)."""
    dh = img[..., 1:, :, :] - img[..., :-1, :, :]
    dw = img[..., :, 1:, :] - img[..., :, :-1, :]
    return 2.0 * (jnp.mean(dh**2) + jnp.mean(dw**2))


def pairwise_sq_dists(a: jax.Array, b: jax.Array) -> jax.Array:
    """(N, D), (M, D) -> (N, M) squared distances (MXU-friendly expansion)."""
    aa = jnp.sum(a * a, axis=-1, keepdims=True)
    bb = jnp.sum(b * b, axis=-1, keepdims=True)
    ab = jnp.matmul(a, b.T, precision="highest")
    return jnp.maximum(aa - 2.0 * ab + bb.T, 0.0)


def chamfer_distance(a: jax.Array, b: jax.Array) -> jax.Array:
    """Symmetric Chamfer distance between point sets (works for 2D or 3D —
    the reference ships both variants, network_util.py:274-326)."""
    d = pairwise_sq_dists(a, b)
    return jnp.mean(jnp.min(d, axis=1)) + jnp.mean(jnp.min(d, axis=0))


def knn_points(query: jax.Array, points: jax.Array, k: int):
    """k nearest neighbors: (dists (N, k), idx (N, k)) — the PyTorch3D
    ``knn_points`` surface the reference imports (dormant)."""
    d = pairwise_sq_dists(query, points)
    neg_d, idx = jax.lax.top_k(-d, k)
    return -neg_d, idx


def estimate_pointcloud_local_coord_frames(points: jax.Array, k: int = 8):
    """Per-point local PCA frames (curvature-style covariance init, the
    reference's dormant utils/pc_util.py:176-194 path): returns
    (eigenvalues (N, 3), frames (N, 3, 3)) of the k-NN covariance."""
    _, idx = knn_points(points, points, k)
    nbrs = points[idx]  # (N, k, 3)
    centered = nbrs - nbrs.mean(axis=1, keepdims=True)
    cov = jnp.einsum("nki,nkj->nij", centered, centered, precision="highest") / k
    eigvals, eigvecs = jnp.linalg.eigh(cov)
    return eigvals, eigvecs
