"""EWA projection of 3D Gaussians to screen space (pure JAX, differentiable).

TPU-native equivalent of the preprocess stage of the reference's CUDA
rasterizer (``diff_gaussian_rasterization``, invoked from
models/modules/renderer/gaussian.py:83-91): frustum cull, project means,
push 3D covariance through the perspective Jacobian (EWA), add the 0.3 px
low-pass, invert to conics, compute tile-coverage radii.

Everything is vectorized over gaussians and differentiable by JAX autodiff —
only the compositing stage (render.py / pallas_kernel.py) needs a custom VJP.

Conventions:
  * K is a 3x3 pixel-unit intrinsics matrix; E is a 4x4 world->camera
    extrinsics matrix (same data the reference feeds, gaussian.py:30-46).
  * ``mean2d`` is in pixel units with pixel centers at integer coordinates
    (the CUDA rasterizer's ``ndc2Pix`` convention: x_px = fx tx/tz + cx - 0.5).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gomavatar_tpu.ops.transforms import mm


class ProjectedGaussians(NamedTuple):
    mean2d: jax.Array  # (N, 2) pixel coords
    conic: jax.Array  # (N, 3) packed inverse 2D covariance (a, b, c)
    depth: jax.Array  # (N,) camera-space z
    radius: jax.Array  # (N,) conservative pixel radius (0 for culled)
    valid: jax.Array  # (N,) bool


def project_gaussians(
    means3d: jax.Array,
    cov3d: jax.Array,
    K: jax.Array,
    E: jax.Array,
    img_size: tuple[int, int],
    znear: float = 0.2,
    blur: float = 0.3,
) -> ProjectedGaussians:
    """Project gaussians to screen.

    Args:
      means3d: (N, 3) world-space centers.
      cov3d: (N, 3, 3) world-space covariances.
      K: (3, 3) intrinsics; E: (4, 4) world->camera.
      img_size: (W, H).
      znear: frustum near-plane cull depth (the CUDA kernel hardcodes 0.2).
      blur: isotropic screen-space low-pass added to the diagonal (0.3 px in
        the CUDA kernel) — guarantees invertibility of cov2d.
    """
    W, H = img_size
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]

    R = E[:3, :3]
    tvec = E[:3, 3]
    t = mm(means3d, R.T) + tvec  # (N, 3) camera space
    tz = t[..., 2]

    in_front = tz > znear
    tz_safe = jnp.where(in_front, tz, 1.0)

    # EWA: clamp the frustum coordinates like the CUDA preprocess does to
    # bound the Jacobian for gaussians far outside the view cone.
    tanfovx = 0.5 * W / fx
    tanfovy = 0.5 * H / fy
    limx = 1.3 * tanfovx
    limy = 1.3 * tanfovy
    txz = jnp.clip(t[..., 0] / tz_safe, -limx, limx)
    tyz = jnp.clip(t[..., 1] / tz_safe, -limy, limy)

    # Rotate covariances into camera space with ONE big MXU matmul instead of
    # N tiny 3x3 matmuls: M = R cov R^T <=> M_flat = cov_flat @ kron(R, R)^T.
    N = cov3d.shape[0]
    kron = jnp.einsum("ij,lk->jkil", R, R).reshape(9, 9)
    M = jnp.matmul(cov3d.reshape(N, 9), kron, precision="highest").reshape(N, 3, 3)

    # Fold in the perspective Jacobian J = [[fx/tz, 0, -fx*txz/tz],
    # [0, fy/tz, -fy*tyz/tz]] elementwise (J has only 4 nonzeros).
    a1 = fx / tz_safe
    c1 = -fx * txz / tz_safe
    b2 = fy / tz_safe
    c2 = -fy * tyz / tz_safe
    M00, M01, M02 = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    M11, M12, M22 = M[..., 1, 1], M[..., 1, 2], M[..., 2, 2]
    a = a1 * a1 * M00 + 2.0 * a1 * c1 * M02 + c1 * c1 * M22 + blur
    b = a1 * b2 * M01 + a1 * c2 * M02 + c1 * b2 * M12 + c1 * c2 * M22
    c = b2 * b2 * M11 + 2.0 * b2 * c2 * M12 + c2 * c2 * M22 + blur

    det = a * c - b * b
    invertible = det > 0.0
    det_safe = jnp.where(invertible, det, 1.0)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

    # conservative radius: 3 sigma of the major eigenvalue
    mid = 0.5 * (a + c)
    lam = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam))

    mean2d = jnp.stack(
        [fx * t[..., 0] / tz_safe + cx - 0.5, fy * t[..., 1] / tz_safe + cy - 0.5],
        axis=-1,
    )

    # cull gaussians fully outside the image
    on_screen = (
        (mean2d[..., 0] + radius >= 0)
        & (mean2d[..., 0] - radius <= W - 1)
        & (mean2d[..., 1] + radius >= 0)
        & (mean2d[..., 1] - radius <= H - 1)
    )
    valid = in_front & invertible & on_screen
    radius = jnp.where(valid, radius, 0.0)
    return ProjectedGaussians(mean2d=mean2d, conic=conic, depth=tz, radius=radius, valid=valid)
