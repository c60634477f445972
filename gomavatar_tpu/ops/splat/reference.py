"""Slow-but-obviously-correct per-pixel splat renderer (golden oracle).

Materializes the full (pixels x gaussians) alpha matrix — only usable at
test sizes.  Serves as the numerical ground truth for the tiled jnp and
Pallas implementations (SURVEY.md §4: golden-image tests for the rasterizer).
Matches the semantics of the CUDA ``diff_gaussian_rasterization`` forward:
depth-ordered front-to-back alpha compositing, alpha clamped to 0.99,
contributions below 1/255 skipped, per-pixel termination at T < 1e-4.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gomavatar_tpu.ops.splat.projection import ProjectedGaussians

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4


def composite_alpha(mean2d, conic, opacity, px, py, radius=None, tile=16):
    """alpha of each gaussian at each pixel: (P pixels, N gaussians).

    If ``radius`` is given, contributions are cut at tile granularity outside
    the gaussian's radius bbox — exactly what the tile-binned implementations
    (and the CUDA rasterizer) do, so the oracle matches them bit-for-bit.
    """
    dx = px[:, None] - mean2d[None, :, 0]
    dy = py[:, None] - mean2d[None, :, 1]
    power = (
        -0.5 * (conic[None, :, 0] * dx * dx + conic[None, :, 2] * dy * dy)
        - conic[None, :, 1] * dx * dy
    )
    alpha = jnp.minimum(ALPHA_MAX, opacity[None, :] * jnp.exp(power))
    alpha = jnp.where(power > 0.0, 0.0, alpha)
    alpha = jnp.where(alpha < ALPHA_MIN, 0.0, alpha)
    if radius is not None:
        ptx = jnp.floor(px / tile)[:, None]
        pty = jnp.floor(py / tile)[:, None]
        tx0 = jnp.floor((mean2d[None, :, 0] - radius[None, :]) / tile)
        tx1 = jnp.floor((mean2d[None, :, 0] + radius[None, :]) / tile)
        ty0 = jnp.floor((mean2d[None, :, 1] - radius[None, :]) / tile)
        ty1 = jnp.floor((mean2d[None, :, 1] + radius[None, :]) / tile)
        covered = (ptx >= tx0) & (ptx <= tx1) & (pty >= ty0) & (pty <= ty1)
        alpha = jnp.where(covered, alpha, 0.0)
    return alpha


def render_reference(
    proj: ProjectedGaussians,
    colors: jax.Array,
    opacity: jax.Array,
    img_size: tuple[int, int],
) -> tuple[jax.Array, jax.Array]:
    """Render (H, W, C) image + (H, W) alpha by brute force.

    Args:
      proj: projected gaussians (see projection.py).
      colors: (N, C); opacity: (N,).
      img_size: (W, H).
    """
    W, H = img_size
    N = colors.shape[0]

    # depth order (invalid gaussians sort to the back and get zero opacity);
    # uses the same quantized key as the tiled binning so tie-breaking agrees
    from gomavatar_tpu.ops.splat.binning import depth_sort_bits

    depth_key = jnp.where(proj.valid, depth_sort_bits(proj.depth), jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(depth_key, stable=True)
    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    cols = colors[order]
    op = jnp.where(proj.valid, opacity, 0.0)[order]
    radius = proj.radius[order]

    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")
    px = xs.reshape(-1)
    py = ys.reshape(-1)

    alpha = composite_alpha(mean2d, conic, op, px, py, radius=radius)  # (P, N)
    # Front-to-back transmittance.  CUDA termination semantics: a gaussian
    # whose blend would push T below 1e-4 is itself dropped, as is everything
    # behind it — equivalently, drop every entry whose *inclusive*
    # transmittance falls below the threshold.
    log1m = jnp.log1p(-alpha)
    cum = jnp.cumsum(log1m, axis=1)
    T_incl = jnp.exp(cum)
    T_excl = jnp.exp(cum - log1m)
    w = jnp.where(T_incl < T_EPS, 0.0, T_excl * alpha)  # (P, N)
    img = jnp.matmul(w, cols, precision="highest")  # (P, C)
    acc = jnp.sum(w, axis=1)
    return img.reshape(H, W, -1), acc.reshape(H, W)
