"""Top-level differentiable Gaussian splat renderer.

TPU-native replacement for the reference's CUDA splat renderer
(models/modules/renderer/gaussian.py + the external
``diff_gaussian_rasterization`` package): project -> tile-bin -> composite.
Renders any number of feature channels in one pass (the reference pads and
chunks features in groups of 3, gaussian.py:77-94 — unnecessary here).

``implementation``:
  * 'reference' — brute-force per-pixel oracle (tests only);
  * 'jnp'       — tiled vmap/scan compositing, differentiable by autodiff;
  * 'pallas'    — Pallas TPU kernel with custom VJP (same math);
  * 'auto'      — 'pallas' on TPU backends, 'jnp' elsewhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gomavatar_tpu.ops.splat.projection import project_gaussians
from gomavatar_tpu.ops.splat import binning as _binning
from gomavatar_tpu.ops.splat.tiled_jnp import composite_tiles_jnp
from gomavatar_tpu.ops.splat.reference import render_reference


def _default_impl() -> str:
    return "pallas" if jax.default_backend() not in ("cpu",) else "jnp"


def render_gaussians(
    means3d: jax.Array,
    cov3d: jax.Array,
    colors: jax.Array,
    opacity: jax.Array,
    K: jax.Array,
    E: jax.Array,
    img_size: tuple[int, int],
    bg_color: jax.Array | None = None,
    implementation: str = "auto",
    max_tiles_per_gaussian: int = 32,
    buffer_factor: int = 8,
    max_chunks: int = 64,
    bins=None,
    active_cap: int | None = None,
):
    """Render gaussians to an image.

    Args:
      means3d: (N, 3); cov3d: (N, 3, 3); colors: (N, C); opacity: (N,).
      K: (3, 3); E: (4, 4) world->camera; img_size: (W, H).
      bg_color: optional (C,) composited against the residual transmittance
        (the CUDA kernel's ``bg`` argument; the reference passes zeros and
        blends backgrounds outside, train.py:53-55).
    Returns:
      (img (H, W, C), alpha (H, W)).
    """
    W, H = img_size
    if implementation == "auto":
        implementation = _default_impl()

    proj = project_gaussians(means3d, cov3d, K, E, img_size)

    if implementation == "reference":
        img, alpha = render_reference(proj, colors, jnp.where(proj.valid, opacity, 0.0), img_size)
    else:
        if bins is None:
            bins = _binning.bin_gaussians(
                proj.mean2d,
                proj.radius,
                proj.depth,
                proj.valid,
                img_size,
                max_tiles_per_gaussian=max_tiles_per_gaussian,
                buffer_factor=buffer_factor,
            )
        # gather per-entry values (autodiff turns this into a segment-sum
        # of entry gradients back onto gaussians)
        eg = bins.entry_gauss
        op_eff = jnp.where(proj.valid, opacity, 0.0)

        if implementation == "pallas":
            from gomavatar_tpu.ops.splat.pallas_kernel import (
                composite_tiles_pallas,
                pack_gaussian_channels,
            )

            per_gauss = pack_gaussian_channels(proj.mean2d, proj.conic, op_eff, colors)
            entries = per_gauss[eg].T  # (NCH_pad, Dp)
            # entry_splat (== entry_valid for a splat-only binning) gates the
            # opacity so union-binned renders match the CUDA radius-bbox
            # semantics exactly (see TileBinning.entry_splat)
            entries = entries.at[5].multiply(bins.entry_splat)
            img, alpha = composite_tiles_pallas(
                entries,
                bins.entry_valid,
                bins.tile_start,
                bins.tile_count,
                colors.shape[-1],
                bins.num_tiles_x,
                bins.num_tiles_y,
                active_cap,
            )
        elif implementation == "jnp":
            img, alpha = composite_tiles_jnp(
                proj.mean2d[eg],
                proj.conic[eg],
                colors[eg],
                op_eff[eg] * bins.entry_splat,
                bins.tile_start,
                bins.tile_count,
                bins.num_tiles_x,
                bins.num_tiles_y,
                max_chunks=max_chunks,
            )
        else:
            raise ValueError(f"unknown implementation: {implementation}")

    if bg_color is not None:
        img = img + bg_color[None, None, :] * (1.0 - alpha)[..., None]
    return img, alpha
