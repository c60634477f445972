"""Shared union-bbox tile binning for the GoM train path.

In GoMAvatar every splat is pinned to a mesh face, so the splat compositing
pass and the mesh normal pass iterate the SAME primitives over the same
tiles.  Instead of two binnings (two enumerate+sort+repack passes) per step,
:func:`frame_union_bins` bins ONCE by the union of the splat radius bbox and
the triangle(+blur margin) bbox, recording per-entry flags that keep each
pass bit-faithful to its own reference binning (CUDA radius-bbox for splats,
PyTorch3D bbox+blur for the mesh) — see
:class:`~gomavatar_tpu.ops.splat.binning.TileBinning`.

The fused eval-path kernel lives in ops/frame_render.py (SoA geometry +
sorted-segment binning); this module serves the train path, whose splat and
mesh kernels keep separate custom VJPs.
"""

from __future__ import annotations

import jax.numpy as jnp

from gomavatar_tpu.ops.splat.binning import bin_bboxes
from gomavatar_tpu.ops.splat.projection import project_gaussians
from gomavatar_tpu.ops.mesh_raster import project_mesh


def frame_union_bins(
    centroids,
    cov3d,
    verts,
    faces,
    K,
    E,
    img_size,
    blur_margin_px: float = 0.0,
    max_tiles_per_primitive: int = 16,
    buffer_factor: int = 4,
    dual_faces=None,
    band0=None,
    overflow_cap=None,
):
    """Shared per-frame binning: ONE union-bbox tile binning serving both
    the splat blend and the mesh passes (gaussians are pinned to faces, so
    both iterate the same primitives).  ``blur_margin_px`` widens the mesh
    bbox for the soft-silhouette blur radius; the same margin must be used
    by every consumer in a step so train/eval renders stay bit-identical.

    Returns (proj, tris_xy, tris_z, in_front, bins)."""
    proj = project_gaussians(centroids, cov3d, K, E, img_size)
    xy, z = project_mesh(verts, K, E)
    if dual_faces is not None:
        # gather-based transpose (mesh_ops.gather_vjp); see TileBinning
        from gomavatar_tpu.ops.mesh_ops import gather_vjp
        import jax.numpy as _jnp

        trip = gather_vjp(_jnp.concatenate([xy, z[:, None]], axis=-1), faces, dual_faces)
        tris_xy = trip[..., :2]
        tris_z = trip[..., 2]
    else:
        tris_xy = xy[faces]
        tris_z = z[faces]
    in_front = jnp.all(tris_z > 1e-5, axis=-1)

    r = jnp.where(proj.valid, proj.radius, 0.0)
    m = blur_margin_px
    sx0, sx1 = proj.mean2d[:, 0] - r, proj.mean2d[:, 0] + r
    sy0, sy1 = proj.mean2d[:, 1] - r, proj.mean2d[:, 1] + r
    mx0 = jnp.min(tris_xy[..., 0], axis=1) - m
    mx1 = jnp.max(tris_xy[..., 0], axis=1) + m
    my0 = jnp.min(tris_xy[..., 1], axis=1) - m
    my1 = jnp.max(tris_xy[..., 1], axis=1) + m
    any_valid = proj.valid | in_front

    bins = bin_bboxes(
        jnp.minimum(sx0, mx0), jnp.maximum(sx1, mx1),
        jnp.minimum(sy0, my0), jnp.maximum(sy1, my1),
        proj.depth, any_valid, img_size,
        max_tiles_per_primitive=max_tiles_per_primitive,
        buffer_factor=buffer_factor,
        flag_boxes=(
            (sx0, sx1, sy0, sy1, proj.valid),
            (mx0, mx1, my0, my1, in_front),
        ),
        band0=band0,
        overflow_cap=overflow_cap,
    )
    return proj, tris_xy, tris_z, in_front, bins
