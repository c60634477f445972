"""Fused single-pass GoM frame renderer (eval path).

In GoMAvatar every splat is pinned to a mesh face, so the splat compositing
pass and the mesh normal pass iterate the SAME primitives over the same
tiles.  The unfused pipeline (ops/splat + ops/mesh_raster) pays two tile
binnings, two gathers and two kernel sweeps per frame; this module does ONE
of each: a union-bbox binning and a Pallas kernel whose chunk loop computes
both the front-to-back splat blend and the z-buffered normal selection from
a single 24-channel DMA stream.

Forward-only (used for evaluation/serving, ``gom_forward(train=False)``);
training keeps the separate kernels with their custom VJPs.

Entry channels [24, Dp]:
  0 mean_x, 1 mean_y, 2-4 conic(a,b,c), 5 opacity, 6-8 color RGB,
  9-14 tri xy (x0 y0 x1 y1 x2 y2), 15-17 z, 18-20 summed normal,
  21 mesh-valid, 22-23 pad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gomavatar_tpu.ops.splat.binning import bin_bboxes, TILE, CHUNK
from gomavatar_tpu.ops.splat.projection import project_gaussians
from gomavatar_tpu.ops.splat.pallas_kernel import (
    _pixel_coords,
    _transmittance,
    _lane_cumsum,
)
from gomavatar_tpu.ops.mesh_raster import project_mesh
from gomavatar_tpu.ops.splat.reference import ALPHA_MAX, ALPHA_MIN

P = TILE * TILE
NCH = 24
_BIG = 1e10


def _splat_terms(chunk, px, py):
    mx, my = chunk[0:1, :], chunk[1:2, :]
    ca, cb, cc = chunk[2:3, :], chunk[3:4, :], chunk[4:5, :]
    op = chunk[5:6, :]
    dx = px - mx
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
    alpha = jnp.where(power > 0.0, 0.0, alpha)
    alpha = jnp.where(alpha < ALPHA_MIN, 0.0, alpha)
    return alpha


def _mesh_terms(chunk, px, py):
    x0, y0, x1, y1, x2, y2 = (chunk[9 + i : 10 + i, :] for i in range(6))
    z0, z1, z2 = (chunk[15 + i : 16 + i, :] for i in range(3))
    valid = chunk[21:22, :]
    denom = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
    denom_ok = jnp.abs(denom) >= 1e-12
    denom_safe = jnp.where(denom_ok, denom, 1.0)
    w0 = ((y1 - y2) * (px - x2) + (x2 - x1) * (py - y2)) / denom_safe
    w1 = ((y2 - y0) * (px - x2) + (x0 - x2) * (py - y2)) / denom_safe
    w2 = 1.0 - w0 - w1
    inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
    z_px = w0 * z0 + w1 * z1 + w2 * z2
    ok = inside & denom_ok & (valid > 0)
    return ok, z_px


def _fused_kernel(
    start_ref, count_ref, entries_hbm,
    color_out, alpha_out, hard_out,
    chunk_vmem, sem,
    *, num_tiles_x: int, ncmax: int,
):
    t = pl.program_id(0)
    start = start_ref[t]
    nchunks = jnp.minimum(count_ref[t] // CHUNK, ncmax)
    px, py = _pixel_coords(t, num_tiles_x)

    def get_dma(slot, k):
        return pltpu.make_async_copy(
            entries_hbm.at[:, pl.ds(pl.multiple_of(start + k * CHUNK, CHUNK), CHUNK)],
            chunk_vmem.at[slot],
            sem.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    def body(k, carry):
        log_T, color_acc, alpha_acc, best_z, best_n = carry

        @pl.when(k + 1 < nchunks)
        def _():
            get_dma((k + 1) % 2, k + 1).start()

        get_dma(k % 2, k).wait()
        chunk = chunk_vmem[k % 2]

        # splat blend
        alpha = _splat_terms(chunk, px, py)
        w, _, log_T = _transmittance(alpha, log_T)
        color_acc = color_acc + jax.lax.dot_general(
            chunk[6:9, :], w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        alpha_acc = alpha_acc + jnp.sum(w, axis=1, keepdims=True)

        # z-buffer normal selection
        ok, z_px = _mesh_terms(chunk, px, py)
        z_cand = jnp.where(ok, z_px, _BIG)
        chunk_min = jnp.min(z_cand, axis=1, keepdims=True)
        better = chunk_min < best_z
        eligible = (z_cand <= chunk_min) & ok & better
        onehot = jnp.logical_and(eligible, _lane_cumsum(eligible.astype(jnp.float32)) <= 1.0 + 1e-6)
        n_chunk = jax.lax.dot_general(
            chunk[18:21, :], onehot.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        best_n = jnp.where(better.reshape(1, P), n_chunk, best_n)
        best_z = jnp.minimum(best_z, chunk_min)
        return log_T, color_acc, alpha_acc, best_z, best_n

    # NOTE: outputs must be written unconditionally — Pallas output windows
    # are undefined until stored, and input_output_aliases is a buffer-
    # donation contract, NOT a data-init guarantee (skipping writes on empty
    # tiles flushes stale window contents).  The fori_loop itself already
    # costs nothing at nchunks == 0.
    init = (
        jnp.zeros((P, 1), jnp.float32),
        jnp.zeros((3, P), jnp.float32),
        jnp.zeros((P, 1), jnp.float32),
        jnp.full((P, 1), _BIG, jnp.float32),
        jnp.zeros((3, P), jnp.float32),
    )
    _, color_acc, alpha_acc, best_z, best_n = jax.lax.fori_loop(0, nchunks, body, init)

    color_out[0] = color_acc
    alpha_out[0] = alpha_acc.reshape(1, P)
    hit = (best_z < _BIG).astype(jnp.float32).reshape(1, P)
    hard_out[0] = jnp.concatenate([best_n, hit], axis=0)


@functools.partial(jax.jit, static_argnames=("num_tiles_x", "num_tiles_y", "ncmax"))
def _fused_call(entries, tile_start, tile_count, num_tiles_x, num_tiles_y, ncmax=64):
    T = num_tiles_x * num_tiles_y
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[
            pl.BlockSpec((1, 3, P), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, P), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, NCH, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fused_kernel, num_tiles_x=num_tiles_x, ncmax=ncmax),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, 3, P), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((T, 4, P), jnp.float32),
        ],
    )(tile_start, tile_count, entries)


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
):
    """Shared per-frame binning: ONE union-bbox tile binning serving both
    the splat blend and the mesh passes (gaussians are pinned to faces, so
    both iterate the same primitives).  ``blur_margin_px`` widens the bbox
    for the soft-silhouette blur radius; the same margin must be used by
    every consumer in a step so train/eval renders stay bit-identical.

    Returns (proj, tris_xy, tris_z, in_front, bins)."""
    proj = project_gaussians(centroids, cov3d, K, E, img_size)
    xy, z = project_mesh(verts, K, E)
    tris_xy = xy[faces]
    tris_z = z[faces]
    in_front = jnp.all(tris_z > 1e-5, axis=-1)

    r = jnp.where(proj.valid, proj.radius, 0.0)
    m = blur_margin_px
    bx0 = jnp.minimum(proj.mean2d[:, 0] - r, jnp.min(tris_xy[..., 0], axis=1) - m)
    bx1 = jnp.maximum(proj.mean2d[:, 0] + r, jnp.max(tris_xy[..., 0], axis=1) + m)
    by0 = jnp.minimum(proj.mean2d[:, 1] - r, jnp.min(tris_xy[..., 1], axis=1) - m)
    by1 = jnp.maximum(proj.mean2d[:, 1] + r, jnp.max(tris_xy[..., 1], axis=1) + m)
    any_valid = proj.valid | in_front

    bins = bin_bboxes(
        bx0, bx1, by0, by1,
        proj.depth, any_valid, img_size,
        max_tiles_per_primitive=max_tiles_per_primitive,
        buffer_factor=buffer_factor,
    )
    return proj, tris_xy, tris_z, in_front, bins


def render_frame_fused(
    centroids: jax.Array,  # (F, 3) splat means (face centroids)
    cov3d: jax.Array,  # (F, 3, 3)
    colors: jax.Array,  # (F, 3)
    opacity: jax.Array,  # (F,)
    verts: jax.Array,  # (N, 3)
    normals_cam: jax.Array,  # (N, 3) camera-space vertex normals
    faces: jax.Array,  # (F, 3)
    K: jax.Array,
    E: jax.Array,
    img_size: tuple[int, int],
    max_tiles_per_primitive: int = 16,
    buffer_factor: int = 4,
    blur_margin_px: float = 0.0,
    precomputed=None,
):
    """One-pass render: returns (albedo (H,W,3), alpha, normal (H,W,3), mask).

    ``precomputed`` optionally supplies the output of
    :func:`frame_union_bins` (shared with other passes of the same step)."""
    W, H = img_size
    if precomputed is None:
        precomputed = frame_union_bins(
            centroids, cov3d, verts, faces, K, E, img_size,
            blur_margin_px=blur_margin_px,
            max_tiles_per_primitive=max_tiles_per_primitive,
            buffer_factor=buffer_factor,
        )
    proj, tris_xy, tris_z, in_front, bins = precomputed

    nsum = normals_cam[faces[:, 0]] + normals_cam[faces[:, 1]] + normals_cam[faces[:, 2]]
    per_face = jnp.concatenate(
        [
            proj.mean2d,
            proj.conic,
            (jnp.where(proj.valid, opacity, 0.0))[:, None],
            colors,
            tris_xy.reshape(-1, 6),
            tris_z,
            nsum,
            in_front.astype(jnp.float32)[:, None],
            jnp.zeros((centroids.shape[0], 2), jnp.float32),
        ],
        axis=-1,
    )  # (F, 24)
    entries = per_face[bins.entry_gauss].T  # (24, Dp)
    entries = entries.at[5].multiply(bins.entry_valid)
    entries = entries.at[21].multiply(bins.entry_valid)

    color_t, alpha_t, hard_t = _fused_call(
        entries, bins.tile_start, bins.tile_count, bins.num_tiles_x, bins.num_tiles_y
    )
    TY, TX = bins.num_tiles_y, bins.num_tiles_x
    albedo = (
        color_t.reshape(TY, TX, 3, TILE, TILE).transpose(0, 3, 1, 4, 2).reshape(H, W, 3)
    )
    alpha = alpha_t[:, 0, :].reshape(TY, TX, TILE, TILE).transpose(0, 2, 1, 3).reshape(H, W)
    normal = (
        hard_t[:, 0:3, :].reshape(TY, TX, 3, TILE, TILE).transpose(0, 3, 1, 4, 2).reshape(H, W, 3)
    )
    mask = hard_t[:, 3, :].reshape(TY, TX, TILE, TILE).transpose(0, 2, 1, 3).reshape(H, W)
    return albedo, alpha, normal, mask
