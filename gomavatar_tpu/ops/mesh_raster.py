"""Differentiable mesh rasterization: hard normal pass + soft silhouette.

TPU-native replacement for the reference's PyTorch3D mesh renderer
(models/modules/renderer/mesh.py): a z-buffered hard pass producing the
per-pixel normal map, and a sigmoid-distance soft silhouette used by the
mask losses.  Semantics notes (verified against the reference):

  * the reference's ``phong_normal_shading`` passes ``ones`` as barycentrics
    (mesh.py:26-29), so the pixel normal is the *sum* of the three vertex
    normals of the winning face — flat per face, no barycentric gradient;
  * the soft silhouette is 1 - prod(1 - sigmoid(-d^2/sigma)) over nearby
    faces with d the signed squared NDC distance to the triangle (PyTorch3D
    ``SoftSilhouetteShader``, mesh.py:100-112).  The reference caps at the
    50 nearest fragments per pixel; we composite *all* faces binned to the
    pixel's tile — a superset (farther faces contribute sigmoid(~0) ~ 0);
  * z-buffering uses 2D (non-perspective-corrected) barycentric z, like
    PyTorch3D with a pre-NDC-transformed mesh;
  * pixel centers sit at integer coordinates of ``fx X/Z + cx - 0.5``,
    identical to the splat renderer's convention, so albedo x shading stay
    aligned (models/model.py:287).

Implementation: same tile/chunk structure as the splat path (reuses
``bin_gaussians`` with face bounding circles), vmap-over-tiles scan-over-
chunks in pure jnp.  The hard pass carries a running (z, normal) argmin;
the soft pass accumulates log(1-p).  Gradients via autodiff: normals flow
through the hard pass, vertex positions through the soft pass.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gomavatar_tpu.ops.splat.binning import bin_bboxes, TILE, CHUNK

_Z_NEAR = 1e-5
_BIG = 1e10


class MeshRasterOut(NamedTuple):
    normal: jax.Array  # (H, W, 3) summed-vertex-normal map (0 where no hit)
    mask: jax.Array  # (H, W) hard coverage in {0, 1}
    soft_mask: jax.Array | None  # (H, W) sigmoid-blended silhouette


def project_mesh(verts: jax.Array, K: jax.Array, E: jax.Array):
    """World verts -> (pixel xy (N, 2), camera z (N,))."""
    from gomavatar_tpu.ops.transforms import mm

    cam = mm(verts, E[:3, :3].T) + E[:3, 3]
    z = cam[..., 2]
    z_safe = jnp.where(z > _Z_NEAR, z, 1.0)
    x = K[0, 0] * cam[..., 0] / z_safe + K[0, 2] - 0.5
    y = K[1, 1] * cam[..., 1] / z_safe + K[1, 2] - 0.5
    return jnp.stack([x, y], axis=-1), z


def _point_tri_sq_dist(px, py, x0, y0, x1, y1, x2, y2):
    """Unsigned squared distance from pixels to triangle boundary (min over
    the three edge segments).  All operands broadcast to (P, F_chunk)."""

    def seg(ax, ay, bx, by):
        abx = bx - ax
        aby = by - ay
        denom = abx * abx + aby * aby
        t = ((px - ax) * abx + (py - ay) * aby) / jnp.maximum(denom, 1e-12)
        t = jnp.clip(t, 0.0, 1.0)
        dx = px - (ax + t * abx)
        dy = py - (ay + t * aby)
        return dx * dx + dy * dy

    d01 = seg(x0, y0, x1, y1)
    d12 = seg(x1, y1, x2, y2)
    d20 = seg(x2, y2, x0, y0)
    return jnp.minimum(d01, jnp.minimum(d12, d20))


def rasterize_mesh(
    verts: jax.Array,
    vertex_normals: jax.Array,
    faces: jax.Array,
    K: jax.Array,
    E: jax.Array,
    img_size: tuple[int, int],
    soft_mask: bool = True,
    sigma: float = 1e-4,
    blur_sigma: float = 1e-5,
    max_tiles_per_face: int = 16,
    buffer_factor: int = 8,
    max_chunks: int = 64,
    implementation: str = "auto",
    bins=None,
    dual_faces=None,
    active_cap: int | None = None,
) -> MeshRasterOut:
    """Rasterize the mesh.

    Args:
      verts: (N, 3) world vertices; vertex_normals: (N, 3) per-vertex
        normals (pre-rotated into camera space by the caller, as the
        reference does at models/model.py:271-273); faces: (F, 3) int.
      img_size: (W, H), multiples of 16.
      soft_mask: also compute the sigmoid silhouette (training only,
        mesh.py:124-128).
      sigma: blending temperature of the soft silhouette (PyTorch3D
        BlendParams.sigma default 1e-4).
      blur_sigma: the config's ``sigma`` controlling the blur radius
        (mesh.py:99-102: blur_radius = log(1/1e-4 - 1) * sigma, in NDC^2).
    """
    W, H = img_size
    xy, z = project_mesh(verts, K, E)
    if dual_faces is not None:
        # gather-based index transpose (mesh_ops.gather_vjp): autodiff of a
        # plain gather lowers its transpose to a TPU scatter-add
        from gomavatar_tpu.ops.mesh_ops import gather_vjp

        xyz = jnp.concatenate([xy, z[:, None]], axis=-1)  # (V, 3)
        trip = gather_vjp(xyz, faces, dual_faces)  # (F, 3, 3)
        tris_xy = trip[..., :2]
        tris_z = trip[..., 2]
    else:
        tris_xy = xy[faces]  # (F, 3, 2)
        tris_z = z[faces]  # (F, 3)
    # face validity: fully in front of the camera, non-degenerate
    in_front = jnp.all(tris_z > _Z_NEAR, axis=-1)

    # NDC->pixel scaling of the blur radius (NDC spans 2 over the short side)
    ndc_per_px = 2.0 / min(W, H)
    blur_radius_ndc2 = float(np_log_blur(blur_sigma))
    blur_margin_px = (blur_radius_ndc2 ** 0.5) / ndc_per_px + 1.0 if soft_mask else 1.0
    depth = jnp.min(tris_z, axis=-1)

    if bins is None:
        bins = bin_bboxes(
            jnp.min(tris_xy[..., 0], axis=1) - blur_margin_px,
            jnp.max(tris_xy[..., 0], axis=1) + blur_margin_px,
            jnp.min(tris_xy[..., 1], axis=1) - blur_margin_px,
            jnp.max(tris_xy[..., 1], axis=1) + blur_margin_px,
            depth,
            in_front,
            img_size,
            max_tiles_per_primitive=max_tiles_per_face,
            buffer_factor=buffer_factor,
        )

    # per-face channels: 3x(xy) = 6, 3 z, 3 summed normal
    if dual_faces is not None:
        from gomavatar_tpu.ops.mesh_ops import gather_vjp

        nsum = jnp.sum(gather_vjp(vertex_normals, faces, dual_faces), axis=1)
    else:
        nsum = (
            vertex_normals[faces[:, 0]] + vertex_normals[faces[:, 1]] + vertex_normals[faces[:, 2]]
        )
    per_face = jnp.concatenate(
        [tris_xy.reshape(-1, 6), tris_z, nsum], axis=-1
    )  # (F, 12)
    ent = per_face[bins.entry_gauss]  # (Dp, 12)
    # entry_mesh (== entry_valid for a tight tri-bbox binning) keeps the
    # mesh pass inside its own bbox+blur tiles under a union binning
    ent_valid = bins.entry_mesh * in_front[bins.entry_gauss].astype(jnp.float32)

    sigma_px2 = float(sigma) / (ndc_per_px * ndc_per_px)  # sigmoid temp in px^2

    if implementation == "auto":
        implementation = "pallas" if jax.default_backend() not in ("cpu",) else "jnp"
    if implementation == "pallas":
        from gomavatar_tpu.ops.mesh_raster_pallas import mesh_composite_pallas, NCH

        F = per_face.shape[0]
        per_face16 = jnp.concatenate(
            [
                per_face,
                jnp.ones((F, 1), jnp.float32),  # row 12: validity marker
                jnp.zeros((F, NCH - 13), jnp.float32),
            ],
            axis=-1,
        )
        entries = per_face16[bins.entry_gauss].T  # (16, Dp)
        entries = entries.at[12].multiply(ent_valid)
        normal, mask, soft = mesh_composite_pallas(
            entries,
            ent_valid,
            bins.tile_start,
            bins.tile_count,
            bins.num_tiles_x,
            bins.num_tiles_y,
            soft_mask,
            sigma_px2,
            active_cap,
        )
        return MeshRasterOut(normal=normal, mask=mask, soft_mask=soft if soft_mask else None)

    P = TILE * TILE
    Dp = ent.shape[0]
    xs = jnp.arange(TILE, dtype=jnp.float32)
    pix_dx = jnp.tile(xs, TILE)
    pix_dy = jnp.repeat(xs, TILE)
    TX = bins.num_tiles_x

    def one_tile(t, start, count):
        px = ((t % TX).astype(jnp.float32) * TILE + pix_dx)[:, None]  # (P, 1)
        py = ((t // TX).astype(jnp.float32) * TILE + pix_dy)[:, None]

        def step(carry, k):
            best_z, best_n, log_one_minus = carry
            offs = jnp.minimum(start + k * CHUNK, Dp - CHUNK)
            in_range = (k * CHUNK < count).astype(jnp.float32)
            e = jax.lax.dynamic_slice_in_dim(ent, offs, CHUNK, axis=0)
            ev = jax.lax.dynamic_slice_in_dim(ent_valid, offs, CHUNK, axis=0) * in_range
            x0, y0, x1, y1, x2, y2 = (e[:, i] for i in range(6))
            z0, z1, z2 = e[:, 6], e[:, 7], e[:, 8]
            # edge functions -> barycentrics
            denom = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
            denom_safe = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
            w0 = ((y1 - y2) * (px - x2) + (x2 - x1) * (py - y2)) / denom_safe
            w1 = ((y2 - y0) * (px - x2) + (x0 - x2) * (py - y2)) / denom_safe
            w2 = 1.0 - w0 - w1  # (P, CHUNK)
            inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
            ok = inside & (ev > 0) & (jnp.abs(denom) >= 1e-12)
            z_px = w0 * z0 + w1 * z1 + w2 * z2
            z_cand = jnp.where(ok, z_px, _BIG)

            # hard pass: running argmin over z
            z_chunk = jnp.min(z_cand, axis=1)  # (P,)
            arg = jnp.argmin(z_cand, axis=1)  # (P,)
            n_chunk = e[arg, 9:12]  # (P, 3)
            better = z_chunk < best_z
            best_n = jnp.where(better[:, None], n_chunk, best_n)
            best_z = jnp.where(better, z_chunk, best_z)

            if soft_mask:
                d2 = _point_tri_sq_dist(px, py, x0, y0, x1, y1, x2, y2)
                signed = jnp.where(inside, -d2, d2)
                prob = jax.nn.sigmoid(-signed / sigma_px2)
                prob = jnp.where(ev > 0, prob, 0.0)
                log_one_minus = log_one_minus + jnp.sum(
                    jnp.log1p(-jnp.minimum(prob, 1.0 - 1e-7)), axis=1
                )
            return (best_z, best_n, log_one_minus), None

        init = (
            jnp.full((P,), _BIG, jnp.float32),
            jnp.zeros((P, 3), jnp.float32),
            jnp.zeros((P,), jnp.float32),
        )
        (best_z, best_n, log_om), _ = jax.lax.scan(
            step, init, jnp.arange(max_chunks, dtype=jnp.int32)
        )
        hit = (best_z < _BIG).astype(jnp.float32)
        return best_n * hit[:, None], hit, 1.0 - jnp.exp(log_om)

    T = bins.tile_start.shape[0]
    n_t, hit_t, soft_t = jax.vmap(one_tile)(
        jnp.arange(T, dtype=jnp.int32), bins.tile_start, bins.tile_count
    )

    TY = bins.num_tiles_y

    def untile(x_t, c=None):
        if c is None:
            return (
                x_t.reshape(TY, TX, TILE, TILE).transpose(0, 2, 1, 3).reshape(H, W)
            )
        return (
            x_t.reshape(TY, TX, TILE, TILE, c)
            .transpose(0, 2, 1, 3, 4)
            .reshape(H, W, c)
        )

    normal = untile(n_t, 3)
    mask = untile(hit_t)
    soft = untile(soft_t) if soft_mask else None
    return MeshRasterOut(normal=normal, mask=mask, soft_mask=soft)


def np_log_blur(blur_sigma: float) -> float:
    """blur_radius = log(1/1e-4 - 1) * sigma (reference mesh.py:102)."""
    import math

    return math.log(1.0 / 1e-4 - 1.0) * blur_sigma
