"""Image-tile parallel rendering: shard the fused eval renderer's tile grid
across a device mesh.

SURVEY.md §2.F's closest analogue to sequence/context parallelism for this
workload: there is no attention axis, but the 512² frame decomposes into a
16x16-pixel tile grid whose per-tile composites are independent.  The fused
eval pipeline (ops/frame_render.py) already compacts the non-empty tiles
into a static ``active_cap`` grid of independent kernel programs — exactly
the axis to shard.

Layout per frame:

  * geometry + binning (ops/geometry.py, bin_sorted) run replicated — they
    are a small fraction of frame time and their output feeds every shard;
  * the ``active_cap`` slot arrays (tile id, segment start/count) are split
    evenly across the ``tile`` mesh axis; each device sweeps its slots with
    the same Pallas kernel against the (replicated) entry stream;
  * per-device compact outputs are all-gathered over ICI and untiled into
    the frame on every device (the image is ~3 MB — one cheap collective).

Single-chip semantics are unchanged: the sharded render equals
``render_frame_eval`` up to compilation reassociation (slot order is
preserved; the kernel's ``n_active`` gate becomes a per-shard local count).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map  # noqa: the jax.shard_map API enforces vma typing that rejects custom-VJP kernels under P() out_specs

TILE_AXIS = "tile"


def make_tile_parallel_render(
    mesh: Mesh,
    cfg,
    statics,
    with_normal: bool = False,
    interpret: bool = False,
    axis: str = TILE_AXIS,
):
    """Build a jitted tile-parallel eval renderer over ``mesh``.

    Returns ``render(params, verts_obs, colors, K, E) -> (rgb, alpha[, ...])``
    with the same outputs as the single-chip fused path.  ``interpret`` runs
    the Pallas kernel in interpreter mode (CPU-mesh tests)."""
    from gomavatar_tpu.ops.geometry import frame_geometry
    from gomavatar_tpu.ops.splat.binning import bin_sorted, TILE
    from gomavatar_tpu.ops.frame_render import _frame_call
    from gomavatar_tpu.models.modules import shadow_apply

    n_dev = mesh.shape[axis]
    A = cfg.active_tile_cap
    assert A % n_dev == 0, (
        f"active_tile_cap {A} must divide the {axis} mesh axis ({n_dev})"
    )

    def _prepare(params, verts_obs, colors, K, E):
        geom = frame_geometry(
            verts_obs, statics.faces, params["so3"], params["scale"], colors,
            statics.vf_incidence, statics.vf_valid, K, E, cfg.img_size,
            cfg.sigma, 0.0,
        )
        table = geom.table
        if cfg.shadow is not None:
            sh_cfg = cfg.module_cfg("shadow")
            face_sh = shadow_apply(params["shadow"], sh_cfg, table[:, 19:22])[:, 0] * 2.0
            table = table.at[:, 22].set(face_sh)
        ub = geom.union_box
        bins = bin_sorted(
            ub[0], ub[1], ub[2], ub[3], geom.depth, geom.valid,
            cfg.img_size,
            max_tiles_per_primitive=cfg.max_tiles_per_gaussian,
            buffer_factor=cfg.buffer_factor,
            active_cap=A,
            flag_boxes=(
                (geom.sx0, geom.sx1, geom.sy0, geom.sy1, geom.valid_splat),
                (geom.mx0, geom.mx1, geom.my0, geom.my1, geom.valid_mesh),
            ),
            band0=cfg.binning_band0,
            overflow_cap=max(statics.faces.shape[0] // 8, 2048),
        )
        entries = table[bins.order].T
        entries = entries.at[5].multiply(bins.entry_splat)
        entries = entries.at[18].multiply(bins.entry_mesh)
        return entries, bins

    with_shadow = cfg.shadow is not None
    with_mesh = with_shadow or with_normal

    def _shard_sweep(entries, active_id, seg_start, seg_count, n_active):
        # local slot range: slots are globally compacted [0, n_active); this
        # shard owns [d*A/n, (d+1)*A/n) -> local active count
        d = jax.lax.axis_index(axis)
        local = A // n_dev
        n_local = jnp.clip(n_active - d * local, 0, local)
        outs = _frame_call(
            entries, active_id, seg_start, seg_count, n_local,
            cfg.img_size[0] // TILE, cfg.img_size[1] // TILE,
            with_mesh=with_mesh, interpret=interpret,
        )
        # gather compact outputs back to every device (slot order preserved)
        return tuple(jax.lax.all_gather(o, axis, axis=0, tiled=True) for o in outs)

    sweep = shard_map(
        _shard_sweep,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P()),
        out_specs=(P(),) * (3 if with_mesh else 2),
        check_rep=False,
    )

    @jax.jit
    def render(params, verts_obs, colors, K, E):
        entries, bins = _prepare(params, verts_obs, colors, K, E)
        outs = sweep(
            entries, bins.active_id, bins.seg_start, bins.seg_count, bins.n_active
        )
        # untile exactly like render_frame_sorted
        W, H = cfg.img_size
        TX, TY = W // TILE, H // TILE
        sh0 = None
        if with_shadow:
            sh_cfg = cfg.module_cfg("shadow")
            sh0 = shadow_apply(
                params["shadow"], sh_cfg, jnp.zeros((1, 3), jnp.float32)
            )[0, 0] * 2.0

        def untile(compact, c):
            full = jnp.concatenate(
                [compact, jnp.zeros((1,) + compact.shape[1:], compact.dtype)], axis=0
            )[bins.pos_of_tile]
            return (
                full.reshape(TY, TX, c, TILE, TILE)
                .transpose(0, 3, 1, 4, 2)
                .reshape(H, W, c)
            )

        rgb = untile(outs[0], 3)
        alpha = untile(outs[1], 1)[..., 0]
        if with_mesh:
            sel = untile(outs[2], 5)
            hit = sel[..., 4]
            if with_shadow:
                shading = jnp.where(hit > 0, sel[..., 3], sh0)
                rgb = rgb * shading[..., None]
        if with_normal:
            return rgb, alpha, sel[..., :3], hit
        return rgb, alpha

    return render
