"""The GoM (Gaussians-on-Mesh) avatar model as pure functions over pytrees.

TPU-native re-design of the reference's ``Model`` (models/model.py:44-394).
State is split three ways:

  * ``params`` — learnable arrays (vertices, per-face so3/scale, appearance
    colors, MLP weights, optionally lbs logits): a flat dict pytree that the
    optimizer maps over;
  * ``GoMStatics`` — per-phase non-learnable device arrays (faces, mesh
    topology indices, target edge lengths, fixed lbs weights): an ordinary
    pytree passed as an argument to the jitted step (NOT closed over, so it
    is not baked into the executable as constants);
  * ``GoMConfig`` — static Python scalars (sizes, kick-in iters, module
    configs) that select the compiled program.

The full forward (pose refine -> non-rigid -> FK -> LBS -> Steiner cov ->
splat -> normals -> mesh raster -> shadow) is one jittable function with
``i_iter`` traced, so a single XLA program serves the whole schedule
(SURVEY.md §7 north star).  Mesh subdivision changes array shapes and is a
host-side phase split, mirroring the reference's optimizer re-init
(train.py:341-346).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from gomavatar_tpu.ops.skeleton import get_global_RTs, apply_lbs
from gomavatar_tpu.ops.steiner import face_covariances
from gomavatar_tpu.ops.transforms import so3_exp, mm
from gomavatar_tpu.ops.mesh_ops import (
    MeshTopology,
    vertex_normals_incidence,
    edge_lengths,
    subdivide_mesh,
    replicate_face_attribute,
)
from gomavatar_tpu.ops.mesh_raster import rasterize_mesh
from gomavatar_tpu.ops.splat.render import render_gaussians
from gomavatar_tpu.models import modules as M


class GoMStatics(NamedTuple):
    """Per-phase device arrays (regular jit arguments)."""

    faces: jax.Array  # (F, 3) int32
    edges: jax.Array  # (E, 2) int32
    nc_quads: jax.Array  # (P, 4) int32
    face_connectivity: jax.Array  # (P, 2) int32
    vertex_degree: jax.Array  # (N,) f32
    target_edge_length: jax.Array  # (E,) f32
    lbs_weights: jax.Array  # (N, J) f32 (fixed path; ignored when refining)
    vf_incidence: jax.Array  # (N, maxdeg) int32 incident faces per vertex
    vf_valid: jax.Array  # (N, maxdeg) f32 mask
    # gather-based index transposes (ops/mesh_ops.DualIndex/NeighborTable):
    # autodiff would lower each gather's transpose to a TPU scatter-add —
    # measured ~3x the whole geometry backward at 55k faces
    dual_faces: Any
    dual_nc: Any
    dual_conn: Any
    dual_vfinc: Any
    nbr_table: Any


# The default tile budgets below (16/8 per primitive, entry buffer factor 4)
# were tuned at the post-subdivision SMPL face count.  Coverage per face at
# fixed 512^2 framing scales ~ 1/F (splat 3-sigma radius ~ 1/sqrt(F) of the
# body's pixel extent), so a coarser phase needs proportionally larger
# per-primitive budgets while TOTAL entries — and hence N*buffer_factor —
# stay ~flat.
_TUNED_FACE_COUNT = 55104  # one midpoint subdivision of SMPL's 13776 faces

# Floor on the per-gaussian budget at ANY phase: training grows splat scales
# well past the untrained coverage the 16/phase-factor rule was tuned on —
# the trained E2E avatar (57600 faces) drops 77 entries at budget 16 and
# needs 32 for zero-drop at +0 FPS cost (tools/tune_trained_budgets.py sweep
# + tools/bench_train.py A/B, recorded in BENCH_NOTES.md).
_MTG_FLOOR = 32


def tile_budget_factor(num_faces: int) -> int:
    """Budget multiplier for a phase with ``num_faces`` faces: the face-area
    ratio vs the tuned scale, ceil'd (over-budget wastes sort slots;
    under-budget drops entries and zeroes grads), clamped to [1, 4]."""
    return max(1, min(4, -(-_TUNED_FACE_COUNT // max(num_faces, 1))))


@dataclasses.dataclass(frozen=True)
class GoMConfig:
    """Static scalars; hashable, safe to close over in jit."""

    img_size: tuple[int, int]
    num_vertices: int
    num_faces: int
    sigma: float = 0.001
    radius_scale: float = 1.0
    deform_so3: bool = True
    deform_scale: bool = True
    lbs_refine: bool = False
    use_smplx: bool = False
    # module configs as hashable tuples of items (None = module disabled)
    pose_refinement: tuple | None = None
    non_rigid: tuple | None = None
    shadow: tuple | None = None
    normal_renderer_sigma: float = 1e-5
    splat_impl: str = "auto"
    max_tiles_per_gaussian: int = 16
    max_tiles_per_face: int = 8
    # entry-buffer sizing for the shared union binning: the repack buffer
    # holds N * buffer_factor + T * CHUNK entries (ops/splat/binning.py).
    # Scaled by tile_budget_factor alongside the per-primitive budgets so
    # real-entry capacity stays ~flat across phases (total coverage is
    # framing-bound, not face-count-bound).
    buffer_factor: int = 4
    # fused eval renderer: static cap on non-empty tiles (a 512^2 body view
    # covers ~200 of 1024; overflow is counted in the binning telemetry)
    active_tile_cap: int = 512
    # two-band binning (ops/splat/binning.py:bin_sorted): every face gets
    # binning_band0 tile slots; faces covering more tiles share an overflow
    # band of max(F // 8, 2048) slots x (max_tiles_per_gaussian - band0).
    # ~2.9x fewer sort keys at flagship occupancy; None = single-band.
    binning_band0: int | None = 4
    # same for the train-path union binning (promoted round 4: 67.1 vs
    # 69.0 ms/step at flagship scale — the A/B table lives in BENCH_NOTES;
    # from_model_cfg sets 4*bf, this raw-construction default stays None
    # so kernel unit tests exercise the single-band layout too)
    binning_band0_train: int | None = None
    # compacted-tile grids for the TRAIN Pallas kernels (splat + mesh
    # fwd/bwd): saves the ~1.4-2 us/program overhead of every empty tile
    # (at 512^2 a body view occupies ~200-400 of 1024).  None = full-raster
    # grids (default until re-measured); tiles beyond the cap drop loudly
    # via the binning telemetry's dropped_active counter.
    train_active_tile_cap: int | None = None

    @staticmethod
    def from_model_cfg(model_cfg: dict, num_vertices: int, num_faces: int) -> "GoMConfig":
        def tup(d):
            if d is None or d.get("name", "none") == "none":
                return None
            return tuple(sorted((k, tuple(v) if isinstance(v, list) else v) for k, v in d.items()))

        cg = model_cfg["canonical_geometry"]
        bf = tile_budget_factor(num_faces)
        return GoMConfig(
            img_size=tuple(model_cfg["img_size"]),
            num_vertices=num_vertices,
            num_faces=num_faces,
            sigma=float(cg["sigma"]),
            radius_scale=float(cg["radius_scale"]),
            deform_so3=bool(cg["deform_so3"]),
            deform_scale=bool(cg["deform_scale"]),
            lbs_refine=bool(model_cfg["lbs_weights"]["refine"]),
            use_smplx=bool(model_cfg.get("use_smplx", False)),
            pose_refinement=tup(model_cfg.get("pose_refinement")),
            non_rigid=tup(model_cfg.get("non_rigid")),
            shadow=tup(model_cfg.get("shadow_module")),
            normal_renderer_sigma=float(model_cfg.get("normal_renderer", {}).get("sigma", 1e-5)),
            max_tiles_per_gaussian=max(_MTG_FLOOR, 16 * bf),
            max_tiles_per_face=8 * bf,
            buffer_factor=4 * bf,
            binning_band0_train=4 * bf,
            # band A must hold a typical face's FULL coverage (~4x larger
            # per face at a coarse phase) or more primitives spill to band B
            # than its max(F//8, 2048)-slot cap holds — the spill is counted
            # (and dropped) as dropped_budget.  band0*N stays ~flat.
            binning_band0=4 * bf,
        )

    def module_cfg(self, name: str) -> dict | None:
        t = getattr(self, name)
        if t is None:
            return None
        return {k: (list(v) if isinstance(v, tuple) else v) for k, v in t}


def _build_statics(faces: np.ndarray, vertices: np.ndarray, lbs_weights: np.ndarray) -> GoMStatics:
    topo = MeshTopology.build(faces, len(vertices))
    tel = np.linalg.norm(
        vertices[topo.edges[:, 0]] - vertices[topo.edges[:, 1]], axis=-1
    ).astype(np.float32)
    return GoMStatics(
        faces=jnp.asarray(faces, jnp.int32),
        edges=jnp.asarray(topo.edges, jnp.int32),
        nc_quads=jnp.asarray(topo.nc_quads, jnp.int32),
        face_connectivity=jnp.asarray(topo.face_connectivity, jnp.int32),
        vertex_degree=jnp.asarray(topo.vertex_degree, jnp.float32),
        target_edge_length=jnp.asarray(tel, jnp.float32),
        lbs_weights=jnp.asarray(lbs_weights, jnp.float32),
        vf_incidence=jnp.asarray(topo.vf_incidence, jnp.int32),
        vf_valid=jnp.asarray(topo.vf_valid, jnp.float32),
        dual_faces=_dev(topo.dual_faces),
        dual_nc=_dev(topo.dual_nc),
        dual_conn=_dev(topo.dual_conn),
        dual_vfinc=_dev(topo.dual_vfinc),
        nbr_table=_dev(topo.nbr_table),
    )


def _dev(tree):
    return jax.tree_util.tree_map(jnp.asarray, tree)


def init_gom(key: jax.Array, model_cfg: dict, canonical_info: dict):
    """Build (params, statics, gom_cfg) from a config + canonical info dict
    (same keys the reference datasets provide, dataset/train.py:289-302:
    canonical_vertex (N,3), canonical_lbs_weights (N,J), faces (F,3), ...).
    Mirrors Model.__init__ (models/model.py:45-113)."""
    vertices = np.asarray(canonical_info["canonical_vertex"], np.float32)
    faces = np.asarray(canonical_info["faces"], np.int64)
    lbs_w = np.asarray(canonical_info["canonical_lbs_weights"], np.float32)
    N, F = len(vertices), len(faces)

    gom_cfg = GoMConfig.from_model_cfg(model_cfg, N, F)
    statics = _build_statics(faces, vertices, lbs_w)

    k_pr, k_nr, k_sh = jax.random.split(key, 3)
    params: dict[str, Any] = {
        "vertices": jnp.asarray(vertices),
        "so3": jnp.zeros((F, 3), jnp.float32),
        "scale": jnp.full((F, 3), gom_cfg.radius_scale, jnp.float32),
        "appearance": M.appearance_init(F, model_cfg["appearance"]["color_init"]),
    }
    if gom_cfg.lbs_refine:
        params["lbs_logits"] = jnp.log(jnp.asarray(lbs_w) + 1e-9)
    if gom_cfg.pose_refinement is not None:
        params["pose_refinement"] = M.pose_refinement_init(k_pr, gom_cfg.module_cfg("pose_refinement"))
    if gom_cfg.non_rigid is not None:
        params["non_rigid"] = M.non_rigid_init(k_nr, gom_cfg.module_cfg("non_rigid"))
    if gom_cfg.shadow is not None:
        params["shadow"] = M.shadow_init(k_sh, gom_cfg.module_cfg("shadow"))
    return params, statics, gom_cfg


def _lbs_weights(params: dict, statics: GoMStatics, cfg: GoMConfig) -> jax.Array:
    if cfg.lbs_refine:
        # Deviation from the reference (documented): the reference stores
        # log-weights when refining but uses them UN-exponentiated in
        # apply_lbs (models/model.py:69,212-216 — latent bug, never enabled
        # in shipped configs).  We normalize with softmax.
        return jax.nn.softmax(params["lbs_logits"], axis=-1)
    return statics.lbs_weights


def render_frame_eval(
    params: dict,
    statics: GoMStatics,
    cfg: GoMConfig,
    verts_obs: jax.Array,
    colors: jax.Array,
    K: jax.Array,
    E: jax.Array,
    blur_margin_px: float = 0.0,
    with_normal: bool = False,
    interpret: bool = False,
):
    """Optimized eval-frame render: SoA geometry (ops/geometry.py) +
    sorted-segment binning + the fused Pallas splat/z-buffer kernel
    (ops/frame_render.py), with the shadow MLP evaluated per FACE (the
    reference's per-pixel MLP input is constant per winning face).
    Numerically equal to the unfused train path up to float reassociation
    (~1e-5); see tests/test_frame_render.py.

    ``blur_margin_px`` widens the mesh bbox; eval's hard z-buffer pass needs
    none (the default), which keeps tile coverage — and the kernel's chunk
    count — minimal."""
    from gomavatar_tpu.ops.geometry import frame_geometry
    from gomavatar_tpu.ops.splat.binning import bin_sorted
    from gomavatar_tpu.ops.frame_render import render_frame_sorted
    from gomavatar_tpu.models.modules import shadow_apply

    geom = frame_geometry(
        verts_obs, statics.faces, params["so3"], params["scale"], colors,
        statics.vf_incidence, statics.vf_valid, K, E, cfg.img_size,
        cfg.sigma, blur_margin_px,
    )
    table = geom.table
    shading0 = None
    if cfg.shadow is not None:
        sh_cfg = cfg.module_cfg("shadow")
        nsum = table[:, 19:22]
        face_sh = shadow_apply(params["shadow"], sh_cfg, nsum)[:, 0] * 2.0
        shading0 = shadow_apply(
            params["shadow"], sh_cfg, jnp.zeros((1, 3), table.dtype)
        )[0, 0] * 2.0
        table = table.at[:, 22].set(face_sh)
    ub = geom.union_box
    bins = bin_sorted(
        ub[0], ub[1], ub[2], ub[3], geom.depth, geom.valid,
        cfg.img_size,
        max_tiles_per_primitive=cfg.max_tiles_per_gaussian,
        buffer_factor=cfg.buffer_factor,
        active_cap=cfg.active_tile_cap,
        flag_boxes=(
            (geom.sx0, geom.sx1, geom.sy0, geom.sy1, geom.valid_splat),
            (geom.mx0, geom.mx1, geom.my0, geom.my1, geom.valid_mesh),
        ),
        band0=cfg.binning_band0,
        overflow_cap=max(statics.faces.shape[0] // 8, 2048),
    )
    outs = render_frame_sorted(
        table, bins, cfg.img_size,
        shading0=shading0,
        with_normal=with_normal, interpret=interpret,
    )
    # Surface the static-budget overflow counters (ADVICE r2: the eval path
    # used to discard them and silently drop tiles on over-budget frames).
    # tile_overflow: entries beyond what the kernel can ingest per tile
    # (nchunks is clamped to ncmax in ops/frame_render.py; worst-case head
    # alignment wastes CHUNK-1 lanes).
    from gomavatar_tpu.ops.splat.binning import CHUNK
    from gomavatar_tpu.ops.frame_render import NCMAX

    tel = bins.telemetry
    aux = {
        "binning": tel,
        "tile_overflow": jnp.maximum(
            tel.max_tile_entries - (NCMAX * CHUNK - (CHUNK - 1)), 0
        ),
    }
    return outs + (aux,)


def gom_forward(
    params: dict,
    statics: GoMStatics,
    cfg: GoMConfig,
    K: jax.Array,
    E: jax.Array,
    cnl_gtfms: jax.Array,
    dst_Rs: jax.Array,
    dst_Ts: jax.Array,
    dst_posevec: jax.Array | None = None,
    i_iter: jax.Array | float = 1e7,
    global_R: jax.Array | None = None,
    global_T: jax.Array | None = None,
    train: bool = False,
):
    """Single-frame forward pass (reference: Model.forward,
    models/model.py:184-303).  Unbatched — multi-frame/-scene batching goes
    through vmap/shard_map in gomavatar_tpu.parallel.

    Returns (rgb (H, W, 3), mask (H, W), aux dict).
    """
    i_iter = jnp.asarray(i_iter, jnp.float32)

    # 1. pose refinement (gated by kick_in_iter, model.py:193-196)
    if cfg.pose_refinement is not None:
        pr_cfg = cfg.module_cfg("pose_refinement")
        delta = M.pose_refinement_apply(
            params["pose_refinement"],
            dst_posevec,
            total_bones=pr_cfg["total_bones"],
            refine_root=pr_cfg["refine_root"],
        )
        gate = i_iter >= pr_cfg["kick_in_iter"]
        eye = jnp.broadcast_to(jnp.eye(3, dtype=delta.dtype), delta.shape)
        delta = jnp.where(gate, delta, eye)
        dst_Rs = mm(dst_Rs, delta)

    # 2. non-rigid offsets (gated, Hann-annealed PE, model.py:200-208)
    verts_cnl = params["vertices"]
    if cfg.non_rigid is not None:
        nr_cfg = cfg.module_cfg("non_rigid")
        verts_nr = M.non_rigid_apply(params["non_rigid"], nr_cfg, verts_cnl, dst_posevec, i_iter)
        verts_pose = jnp.where(i_iter >= nr_cfg["kick_in_iter"], verts_nr, verts_cnl)
    else:
        verts_pose = verts_cnl

    # 3. FK + LBS (model.py:213-216)
    gR, gT = get_global_RTs(cnl_gtfms, dst_Rs, dst_Ts, use_smplx=cfg.use_smplx)
    verts_obs = apply_lbs(verts_pose, gR, gT, _lbs_weights(params, statics, cfg))

    # 4. optional global transform (PeopleSnapshot pose-opt, model.py:218-221)
    if global_R is not None:
        Rg = so3_exp(global_R)
        verts_obs = mm(verts_obs, Rg.T) + global_T

    faces = statics.faces

    # 5. Steiner covariances in observation space (model.py:227-234).
    # ONE vertex gather with a gather-based transpose (mesh_ops.gather_vjp)
    # feeds covariance, centroid AND normal consumers — autodiff of separate
    # plain gathers would emit one TPU scatter-add per consumer.
    from gomavatar_tpu.ops.mesh_ops import gather_vjp, vertex_normals_from_tri
    from gomavatar_tpu.ops.steiner import face_covariances_tri

    tri = gather_vjp(verts_obs, faces, statics.dual_faces)  # (F, 3, 3)
    cov = face_covariances_tri(tri, params["so3"], params["scale"], cfg.sigma)
    centroids = tri.mean(axis=1)

    # 6.+7. appearance + splat render + vertex normals + mesh raster
    # (model.py:236-250, 270-274); alpha is native here (no 3-channel
    # chunking, cf. gaussian.py:77-94)
    colors = M.appearance_apply(params["appearance"])
    opacity = jnp.ones((cfg.num_faces,), jnp.float32)
    normals = vertex_normals_from_tri(
        tri, statics.vf_incidence, statics.vf_valid, statics.dual_vfinc
    )
    normals_cam = mm(normals, E[:3, :3].T)

    from gomavatar_tpu.ops.mesh_raster import np_log_blur, MeshRasterOut

    W, H = cfg.img_size
    ndc_per_px = 2.0 / min(W, H)
    blur_margin_px = (np_log_blur(cfg.normal_renderer_sigma) ** 0.5) / ndc_per_px + 1.0

    use_fused = (
        not train
        and cfg.splat_impl in ("auto", "pallas")
        and jax.default_backend() not in ("cpu",)
    )
    if use_fused:
        # Eval path: SoA per-face geometry -> sorted-segment union binning
        # with per-pass flags -> ONE Pallas sweep computing splat blend +
        # z-buffer shading/normal selection (ops/geometry.py,
        # ops/frame_render.py).  No blur margin: eval has no soft-silhouette
        # pass, so the mesh bbox is the tight triangle bbox.
        rgb, mask, aux = render_frame_eval(
            params, statics, cfg, verts_obs, colors, K, E
        )
        return rgb, mask, aux

    # Train/CPU path: shared union binning + separate custom-VJP kernels.
    from gomavatar_tpu.ops.fused_render import frame_union_bins

    shared = frame_union_bins(
        centroids, cov, verts_obs, faces, K, E, cfg.img_size,
        blur_margin_px=blur_margin_px,
        max_tiles_per_primitive=cfg.max_tiles_per_gaussian,
        buffer_factor=cfg.buffer_factor,
        dual_faces=statics.dual_faces,
        band0=cfg.binning_band0_train,
        overflow_cap=max(faces.shape[0] // 8, 2048),
    )
    bins = shared[4]
    albedo, mask = render_gaussians(
        centroids,
        cov,
        colors,
        opacity,
        K,
        E,
        cfg.img_size,
        implementation=cfg.splat_impl,
        max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
        bins=bins,
        active_cap=cfg.train_active_tile_cap,
    )
    mesh_out = rasterize_mesh(
        verts_obs,
        normals_cam,
        faces,
        K,
        E,
        cfg.img_size,
        soft_mask=train,
        blur_sigma=cfg.normal_renderer_sigma,
        max_tiles_per_face=cfg.max_tiles_per_face,
        bins=bins,
        dual_faces=statics.dual_faces,
        active_cap=cfg.train_active_tile_cap,
    )

    # 8. shadow MLP on the normal map, x2 for identity-at-init (model.py:280-287)
    if cfg.shadow is not None:
        sh_cfg = cfg.module_cfg("shadow")
        shading = M.shadow_apply(params["shadow"], sh_cfg, mesh_out.normal.reshape(-1, 3))
        shading = shading.reshape(cfg.img_size[1], cfg.img_size[0], 1) * 2.0
        rgb = albedo * shading
    else:
        shading = None
        rgb = albedo

    tel = bins.telemetry
    if cfg.train_active_tile_cap is not None:
        # entries on non-empty tiles beyond the compacted-kernel cap: the
        # kernels never sweep them (black tiles, zero grads) — surface the
        # loss through the same loud counters as the other budgets (XLA
        # CSEs this compact_tiles with the kernels' own instances)
        from gomavatar_tpu.ops.splat.binning import compact_tiles

        dropped_active = compact_tiles(
            bins.tile_start, bins.tile_count, cfg.train_active_tile_cap
        )[5]
        tel = tel._replace(dropped_buffer=tel.dropped_buffer + dropped_active)
    aux: dict[str, Any] = {"binning": tel}
    if train:
        aux = {
            "colors": colors,
            "verts_obs": verts_obs,
            "verts_cnl": verts_cnl,
            "albedo": albedo,
            "normal": mesh_out.normal,
            "normal_mask": mesh_out.soft_mask,
            "shadow": shading,
            # overflow counters for the static binning budgets — all-zero
            # means exact parity with the CUDA rasterizer's dynamic binning
            "binning": tel,
        }
    return rgb, mask, aux


def export_canonical_pointcloud(params: dict, statics: GoMStatics, cfg: GoMConfig):
    """Canonical-space splat export (reference: Model.export_canonical_pointcloud,
    models/model.py:326-346): vertices, opacities, per-face colors and
    covariances in canonical space — for external 3DGS viewers."""
    verts = params["vertices"]
    faces = statics.faces
    cov = face_covariances(verts, faces, params["so3"], params["scale"], cfg.sigma)
    colors = M.appearance_apply(params["appearance"])
    centroids = verts[faces].mean(axis=1)
    opacity = jnp.ones((cfg.num_faces,), jnp.float32)
    return {
        "xyz": centroids,
        "vertices": verts,
        "opacity": opacity,
        "colors": colors,
        "cov": cov,
    }


def export_warped_pointcloud(
    params: dict,
    statics: GoMStatics,
    cfg: GoMConfig,
    cnl_gtfms: jax.Array,
    dst_Rs: jax.Array,
    dst_Ts: jax.Array,
    dst_posevec: jax.Array | None = None,
    i_iter: float = 1e7,
):
    """Observation-space splat export for a given pose (reference:
    Model.export_warped_pointcloud, models/model.py:348-391)."""
    i_iter = jnp.asarray(i_iter, jnp.float32)
    if cfg.pose_refinement is not None and dst_posevec is not None:
        pr_cfg = cfg.module_cfg("pose_refinement")
        delta = M.pose_refinement_apply(
            params["pose_refinement"], dst_posevec,
            total_bones=pr_cfg["total_bones"], refine_root=pr_cfg["refine_root"],
        )
        gate = i_iter >= pr_cfg["kick_in_iter"]
        eye = jnp.broadcast_to(jnp.eye(3, dtype=delta.dtype), delta.shape)
        dst_Rs = mm(dst_Rs, jnp.where(gate, delta, eye))
    verts = params["vertices"]
    if cfg.non_rigid is not None and dst_posevec is not None:
        nr_cfg = cfg.module_cfg("non_rigid")
        verts_nr = M.non_rigid_apply(params["non_rigid"], nr_cfg, verts, dst_posevec, i_iter)
        verts = jnp.where(i_iter >= nr_cfg["kick_in_iter"], verts_nr, verts)
    gR, gT = get_global_RTs(cnl_gtfms, dst_Rs, dst_Ts, use_smplx=cfg.use_smplx)
    verts_obs = apply_lbs(verts, gR, gT, _lbs_weights(params, statics, cfg))
    faces = statics.faces
    cov = face_covariances(verts_obs, faces, params["so3"], params["scale"], cfg.sigma)
    colors = M.appearance_apply(params["appearance"])
    return {
        "xyz": verts_obs[faces].mean(axis=1),
        "vertices": verts_obs,
        "opacity": jnp.ones((cfg.num_faces,), jnp.float32),
        "colors": colors,
        "cov": cov,
    }


def subdivide_gom(params: dict, statics: GoMStatics, cfg: GoMConfig):
    """1->4 midpoint subdivision of the whole model state (host-side), the
    coarse-to-fine phase change of the reference (Model.subdivide,
    models/model.py:136-179): vertices/lbs weights via midpoint attributes,
    per-face so3/scale/appearance replicated x4.

    Returns new (params, statics, cfg) — array shapes change, so training
    must re-jit and rebuild the optimizer (train.py:341-346).
    """
    verts = np.asarray(params["vertices"], np.float64)
    faces = np.asarray(statics.faces, np.int64)
    if cfg.lbs_refine:
        lbs_attr = np.asarray(jax.nn.softmax(params["lbs_logits"], axis=-1), np.float64)
    else:
        lbs_attr = np.asarray(statics.lbs_weights, np.float64)

    new_verts, new_faces, attrs, _ = subdivide_mesh(
        verts, faces, {"weights": lbs_attr}
    )
    new_lbs = attrs["weights"].astype(np.float32)
    N2, F2 = len(new_verts), len(new_faces)

    new_params = dict(params)
    new_params["vertices"] = jnp.asarray(new_verts, jnp.float32)
    new_params["so3"] = jnp.asarray(
        replicate_face_attribute(np.asarray(params["so3"])), jnp.float32
    )
    new_params["scale"] = jnp.asarray(
        replicate_face_attribute(np.asarray(params["scale"])), jnp.float32
    )
    new_params["appearance"] = {
        "colors": jnp.asarray(
            replicate_face_attribute(np.asarray(params["appearance"]["colors"])),
            jnp.float32,
        )
    }
    if cfg.lbs_refine:
        new_params["lbs_logits"] = jnp.log(jnp.asarray(new_lbs) + 1e-9)

    new_statics = _build_statics(new_faces, new_verts, new_lbs)
    # Rescale the tile budgets for the new face count (4x coarser coverage
    # per face before subdivision -> 4x smaller budgets after); custom
    # absolute tunings in cfg scale by the factor RATIO — except that
    # max_tiles_per_gaussian is additionally clamped to _MTG_FLOOR, which
    # WINS over any custom value below it (sub-floor budgets measurably drop
    # trained splat coverage at every phase; tools/tune_trained_budgets.py).
    bf_old = tile_budget_factor(cfg.num_faces)
    bf_new = tile_budget_factor(F2)
    new_cfg = dataclasses.replace(
        cfg,
        num_vertices=N2,
        num_faces=F2,
        # the floor keeps the rescaled budget consistent with what
        # from_model_cfg would compute from scratch at the new face count
        # (trained splat coverage needs >= _MTG_FLOOR at every phase)
        max_tiles_per_gaussian=max(_MTG_FLOOR, cfg.max_tiles_per_gaussian * bf_new // bf_old),
        max_tiles_per_face=max(1, cfg.max_tiles_per_face * bf_new // bf_old),
        buffer_factor=max(1, cfg.buffer_factor * bf_new // bf_old),
        binning_band0=(
            None
            if cfg.binning_band0 is None
            else max(1, cfg.binning_band0 * bf_new // bf_old)
        ),
        binning_band0_train=(
            None
            if cfg.binning_band0_train is None
            else max(1, cfg.binning_band0_train * bf_new // bf_old)
        ),
    )
    return new_params, new_statics, new_cfg
