"""Fused eval renderer v2: SoA geometry, sorted binning, frame kernel.

Runs the Pallas kernel in interpreter mode so the whole eval path is covered
on the CPU CI mesh; hardware agreement is re-checked by tools/verify_tpu.py
and by the in-bench gate of bench.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gomavatar_tpu.config import default_cfg
from gomavatar_tpu.models.gom import init_gom, gom_forward, render_frame_eval
from gomavatar_tpu.models.smpl import synthetic_body, synthetic_camera
from gomavatar_tpu.ops.skeleton import (
    body_pose_to_body_RTs,
    get_canonical_global_tfms,
    get_global_RTs,
    apply_lbs,
)

IMG = (64, 64)


def _scene(shadow=True, seed=0, rings=(10, 12)):
    # pose-refinement/non-rigid off: they run BEFORE the renderer inputs
    # (verts_obs) which these tests construct directly
    cfg = default_cfg()
    m = cfg["model"]
    m["img_size"] = list(IMG)
    m["pose_refinement"]["name"] = "none"
    m["non_rigid"]["name"] = "none"
    m["shadow_module"]["name"] = "basic" if shadow else "none"
    m["normal_renderer"]["name"] = "mesh"
    m["canonical_geometry"]["deform_so3"] = True
    m["canonical_geometry"]["deform_scale"] = True
    info = synthetic_body(n_rings=rings[0], n_seg=rings[1])
    params, statics, gom_cfg = init_gom(jax.random.PRNGKey(seed), m, info)
    # non-trivial local rotations/scales so the Steiner path is exercised
    k = jax.random.PRNGKey(seed + 1)
    params["so3"] = 0.2 * jax.random.normal(k, params["so3"].shape)
    params["scale"] = 1.0 + 0.2 * jax.random.normal(jax.random.split(k)[0], params["scale"].shape)
    K, E = synthetic_camera(IMG, distance=2.2, focal=1.1 * IMG[1])
    joints = jnp.asarray(info["canonical_joints"])
    pose = np.zeros(72, np.float32)
    pose[12] = 0.4
    Rs, Ts = body_pose_to_body_RTs(jnp.asarray(pose), joints)
    batch = dict(
        K=jnp.asarray(K), E=jnp.asarray(E),
        cnl_gtfms=get_canonical_global_tfms(joints),
        dst_Rs=Rs, dst_Ts=Ts, dst_posevec=jnp.asarray(pose[3:] + 1e-2),
    )
    return params, statics, gom_cfg, batch


def _verts_obs(params, statics, batch, gom_cfg):
    gR, gT = get_global_RTs(
        batch["cnl_gtfms"], batch["dst_Rs"], batch["dst_Ts"], use_smplx=gom_cfg.use_smplx
    )
    return apply_lbs(params["vertices"], gR, gT, statics.lbs_weights)


def test_geometry_soa_matches_aos():
    from gomavatar_tpu.ops.geometry import frame_geometry
    from gomavatar_tpu.ops.steiner import face_covariances
    from gomavatar_tpu.ops.splat.projection import project_gaussians
    from gomavatar_tpu.ops.mesh_raster import project_mesh
    from gomavatar_tpu.ops.mesh_ops import vertex_normals_incidence
    import gomavatar_tpu.models.modules as M

    params, statics, gom_cfg, batch = _scene()
    K, E = batch["K"], batch["E"]
    faces = statics.faces
    verts_obs = _verts_obs(params, statics, batch, gom_cfg)
    colors = M.appearance_apply(params["appearance"])

    geom = frame_geometry(
        verts_obs, faces, params["so3"], params["scale"], colors,
        statics.vf_incidence, statics.vf_valid, K, E, IMG,
        gom_cfg.sigma, blur_margin_px=2.0,
    )

    cov = face_covariances(verts_obs, faces, params["so3"], params["scale"], gom_cfg.sigma)
    centroids = verts_obs[faces].mean(axis=1)
    proj = project_gaussians(centroids, cov, K, E, IMG)
    tbl = np.asarray(geom.table)
    valid = np.asarray(proj.valid)

    # splat projection channels reproduce the AoS EWA path
    assert np.array_equal(tbl[:, 5] > 0, valid)
    np.testing.assert_allclose(np.asarray(geom.depth), np.asarray(proj.depth), rtol=1e-5)
    np.testing.assert_allclose(
        tbl[valid, 0:2], np.asarray(proj.mean2d)[valid], atol=1e-3, rtol=1e-5
    )
    np.testing.assert_allclose(
        tbl[valid, 2:5], np.asarray(proj.conic)[valid], atol=1e-5, rtol=1e-4
    )

    # triangle plane-coefficient channels reproduce project_mesh barycentrics
    xy, z = project_mesh(verts_obs, K, E)
    tris_xy = np.asarray(xy[faces])  # (F, 3, 2)
    tris_z = np.asarray(z[faces])
    in_front = np.all(tris_z > 1e-5, axis=-1)
    x0, y0 = tris_xy[:, 0, 0], tris_xy[:, 0, 1]
    x1, y1 = tris_xy[:, 1, 0], tris_xy[:, 1, 1]
    x2, y2 = tris_xy[:, 2, 0], tris_xy[:, 2, 1]
    denom = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
    ok = in_front & (np.abs(denom) >= 1e-12)
    assert (tbl[:, 18] > 0).sum() > 0
    assert ((tbl[:, 18] > 0) == ok).mean() > 0.999  # near-degenerate edges may flip
    np.testing.assert_allclose(tbl[:, 13], x2, atol=1e-3, rtol=1e-5)
    np.testing.assert_allclose(tbl[:, 14], y2, atol=1e-3, rtol=1e-5)
    np.testing.assert_allclose(tbl[:, 17], tris_z[:, 2], atol=1e-5, rtol=1e-6)
    d = np.where(ok, denom, 1.0)
    w0x, w0y = (y1 - y2) / d, (x2 - x1) / d
    w1x, w1y = (y2 - y0) / d, (x0 - x2) / d
    np.testing.assert_allclose(tbl[ok, 9], w0x[ok], atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(tbl[ok, 10], w0y[ok], atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(tbl[ok, 11], w1x[ok], atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(tbl[ok, 12], w1y[ok], atol=1e-5, rtol=1e-4)
    # barycentrics from the plane channels hit 1 at each vertex
    dz0, dz1 = tris_z[:, 0] - tris_z[:, 2], tris_z[:, 1] - tris_z[:, 2]
    zx_ref = w0x * dz0 + w1x * dz1
    zy_ref = w0y * dz0 + w1y * dz1
    np.testing.assert_allclose(tbl[ok, 15], zx_ref[ok], atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(tbl[ok, 16], zy_ref[ok], atol=1e-4, rtol=1e-3)

    # summed camera-space vertex normals
    normals = vertex_normals_incidence(verts_obs, faces, statics.vf_incidence, statics.vf_valid)
    normals_cam = normals @ np.asarray(E)[:3, :3].T
    f_np = np.asarray(faces)
    nsum_ref = (
        np.asarray(normals_cam)[f_np[:, 0]]
        + np.asarray(normals_cam)[f_np[:, 1]]
        + np.asarray(normals_cam)[f_np[:, 2]]
    )
    np.testing.assert_allclose(tbl[:, 19:22], nsum_ref, atol=1e-5)


def test_bin_sorted_matches_bin_bboxes():
    from gomavatar_tpu.ops.splat.binning import bin_sorted, bin_bboxes, CHUNK

    rng = np.random.default_rng(1)
    N = 400
    cx = rng.uniform(-10, 74, N).astype(np.float32)
    cy = rng.uniform(-10, 74, N).astype(np.float32)
    r = rng.uniform(0.5, 9, N).astype(np.float32)
    depth = rng.uniform(0.5, 5, N).astype(np.float32)
    valid = rng.random(N) > 0.1
    args = (jnp.asarray(cx - r), jnp.asarray(cx + r), jnp.asarray(cy - r),
            jnp.asarray(cy + r), jnp.asarray(depth), jnp.asarray(valid))
    old = bin_bboxes(*args, IMG, max_tiles_per_primitive=16, buffer_factor=8)
    new = bin_sorted(*args, IMG, max_tiles_per_primitive=16, buffer_factor=8, active_cap=16)

    assert int(new.telemetry.dropped_buffer) == 0
    T = new.num_tiles_x * new.num_tiles_y
    order = np.asarray(new.order)
    aid = np.asarray(new.active_id)
    st = np.asarray(new.seg_start)
    ct = np.asarray(new.seg_count)
    pos = np.asarray(new.pos_of_tile)
    n_active = int(new.n_active)
    assert n_active <= 16

    # reconstruct per-tile lists from the old (repacked) binning
    eg = np.asarray(old.entry_gauss)
    ev = np.asarray(old.entry_valid)
    ost = np.asarray(old.tile_start)
    oct_ = np.asarray(old.tile_count)
    for t in range(T):
        seg_old = eg[ost[t] : ost[t] + oct_[t]][ev[ost[t] : ost[t] + oct_[t]] > 0]
        p = pos[t]
        seg_new = order[st[p] : st[p] + ct[p]] if p < 16 else np.array([], np.int32)
        if p >= 16:
            assert len(seg_old) == 0
            continue
        # same entries in the same depth order (ties may permute)
        assert len(seg_old) == len(seg_new), f"tile {t}"
        np.testing.assert_array_equal(np.sort(depth[seg_old]), np.sort(depth[seg_new]))
        assert set(seg_old) == set(seg_new)
        assert aid[p] == t


@pytest.mark.parametrize("shadow", [False, True])
def test_fused_eval_matches_unfused(shadow):
    params, statics, gom_cfg, batch = _scene(shadow=shadow)
    colors = params["appearance"]["colors"]
    verts_obs = _verts_obs(params, statics, batch, gom_cfg)

    # unfused reference: the train/CPU path of gom_forward (jnp kernels)
    rgb_ref, mask_ref, _ = gom_forward(
        params, statics, gom_cfg, batch["K"], batch["E"], batch["cnl_gtfms"],
        batch["dst_Rs"], batch["dst_Ts"], dst_posevec=batch["dst_posevec"],
        i_iter=1e7, train=False,
    )

    from gomavatar_tpu.ops.mesh_raster import np_log_blur
    blur_margin_px = (np_log_blur(gom_cfg.normal_renderer_sigma) ** 0.5) / (2.0 / min(IMG)) + 1.0
    out = render_frame_eval(
        params, statics, gom_cfg, verts_obs, colors, batch["K"], batch["E"],
        blur_margin_px, with_normal=True, interpret=True,
    )
    rgb, mask, normal, hard, _aux = out

    atol = 2e-2 if shadow else 2e-4  # bf16 MLP reassociation vs f32-only
    np.testing.assert_allclose(np.asarray(mask), np.asarray(mask_ref), atol=2e-4)
    close = np.isclose(np.asarray(rgb), np.asarray(rgb_ref), atol=atol)
    # allow a handful of triangle-edge pixels to select a different face
    assert close.mean() > 0.999, f"rgb mismatch on {(~close).mean():.2%} of pixels"


def test_fused_eval_normal_map_matches_mesh_raster():
    from gomavatar_tpu.ops.mesh_raster import rasterize_mesh, np_log_blur
    from gomavatar_tpu.ops.mesh_ops import vertex_normals_incidence

    params, statics, gom_cfg, batch = _scene(shadow=False)
    colors = params["appearance"]["colors"]
    verts_obs = _verts_obs(params, statics, batch, gom_cfg)
    normals = vertex_normals_incidence(
        verts_obs, statics.faces, statics.vf_incidence, statics.vf_valid
    )
    normals_cam = normals @ batch["E"][:3, :3].T

    blur_margin_px = (np_log_blur(gom_cfg.normal_renderer_sigma) ** 0.5) / (2.0 / min(IMG)) + 1.0
    _, _, normal, hard, _ = render_frame_eval(
        params, statics, gom_cfg, verts_obs, colors, batch["K"], batch["E"],
        blur_margin_px, with_normal=True, interpret=True,
    )
    # NOTE: the unfused mesh raster bins by tight triangle bboxes; the fused
    # path bins by the union bbox (superset) — same winner per pixel.
    ref = rasterize_mesh(
        verts_obs, normals_cam, statics.faces, batch["K"], batch["E"], IMG,
        soft_mask=False, blur_sigma=gom_cfg.normal_renderer_sigma,
        implementation="jnp",
    )
    close_m = np.isclose(np.asarray(hard), np.asarray(ref.mask), atol=1e-6)
    assert close_m.mean() > 0.999
    close_n = np.all(np.isclose(np.asarray(normal), np.asarray(ref.normal), atol=1e-4), axis=-1)
    assert (close_n | ~close_m).mean() > 0.999


def test_binning_telemetry_counts_active_overflow():
    from gomavatar_tpu.ops.splat.binning import bin_sorted

    rng = np.random.default_rng(2)
    N = 300
    cx = rng.uniform(0, 64, N).astype(np.float32)
    cy = rng.uniform(0, 64, N).astype(np.float32)
    r = np.full(N, 6.0, np.float32)
    bins = bin_sorted(
        jnp.asarray(cx - r), jnp.asarray(cx + r), jnp.asarray(cy - r), jnp.asarray(cy + r),
        jnp.asarray(rng.uniform(1, 2, N).astype(np.float32)),
        jnp.ones(N, bool), IMG,
        max_tiles_per_primitive=16, buffer_factor=8, active_cap=2,
    )
    assert int(bins.n_active) > 2
    assert int(bins.telemetry.dropped_buffer) > 0  # active-cap drops counted


def _random_boxes(seed, N=400, r_max=9.0):
    rng = np.random.default_rng(seed)
    cx = rng.uniform(-10, 74, N).astype(np.float32)
    cy = rng.uniform(-10, 74, N).astype(np.float32)
    r = rng.uniform(0.5, r_max, N).astype(np.float32)
    depth = rng.uniform(0.5, 5, N).astype(np.float32)
    valid = rng.random(N) > 0.1
    return (jnp.asarray(cx - r), jnp.asarray(cx + r), jnp.asarray(cy - r),
            jnp.asarray(cy + r), jnp.asarray(depth), jnp.asarray(valid))


def test_two_band_binning_is_bit_identical_when_cap_suffices():
    from gomavatar_tpu.ops.splat.binning import bin_sorted

    args = _random_boxes(2)
    kw = dict(max_tiles_per_primitive=16, buffer_factor=8, active_cap=16)
    one = bin_sorted(*args, IMG, **kw, band0=None)
    two = bin_sorted(*args, IMG, **kw, band0=4, overflow_cap=args[0].shape[0])
    # segment layout identical (the sorted REAL-entry prefix is unique;
    # only the never-read sentinel tail of `order` may differ)
    for field in ("active_id", "seg_start", "seg_count", "pos_of_tile", "n_active"):
        np.testing.assert_array_equal(
            np.asarray(getattr(one, field)), np.asarray(getattr(two, field)),
            err_msg=field,
        )
    _assert_segments_equal(one, two)
    for field in one.telemetry._fields:
        assert int(getattr(one.telemetry, field)) == int(
            getattr(two.telemetry, field)
        ), field


def _assert_segments_equal(one, two, flags=False):
    st, ct = np.asarray(one.seg_start), np.asarray(one.seg_count)
    o1, o2 = np.asarray(one.order), np.asarray(two.order)
    for p in range(st.shape[0]):
        s, c = st[p], ct[p]
        np.testing.assert_array_equal(o1[s : s + c], o2[s : s + c], err_msg=f"slot {p}")
        if flags:
            for f in ("entry_splat", "entry_mesh"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(one, f))[s : s + c],
                    np.asarray(getattr(two, f))[s : s + c],
                    err_msg=f"slot {p} {f}",
                )


def test_two_band_binning_flag_boxes_identical():
    from gomavatar_tpu.ops.splat.binning import bin_sorted

    bx0, bx1, by0, by1, depth, valid = _random_boxes(3)
    # two sub-boxes whose union is the outer box (splat shrunk, mesh shifted)
    sbox = (bx0, bx1 - 3.0, by0, by1, valid)
    mbox = (bx0 + 2.0, bx1, by0, by1, valid)
    kw = dict(max_tiles_per_primitive=16, buffer_factor=8, active_cap=16,
              flag_boxes=(sbox, mbox))
    one = bin_sorted(bx0, bx1, by0, by1, depth, valid, IMG, **kw, band0=None)
    two = bin_sorted(bx0, bx1, by0, by1, depth, valid, IMG, **kw, band0=4,
                     overflow_cap=bx0.shape[0])
    for field in ("seg_start", "seg_count"):
        np.testing.assert_array_equal(
            np.asarray(getattr(one, field)), np.asarray(getattr(two, field)),
            err_msg=field,
        )
    _assert_segments_equal(one, two, flags=True)


def test_two_band_binning_counts_overflow_cap_drops():
    from gomavatar_tpu.ops.splat.binning import bin_sorted

    args = _random_boxes(4, r_max=30.0)  # many primitives cover > 4 tiles
    kw = dict(max_tiles_per_primitive=16, buffer_factor=8, active_cap=16)
    full = bin_sorted(*args, IMG, **kw, band0=4, overflow_cap=args[0].shape[0])
    capped = bin_sorted(*args, IMG, **kw, band0=4, overflow_cap=1)
    n_cover_gt4_prims = int(full.telemetry.truncated_prims)
    lost = int(capped.telemetry.dropped_budget) - int(full.telemetry.dropped_budget)
    trimmed = int(capped.telemetry.truncated_prims) - n_cover_gt4_prims
    # the capped run must report every overflow primitive beyond slot 1 as
    # trimmed, with a positive per-primitive tile loss
    assert trimmed > 0 and lost >= trimmed
    # entries on band-A tiles (first 4 per primitive) are still all present
    assert int(capped.n_active) > 0


def test_two_band_bin_bboxes_identical_when_cap_suffices():
    from gomavatar_tpu.ops.splat.binning import bin_bboxes

    args = _random_boxes(5)
    kw = dict(max_tiles_per_primitive=16, buffer_factor=8)
    one = bin_bboxes(*args, IMG, **kw)
    two = bin_bboxes(*args, IMG, **kw, band0=4, overflow_cap=args[0].shape[0])
    for field in ("entry_gauss", "entry_valid", "entry_splat", "entry_mesh",
                  "tile_start", "tile_count"):
        np.testing.assert_array_equal(
            np.asarray(getattr(one, field)), np.asarray(getattr(two, field)),
            err_msg=field,
        )
    for field in one.telemetry._fields:
        assert int(getattr(one.telemetry, field)) == int(
            getattr(two.telemetry, field)
        ), field


def test_frame_geometry_window_culls_offwindow_mesh_faces():
    """Faces whose blurred bbox misses the render window must not reach
    binning (valid_mesh False) — a windowed render (e.g. the quadrant
    teacher renders of tools/make_e2e_data.py) would otherwise clamp
    thousands of off-window faces onto the boundary tiles and overflow the
    kernel's per-tile sweep cap.  Splat culling (projection.py on_screen)
    already behaved this way; this pins the mesh pass to match."""
    from gomavatar_tpu.ops.geometry import frame_geometry
    import gomavatar_tpu.models.modules as M

    params, statics, gom_cfg, batch = _scene()
    verts_obs = _verts_obs(params, statics, batch, gom_cfg)
    colors = M.appearance_apply(params["appearance"])
    margin = 2.0

    def geo(K):
        return frame_geometry(
            verts_obs, statics.faces, params["so3"], params["scale"], colors,
            statics.vf_incidence, statics.vf_valid, jnp.asarray(K),
            batch["E"], IMG, gom_cfg.sigma, blur_margin_px=margin,
        )

    base = geo(batch["K"])
    n_base = int(np.asarray(base.valid_mesh).sum())
    assert n_base > 0

    # window far from the subject: everything culled, both passes
    K_off = np.asarray(batch["K"], np.float32).copy()
    K_off[0, 2] -= 10 * IMG[0]
    off = geo(K_off)
    assert int(np.asarray(off.valid_mesh).sum()) == 0
    assert int(np.asarray(off.valid_splat).sum()) == 0

    # window over the left half: culls SOME faces, and agrees exactly with
    # the baseline bbox-vs-window test away from fp-boundary ties
    dx = IMG[0] // 2
    K_half = np.asarray(batch["K"], np.float32).copy()
    K_half[0, 2] -= dx
    half = geo(K_half)
    vm = np.asarray(half.valid_mesh)
    n_half = int(vm.sum())
    assert 0 < n_half < n_base

    # shifted bboxes from the BASELINE geometry predict the half-window cull
    x1s = np.asarray(base.mx1) - dx  # mx1 already includes +margin
    x0s = np.asarray(base.mx0) - dx
    base_vm = np.asarray(base.valid_mesh)
    must_keep = base_vm & (x1s >= 1.0) & (x0s <= IMG[0] - 2.0)
    must_cull = ~base_vm | (x1s <= -1.0) | (x0s >= IMG[0] + 0.0)
    assert np.all(vm[must_keep]), "over-culled a face overlapping the window"
    assert not np.any(vm[must_cull]), "kept a face clear of the window"
