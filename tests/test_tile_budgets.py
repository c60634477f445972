"""Phase-scaled tile budgets (ADVICE r3): per-primitive tile budgets and the
entry-buffer factor scale with the face count so that every training phase —
pre-subdivision at base mesh resolution included — bins with zero drops at
512^2 framing, while the sort-key count M*F stays ~flat across phases.

Pins the computed budgets at the three real face counts (SMPL 13776,
SMPL-X 20908, subdivided SMPL 55104), checks subdivide_gom rescales them,
and asserts zero-drop binning on real projected geometry at a coarse and a
subdivided scale under the e2e 512^2 framing.  The on-hardware equivalent
(full train forward at both scales) lives in tools/verify_tpu.py.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gomavatar_tpu.config import default_cfg
from gomavatar_tpu.models.gom import (
    GoMConfig,
    init_gom,
    subdivide_gom,
    tile_budget_factor,
)
from gomavatar_tpu.models.smpl import synthetic_body, synthetic_camera

IMG = (512, 512)


def test_budget_factor_pinned():
    # ceil(55104 / F), clamped to [1, 4] — explicit policy, no banker's
    # rounding (ADVICE r3 low: round() gave 2.5 -> 2 at F=22040)
    assert tile_budget_factor(13776) == 4  # base SMPL
    assert tile_budget_factor(14400) == 4  # e2e tube body (rings=144, segs=48)
    assert tile_budget_factor(20908) == 3  # SMPL-X
    assert tile_budget_factor(27552) == 2  # ceil boundary: exactly 2.0
    assert tile_budget_factor(27551) == 3  # one face less: ceil(2.00004) = 3
    assert tile_budget_factor(55104) == 1  # subdivided SMPL (tuned scale)
    assert tile_budget_factor(55296) == 1
    assert tile_budget_factor(220416) == 1  # two subdivisions: still >= 1
    assert tile_budget_factor(152) == 4  # tiny test meshes clamp at 4x


def _cfg_at(num_faces: int) -> GoMConfig:
    m = default_cfg()["model"]
    m["img_size"] = list(IMG)
    return GoMConfig.from_model_cfg(m, num_faces // 2 + 2, num_faces)


def test_from_model_cfg_scales_all_budgets():
    # all three budgets scale together: per-gaussian, per-face, AND the
    # entry buffer factor (N*buffer_factor must stay ~flat, ADVICE r3 medium
    # #2: scaling only the per-primitive budget shrinks real-entry capacity
    # with N and trips the same zero-drop assert it was meant to fix)
    for faces, bf in ((13776, 4), (20908, 3), (55104, 1)):
        cfg = _cfg_at(faces)
        # per-gaussian budget: phase factor with a floor of 32 — the TRAINED
        # E2E avatar drops 77 entries at 16 and needs 32 for zero-drop
        # (tools/tune_trained_budgets.py sweep, BENCH_NOTES round-4 table)
        assert cfg.max_tiles_per_gaussian == max(32, 16 * bf), (
            faces, cfg.max_tiles_per_gaussian,
        )
        assert cfg.max_tiles_per_face == 8 * bf
        assert cfg.buffer_factor == 4 * bf
        # eval two-band binning: band A must hold a typical face's full
        # coverage at every phase, or >overflow_cap primitives spill to
        # band B and get dropped (the e2e teacher capture tripped this at
        # 14.4k faces: 3261 entries dropped with band0 stuck at 4)
        assert cfg.binning_band0 == 4 * bf
        # train-path two-band binning (promoted round 4: 67.1 vs 69.0
        # ms/step single-band at flagship scale, BENCH_NOTES A/B table)
        assert cfg.binning_band0_train == 4 * bf


def _full_model(n_rings, n_seg):
    info = synthetic_body(n_rings=n_rings, n_seg=n_seg)
    cfg = default_cfg()
    m = cfg["model"]
    m["img_size"] = list(IMG)
    m["shadow_module"]["name"] = "basic"
    m["normal_renderer"]["name"] = "mesh"
    m["canonical_geometry"]["deform_so3"] = True
    m["canonical_geometry"]["deform_scale"] = True
    params, statics, gcfg = init_gom(jax.random.PRNGKey(0), m, info)
    return info, params, statics, gcfg


def _binning_drops(params, statics, cfg):
    """The train path's exact shared union binning (gom_forward step 5-7) on
    canonical-pose geometry: verts_obs == vertices at zero pose, so FK/LBS
    are skipped without changing coverage."""
    from gomavatar_tpu.ops.fused_render import frame_union_bins
    from gomavatar_tpu.ops.mesh_raster import np_log_blur
    from gomavatar_tpu.ops.steiner import face_covariances_tri

    verts = params["vertices"]
    faces = statics.faces
    tri = verts[faces]
    cov = face_covariances_tri(tri, params["so3"], params["scale"], cfg.sigma)
    centroids = tri.mean(axis=1)
    K, E = synthetic_camera(IMG, distance=3.0, focal=550.0)
    W, H = cfg.img_size
    blur_margin_px = (np_log_blur(cfg.normal_renderer_sigma) ** 0.5) / (2.0 / min(W, H)) + 1.0
    *_, bins = frame_union_bins(
        centroids, cov, verts, faces, jnp.asarray(K), jnp.asarray(E),
        cfg.img_size,
        blur_margin_px=blur_margin_px,
        max_tiles_per_primitive=cfg.max_tiles_per_gaussian,
        buffer_factor=cfg.buffer_factor,
        band0=cfg.binning_band0_train,
        overflow_cap=max(faces.shape[0] // 8, 2048),
    )
    tel = bins.telemetry
    return int(tel.dropped_budget), int(tel.dropped_buffer)


@pytest.mark.slow
def test_subdivide_rescales_budgets_and_zero_drop():
    # coarse phase: ~7k faces -> bf 4; subdivided: ~28k -> bf 2.  (The full
    # 14.4k -> 57.6k pair costs ~4x more host time; the ratio arithmetic and
    # the coverage claim are identical, and the true e2e pair is validated
    # on hardware by tools/verify_tpu.py and the E2E run itself.)
    info, params, statics, cfg = _full_model(n_rings=96, n_seg=36)
    f0 = cfg.num_faces
    bf0 = tile_budget_factor(f0)
    assert bf0 == 4
    assert cfg.max_tiles_per_gaussian == 64 and cfg.buffer_factor == 16

    db, dbuf = _binning_drops(params, statics, cfg)
    assert db == 0 and dbuf == 0, (f0, db, dbuf)

    params2, statics2, cfg2 = subdivide_gom(params, statics, cfg)
    bf1 = tile_budget_factor(cfg2.num_faces)
    assert cfg2.num_faces == 4 * f0
    assert bf1 == 2
    # budgets rescaled by the factor ratio (ADVICE r3 medium #1: they used
    # to persist at 64/32 into the subdivided phase); the per-gaussian
    # budget floors at 32 = what from_model_cfg computes from scratch here
    assert cfg2.max_tiles_per_gaussian == max(32, 64 * bf1 // bf0) == 32
    assert cfg2.max_tiles_per_face == 32 * bf1 // bf0 == 16
    assert cfg2.buffer_factor == 16 * bf1 // bf0 == 8
    assert cfg2.binning_band0 == 16 * bf1 // bf0 == 8
    assert cfg2.binning_band0_train == 16 * bf1 // bf0 == 8

    db, dbuf = _binning_drops(params2, statics2, cfg2)
    assert db == 0 and dbuf == 0, (cfg2.num_faces, db, dbuf)


def test_replayed_budgets_match_fresh_config():
    """resume/load_for_eval replay subdivision from the base mesh; the
    rescale-with-floor must land on exactly the budgets from_model_cfg
    would compute from scratch at the final face count, or a resumed run
    silently trains under different binning than a fresh one."""
    # 96x36 rings: the subdivision crosses a factor boundary (bf 4 -> 2),
    # so the ratio rescale + floor actually has to agree with from_scratch
    info, params, statics, cfg = _full_model(n_rings=96, n_seg=36)
    _, _, cfg2 = subdivide_gom(params, statics, cfg)
    fresh = _cfg_at(cfg2.num_faces)
    for field in (
        "max_tiles_per_gaussian",
        "max_tiles_per_face",
        "buffer_factor",
        "binning_band0",
        "binning_band0_train",
    ):
        assert getattr(cfg2, field) == getattr(fresh, field), field


def test_subdivide_preserves_custom_budgets_when_factor_unchanged():
    # a user-tuned absolute budget is preserved exactly through a phase
    # change that doesn't cross a factor boundary (tiny meshes clamp at 4x
    # before AND after): the rescale multiplies by bf_new/bf_old == 1
    info, params, statics, cfg = _full_model(n_rings=12, n_seg=8)
    cfg = dataclasses.replace(
        cfg, max_tiles_per_gaussian=96, max_tiles_per_face=48, buffer_factor=24
    )
    assert tile_budget_factor(cfg.num_faces) == 4
    _, _, cfg2 = subdivide_gom(params, statics, cfg)
    assert tile_budget_factor(cfg2.num_faces) == 4
    assert cfg2.max_tiles_per_gaussian == 96
    assert cfg2.max_tiles_per_face == 48
    assert cfg2.buffer_factor == 24


def test_subdivide_floor_wins_over_sub_floor_custom_budget():
    # a custom max_tiles_per_gaussian BELOW _MTG_FLOOR is deliberately
    # raised to the floor by the rescale (sub-floor budgets measurably drop
    # trained splat coverage — the floor wins; models/gom.py:subdivide_gom)
    from gomavatar_tpu.models.gom import _MTG_FLOOR

    info, params, statics, cfg = _full_model(n_rings=12, n_seg=8)
    cfg = dataclasses.replace(cfg, max_tiles_per_gaussian=_MTG_FLOOR // 2)
    _, _, cfg2 = subdivide_gom(params, statics, cfg)
    assert cfg2.max_tiles_per_gaussian == _MTG_FLOOR
