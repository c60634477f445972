"""Splat rasterizer: tiled implementations vs the brute-force oracle, plus
gradient checks (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gomavatar_tpu.ops.splat.projection import project_gaussians
from gomavatar_tpu.ops.splat.render import render_gaussians

W, H = 64, 64


def make_scene(rng, n=200, c=4):
    """Random gaussian cloud in front of a simple camera."""
    means = rng.normal(size=(n, 3)) * np.array([0.5, 0.5, 0.2]) + np.array([0, 0, 3.0])
    # random PSD covariances with ~0.05 scale
    A = rng.normal(size=(n, 3, 3)) * 0.05
    cov = A @ np.transpose(A, (0, 2, 1)) + np.eye(3) * 1e-4
    colors = rng.random(size=(n, c))
    opacity = rng.random(size=(n,)) * 0.9 + 0.05
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]])
    E = np.eye(4)
    return (
        jnp.asarray(means, jnp.float32),
        jnp.asarray(cov, jnp.float32),
        jnp.asarray(colors, jnp.float32),
        jnp.asarray(opacity, jnp.float32),
        jnp.asarray(K, jnp.float32),
        jnp.asarray(E, jnp.float32),
    )


def test_projection_basics(rng):
    means, cov, colors, opacity, K, E = make_scene(rng)
    proj = project_gaussians(means, cov, K, E, (W, H))
    assert bool(jnp.any(proj.valid))
    # center point projects to image center
    center = jnp.asarray([[0.0, 0.0, 3.0]])
    p = project_gaussians(center, cov[:1], K, E, (W, H))
    np.testing.assert_allclose(np.asarray(p.mean2d[0]), [W / 2 - 0.5, H / 2 - 0.5], atol=1e-4)
    assert float(p.depth[0]) == pytest.approx(3.0)


def test_projection_culls_behind_camera(rng):
    means = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, 0.05]], jnp.float32)
    cov = jnp.tile(jnp.eye(3) * 1e-3, (2, 1, 1)).astype(jnp.float32)
    K = jnp.asarray([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]], jnp.float32)
    proj = project_gaussians(means, cov, K, jnp.eye(4), (W, H))
    assert not bool(proj.valid[0])
    assert not bool(proj.valid[1])  # in front but inside znear


def test_tiled_matches_reference(rng):
    means, cov, colors, opacity, K, E = make_scene(rng)
    ref_img, ref_alpha = render_gaussians(
        means, cov, colors, opacity, K, E, (W, H), implementation="reference"
    )
    img, alpha = render_gaussians(
        means, cov, colors, opacity, K, E, (W, H), implementation="jnp"
    )
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref_img), atol=2e-5)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref_alpha), atol=2e-5)
    # scene actually renders something
    assert float(jnp.max(alpha)) > 0.5


def test_tiled_matches_reference_dense(rng):
    """Enough gaussians that tiles hold multiple chunks."""
    means, cov, colors, opacity, K, E = make_scene(rng, n=1500)
    ref_img, _ = render_gaussians(
        means, cov, colors, opacity, K, E, (W, H), implementation="reference"
    )
    img, _ = render_gaussians(
        means, cov, colors, opacity, K, E, (W, H), implementation="jnp"
    )
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref_img), atol=5e-5)


def test_bg_blend(rng):
    means, cov, colors, opacity, K, E = make_scene(rng, n=20)
    bg = jnp.asarray([1.0, 0.5, 0.25, 0.0])
    img, alpha = render_gaussians(
        means, cov, colors, opacity, K, E, (W, H), implementation="jnp", bg_color=bg
    )
    # a corner pixel with no splat coverage shows the background exactly
    corner_alpha = float(alpha[0, 0])
    if corner_alpha < 1e-6:
        np.testing.assert_allclose(np.asarray(img[0, 0]), np.asarray(bg), atol=1e-6)


def test_gradients_match_reference(rng):
    """Autodiff grads of tiled jnp path == grads of the brute-force oracle."""
    means, cov, colors, opacity, K, E = make_scene(rng, n=60)
    target = jnp.zeros((H, W, 4))

    def loss_fn(impl):
        def f(means, colors, opacity):
            img, alpha = render_gaussians(
                means, cov, colors, opacity, K, E, (W, H), implementation=impl
            )
            return jnp.mean((img - target) ** 2) + jnp.mean(alpha)

        return f

    g_ref = jax.grad(loss_fn("reference"), argnums=(0, 1, 2))(means, colors, opacity)
    g_jnp = jax.grad(loss_fn("jnp"), argnums=(0, 1, 2))(means, colors, opacity)
    for a, b, name in zip(g_ref, g_jnp, ["means", "colors", "opacity"]):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b, a, atol=2e-4 * scale, err_msg=name)


def test_gradients_finite_differences(rng):
    """Spot-check d(loss)/d(opacity) against finite differences."""
    means, cov, colors, opacity, K, E = make_scene(rng, n=30)

    def f(op):
        img, _ = render_gaussians(means, cov, colors, op, K, E, (W, H), implementation="jnp")
        return jnp.sum(img[..., 0])

    g = np.asarray(jax.grad(f)(opacity))
    eps = 1e-3
    for i in [0, 7, 19]:
        op_p = opacity.at[i].add(eps)
        op_m = opacity.at[i].add(-eps)
        fd = (float(f(op_p)) - float(f(op_m))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=0.05, atol=1e-3)


def test_binning_telemetry_zero_on_normal_scene(rng):
    """Default budgets must cover a typical scene exactly (all-zero drops =
    parity with the CUDA rasterizer's dynamic binning)."""
    from gomavatar_tpu.ops.splat.binning import bin_gaussians

    means, cov, colors, opacity, K, E = make_scene(rng)
    proj = project_gaussians(means, cov, K, E, (W, H))
    bins = bin_gaussians(proj.mean2d, proj.radius, proj.depth, proj.valid, (W, H))
    tel = bins.telemetry
    assert int(tel.dropped_budget) == 0
    assert int(tel.dropped_buffer) == 0
    assert int(tel.truncated_prims) == 0
    assert int(tel.max_tile_entries) > 0


def test_binning_telemetry_detects_overflow(rng):
    """A constructed close-up (huge radii, tiny budgets) must report drops
    instead of failing silently (round-1 VERDICT weak #3)."""
    from gomavatar_tpu.ops.splat.binning import bin_gaussians

    n = 64
    mean2d = jnp.asarray(rng.random((n, 2)) * [W, H], jnp.float32)
    radius = jnp.full((n,), 40.0, jnp.float32)  # covers many tiles each
    depth = jnp.asarray(rng.random(n) + 1.0, jnp.float32)
    valid = jnp.ones((n,), bool)
    bins = bin_gaussians(
        mean2d, radius, depth, valid, (W, H), max_tiles_per_gaussian=2
    )
    assert int(bins.telemetry.dropped_budget) > 0
    assert int(bins.telemetry.truncated_prims) > 0
    # buffer cap: a dense close-up with a tiny buffer_factor drops entries
    n2 = 400
    mean2d2 = jnp.asarray(rng.random((n2, 2)) * [W, H], jnp.float32)
    bins2 = bin_gaussians(
        mean2d2,
        jnp.full((n2,), 40.0, jnp.float32),
        jnp.asarray(rng.random(n2) + 1.0, jnp.float32),
        jnp.ones((n2,), bool),
        (W, H),
        max_tiles_per_gaussian=16,
        buffer_factor=1,
    )
    assert int(bins2.telemetry.dropped_buffer) > 0


def test_binning_telemetry_reaches_train_losses(rng):
    """The trainer surfaces the counters next to the losses."""
    from gomavatar_tpu.config import default_cfg
    from gomavatar_tpu.trainer import Trainer
    from gomavatar_tpu.models.smpl import synthetic_body, synthetic_camera
    from gomavatar_tpu.ops.skeleton import (
        body_pose_to_body_RTs,
        get_canonical_global_tfms,
    )

    cfg = default_cfg()
    cfg["img_size"] = [48, 48]
    cfg["model"]["img_size"] = [48, 48]
    cfg["train"]["losses"]["lpips"]["coeff"] = 0.0
    info = synthetic_body(n_rings=6, n_seg=6)
    tr = Trainer(cfg, info)
    K, E = synthetic_camera((48, 48), distance=3.0, focal=45.0)
    joints = jnp.asarray(info["canonical_joints"])
    pose = np.zeros(72, np.float32)
    Rs, Ts = body_pose_to_body_RTs(jnp.asarray(pose), joints)
    batch = {
        "K": jnp.asarray(K), "E": jnp.asarray(E),
        "cnl_gtfms": get_canonical_global_tfms(joints),
        "dst_Rs": Rs, "dst_Ts": Ts,
        "dst_posevec": jnp.asarray(pose[3:] + 1e-2),
        "bgcolor": jnp.zeros(3),
        "target_rgbs": jnp.zeros((48, 48, 3), jnp.float32),
        "target_masks": jnp.zeros((48, 48), jnp.float32),
    }
    _, losses = tr.step(batch)
    assert "bin_drop_budget" in losses and "bin_drop_buffer" in losses
    assert int(losses["bin_drop_budget"]) == 0
    assert int(losses["bin_drop_buffer"]) == 0
