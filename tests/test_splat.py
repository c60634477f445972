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
