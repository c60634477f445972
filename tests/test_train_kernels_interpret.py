"""Interpreter-mode regression tests for the TRAIN Pallas kernels' gradient
masking.

The custom-VJP backward kernels (splat ``_bwd_kernel``, mesh raster's) write
their ``d_entries`` HBM output only for the chunks of segments they actually
sweep; every other slot keeps whatever bytes were in the buffer.  On hardware
that is stale memory (occasionally NaN — this nondeterministically NaN'd
full training runs); the Pallas interpreter deliberately fills unwritten
output regions with NaN, which makes the leak deterministic and testable on
CPU.  The fix (``jnp.where`` over ``entry_valid * written_slot_mask``) must
keep all gradients finite and matching the jnp autodiff twins.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from gomavatar_tpu.ops.splat.projection import project_gaussians
from gomavatar_tpu.ops.splat.render import render_gaussians
from gomavatar_tpu.ops.splat import binning as B

W, H = 64, 64


def _scene(rng, n=160, c=3):
    means = rng.normal(size=(n, 3)) * np.array([0.5, 0.5, 0.2]) + np.array([0, 0, 3.0])
    A = rng.normal(size=(n, 3, 3)) * 0.05
    cov = A @ np.transpose(A, (0, 2, 1)) + np.eye(3) * 1e-4
    colors = rng.random(size=(n, c))
    opacity = rng.random(size=(n,)) * 0.9 + 0.05
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]])
    E = np.eye(4)
    return tuple(
        jnp.asarray(x, jnp.float32) for x in (means, cov, colors, opacity, K, E)
    )


def test_written_slot_mask_covers_exactly_the_swept_chunks(rng):
    means, cov, colors, opacity, K, E = _scene(rng)
    proj = project_gaussians(means, cov, K, E, (W, H))
    bins = B.bin_gaussians(
        proj.mean2d, proj.radius, proj.depth, proj.valid, (W, H),
        max_tiles_per_gaussian=32, buffer_factor=8,
    )
    Dp = bins.entry_valid.shape[0]
    got = np.asarray(B.written_slot_mask(bins.tile_start, bins.tile_count, Dp, ncmax=64))
    # oracle: per-tile loop over the segment intervals
    want = np.zeros(Dp, np.float32)
    ts, tc = np.asarray(bins.tile_start), np.asarray(bins.tile_count)
    for t in range(ts.shape[0]):
        n = min(int(tc[t]), 64 * B.CHUNK)
        want[int(ts[t]) : int(ts[t]) + n] = 1.0
    np.testing.assert_array_equal(got, want)
    # every valid entry is inside a written region at this scene scale
    assert (np.asarray(bins.entry_valid) <= want).all()
    # and the buffer has unwritten padding regions for the leak to hide in
    assert want.sum() < Dp


def test_pallas_train_splat_grads_finite_and_match_jnp_interpret(rng):
    means, cov, colors, opacity, K, E = _scene(rng)

    def run(impl):
        def f(colors_, opacity_):
            return render_gaussians(
                means, cov, colors_, opacity_, K, E, (W, H), implementation=impl
            )

        (img, alpha), vjp = jax.vjp(f, colors, opacity)
        d_colors, d_opacity = vjp((jnp.ones_like(img) * 0.5, jnp.ones_like(alpha)))
        return img, alpha, d_colors, d_opacity

    ref = run("jnp")
    with pltpu.force_tpu_interpret_mode():
        got = run("pallas")
    for name, a, b, tol in zip(
        ("img", "alpha", "d_colors", "d_opacity"), got, ref, (2e-5, 2e-5, 2e-4, 2e-4)
    ):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all(), f"{name} leaked non-finite values"
        np.testing.assert_allclose(a, b, atol=tol, err_msg=name)


def test_pallas_mesh_raster_grads_finite_and_match_jnp_interpret(rng):
    from gomavatar_tpu.ops.mesh_raster import rasterize_mesh
    from gomavatar_tpu.models.smpl import synthetic_body, synthetic_camera

    info = synthetic_body(n_rings=8, n_seg=10)
    verts = jnp.asarray(info["canonical_vertex"])
    faces = jnp.asarray(info["faces"], jnp.int32)
    normals = verts / jnp.linalg.norm(verts, axis=-1, keepdims=True)
    K, E = synthetic_camera((W, H), distance=2.2, focal=1.1 * H)
    K, E = jnp.asarray(K), jnp.asarray(E)

    def run(impl):
        def f(v, n):
            out = rasterize_mesh(
                v, n, faces, K, E, (W, H), soft_mask=True, blur_sigma=1e-5,
                implementation=impl,
            )
            return out.normal, out.soft_mask

        (normal, soft), vjp = jax.vjp(f, verts, normals)
        d_v, d_n = vjp((jnp.ones_like(normal), jnp.ones_like(soft)))
        return normal, soft, d_v, d_n

    ref = run("jnp")
    with pltpu.force_tpu_interpret_mode():
        got = run("pallas")
    for name, a, b, tol in zip(
        ("normal", "soft", "d_verts", "d_normals"), got, ref, (1e-5, 1e-4, 5e-3, 5e-3)
    ):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all(), f"{name} leaked non-finite values"
        close = np.isclose(a, b, atol=tol)
        assert close.mean() > 0.999, f"{name}: {(~close).mean():.2%} mismatch"
