"""Aux losses, kNN, sampling, profiling utilities."""

import numpy as np
import jax.numpy as jnp

from gomavatar_tpu.ops.aux_losses import (
    tv_loss,
    chamfer_distance,
    knn_points,
    estimate_pointcloud_local_coord_frames,
)
from gomavatar_tpu.utils.sampling import make_weights_for_pose_balance
from gomavatar_tpu.utils.profiling import Timer


def test_tv_loss_flat_zero():
    img = jnp.ones((8, 8, 3))
    assert float(tv_loss(img)) == 0.0
    ramp = jnp.arange(8.0)[None, :, None] * jnp.ones((8, 1, 3))
    assert float(tv_loss(ramp)) > 0.0


def test_chamfer_identity_zero(rng):
    a = jnp.asarray(rng.random((50, 3)), jnp.float32)
    assert float(chamfer_distance(a, a)) < 1e-5
    b = a + 0.5
    assert float(chamfer_distance(a, b)) > 0.01


def test_knn(rng):
    pts = jnp.asarray(rng.random((40, 3)), jnp.float32)
    d, idx = knn_points(pts, pts, 3)
    # first neighbor of each point is itself
    np.testing.assert_array_equal(np.asarray(idx[:, 0]), np.arange(40))
    np.testing.assert_allclose(np.asarray(d[:, 0]), 0.0, atol=1e-6)
    assert np.all(np.diff(np.asarray(d), axis=1) >= -1e-6)  # sorted


def test_local_frames_planar(rng):
    # points on a plane -> smallest eigenvalue ~0, its vector ~ plane normal
    xy = rng.random((100, 2))
    pts = jnp.asarray(np.concatenate([xy, np.zeros((100, 1))], -1), jnp.float32)
    eigvals, eigvecs = estimate_pointcloud_local_coord_frames(pts, k=12)
    assert float(jnp.max(eigvals[:, 0])) < 1e-8
    nrm = np.abs(np.asarray(eigvecs[:, :, 0]))  # smallest-eig vector
    np.testing.assert_allclose(nrm[:, 2], 1.0, atol=1e-4)


def test_pose_balance_weights():
    # two clusters of yaw: 9 frames at 0 deg, 1 frame at 180 deg
    Es = np.tile(np.eye(4), (10, 1, 1))
    R_flip = np.diag([-1.0, 1.0, -1.0])
    Es[9, :3, :3] = R_flip
    w = make_weights_for_pose_balance(Es)
    assert w.shape == (10,)
    np.testing.assert_allclose(w.sum(), 10.0, rtol=1e-5)
    assert w[9] > w[0] * 5  # the rare orientation is upweighted


def test_timer():
    t = Timer()
    with t.section("a"):
        sum(range(1000))
    rep = t.report()
    assert "a" in rep and rep["a"]["count"] == 1
