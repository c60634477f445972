"""Geometry core vs independent numpy oracles (SURVEY.md §4: unit tests for
LBS/FK against straightforward per-bone reference math)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gomavatar_tpu.ops.transforms import so3_exp, so3_log, construct_G
from gomavatar_tpu.ops.skeleton import (
    SMPL_PARENT,
    body_pose_to_body_RTs,
    get_canonical_global_tfms,
    get_global_RTs,
    apply_lbs,
    fk_chain,
)
from gomavatar_tpu.ops.steiner import steiner_transform, face_covariances


def np_rodrigues(rvec):
    """Independent oracle: matrix exponential via scipy-free closed form."""
    theta = np.linalg.norm(rvec)
    if theta < 1e-10:
        return np.eye(3)
    k = rvec / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def test_so3_exp_matches_rodrigues(rng):
    rvecs = rng.normal(size=(32, 3))
    R = np.asarray(so3_exp(jnp.asarray(rvecs)))
    for i in range(32):
        np.testing.assert_allclose(R[i], np_rodrigues(rvecs[i]), atol=1e-5)


def test_so3_exp_is_rotation(rng):
    rvecs = rng.normal(size=(16, 3)) * 3.0
    R = np.asarray(so3_exp(jnp.asarray(rvecs)))
    eye = np.eye(3)
    for i in range(16):
        np.testing.assert_allclose(R[i] @ R[i].T, eye, atol=1e-5)
        assert np.linalg.det(R[i]) > 0.99


def test_so3_exp_zero_angle_grad_finite():
    g = jax.grad(lambda r: jnp.sum(so3_exp(r)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_so3_log_roundtrip(rng):
    rvecs = rng.normal(size=(16, 3))  # |angle| < pi w.h.p.
    rvecs = rvecs / np.maximum(np.linalg.norm(rvecs, axis=-1, keepdims=True), 1.0) * 2.0
    R = so3_exp(jnp.asarray(rvecs))
    back = np.asarray(so3_log(R))
    np.testing.assert_allclose(back, rvecs, atol=1e-4)


def oracle_fk(cnl_gtfms, dst_Rs, dst_Ts):
    """Sequential per-bone oracle for get_global_RTs (the reference's
    formulation, utils/body_util.py:612-638, re-derived in numpy)."""
    J = dst_Rs.shape[0]
    local = np.zeros((J, 4, 4))
    for i in range(J):
        local[i, :3, :3] = dst_Rs[i]
        local[i, :3, 3] = dst_Ts[i]
        local[i, 3, 3] = 1.0
    G = np.zeros_like(local)
    G[0] = local[0]
    for i in range(1, J):
        G[i] = G[SMPL_PARENT[i]] @ local[i]
    f = np.stack([G[i] @ np.linalg.inv(cnl_gtfms[i]) for i in range(J)])
    return f[:, :3, :3], f[:, :3, 3]


def test_fk_matches_oracle(rng):
    J = 24
    tpose = rng.normal(size=(J, 3)).astype(np.float64)
    pose = (rng.normal(size=(J * 3,)) * 0.3).astype(np.float64)

    Rs, Ts = body_pose_to_body_RTs(jnp.asarray(pose), jnp.asarray(tpose))
    cnl = get_canonical_global_tfms(jnp.asarray(tpose))
    gR, gT = get_global_RTs(cnl[None], Rs[None], Ts[None])

    oR, oT = oracle_fk(np.asarray(cnl), np.asarray(Rs), np.asarray(Ts))
    np.testing.assert_allclose(np.asarray(gR[0]), oR, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gT[0]), oT, atol=1e-4)


def test_zero_pose_is_identity_skinning(rng):
    """With the zero pose, skinning transforms are identity and LBS is a no-op."""
    J = 24
    tpose = rng.normal(size=(J, 3))
    pose = np.zeros(J * 3)
    Rs, Ts = body_pose_to_body_RTs(jnp.asarray(pose), jnp.asarray(tpose))
    cnl = get_canonical_global_tfms(jnp.asarray(tpose))
    gR, gT = get_global_RTs(cnl[None], Rs[None], Ts[None])

    pts = jnp.asarray(rng.normal(size=(100, 3)))
    w = rng.random(size=(100, J))
    w = jnp.asarray(w / w.sum(axis=1, keepdims=True))
    out = apply_lbs(pts, gR[0], gT[0], w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-4)


def test_apply_lbs_matches_per_bone_sum(rng):
    """Blended-transform LBS == naive per-bone weighted sum."""
    J, N = 24, 50
    gR = np.asarray(so3_exp(jnp.asarray(rng.normal(size=(J, 3)))))
    gT = rng.normal(size=(J, 3))
    pts = rng.normal(size=(N, 3))
    w = rng.random(size=(N, J))
    w = w / w.sum(axis=1, keepdims=True)

    expect = np.zeros((N, 3))
    for b in range(J):
        expect += w[:, b : b + 1] * (pts @ gR[b].T + gT[b])

    out = apply_lbs(jnp.asarray(pts), jnp.asarray(gR), jnp.asarray(gT), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-4)


def test_fk_jit_and_vmap(rng):
    J, B = 24, 4
    tpose = rng.normal(size=(J, 3))
    poses = rng.normal(size=(B, J * 3)) * 0.2
    cnl = get_canonical_global_tfms(jnp.asarray(tpose))

    def single(pose):
        Rs, Ts = body_pose_to_body_RTs(pose, jnp.asarray(tpose))
        return get_global_RTs(cnl, Rs, Ts)

    batched = jax.jit(jax.vmap(single))(jnp.asarray(poses))
    for b in range(B):
        ref = single(jnp.asarray(poses[b]))
        np.testing.assert_allclose(np.asarray(batched[0][b]), np.asarray(ref[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(batched[1][b]), np.asarray(ref[1]), atol=1e-5)


# ---------------------------------------------------------------------------
# Steiner covariance
# ---------------------------------------------------------------------------

def test_steiner_axes_span_triangle_plane(rng):
    tris = jnp.asarray(rng.normal(size=(10, 3, 3)))
    T = np.asarray(steiner_transform(tris, sigma=0.5))
    tris = np.asarray(tris)
    for f in range(10):
        n_tri = np.cross(tris[f, 1] - tris[f, 0], tris[f, 2] - tris[f, 0])
        n_tri /= np.linalg.norm(n_tri)
        a0, a1, nT = T[f, :, 0], T[f, :, 1], T[f, :, 2]
        # axes lie in the triangle plane
        assert abs(np.dot(a0, n_tri)) < 1e-5 * np.linalg.norm(a0) + 1e-6
        assert abs(np.dot(a1, n_tri)) < 1e-5 * np.linalg.norm(a1) + 1e-6
        # axes are conjugate semi-axes of an ellipse -> orthogonal at t0
        assert abs(np.dot(a0, a1)) < 1e-4 * np.linalg.norm(a0) * np.linalg.norm(a1) + 1e-6
        # normal column has length sigma
        np.testing.assert_allclose(np.linalg.norm(nT), 0.5, atol=1e-5)


def test_steiner_ellipse_contains_vertices_property(rng):
    """The Steiner circumellipse passes through the triangle's vertices:
    each vertex v satisfies ||A^-1 (v - c)|| == 1 where A = [axis0, axis1]
    restricted to the triangle plane."""
    tris = np.asarray(rng.normal(size=(5, 3, 3)))
    T = np.asarray(steiner_transform(jnp.asarray(tris), sigma=1e-3))
    for f in range(5):
        c = tris[f].mean(axis=0)
        # the transform's first two columns are the circumellipse semi-axes
        # (axis0/axis1 are the *inellipse* semi-axes, half the size; the
        # reference doubles them, models/model.py:40)
        A = np.stack([T[f, :, 0], T[f, :, 1]], axis=1)
        # least-squares coords in the ellipse frame
        for v in tris[f]:
            coef, *_ = np.linalg.lstsq(A, v - c, rcond=None)
            np.testing.assert_allclose(np.linalg.norm(coef), 1.0, atol=1e-4)


def test_face_covariances_psd(rng):
    verts = jnp.asarray(rng.normal(size=(12, 3)))
    faces = jnp.asarray(
        np.stack([rng.permutation(12)[:3] for _ in range(8)]).astype(np.int64)
    )
    so3 = jnp.asarray(rng.normal(size=(8, 3)) * 0.1)
    scale = jnp.asarray(np.abs(rng.normal(size=(8, 3))) + 0.5)
    cov = np.asarray(face_covariances(verts, faces, so3, scale))
    for f in range(8):
        np.testing.assert_allclose(cov[f], cov[f].T, atol=1e-6)
        eig = np.linalg.eigvalsh(cov[f])
        assert np.all(eig > -1e-8)
