"""Gather-based index transposes (ops/mesh_ops.DualIndex / gather_vjp):
gradients must equal plain-autodiff gathers exactly, including masked
incidence tables and degree overflow beyond the table cap."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gomavatar_tpu.ops.mesh_ops import (
    MeshTopology,
    DualIndex,
    build_dual_index,
    gather_vjp,
    build_neighbor_table,
    uniform_laplacian_loss,
    uniform_laplacian_loss_nbr,
    normal_consistency_loss,
    color_consistency_loss,
    vertex_normals_incidence,
    vertex_normals_from_tri,
)
from gomavatar_tpu.models.smpl import synthetic_body


@pytest.fixture(scope="module")
def topo():
    info = synthetic_body(n_rings=8, n_seg=20)  # pole degree 20 > cap 16
    faces = np.asarray(info["faces"])
    V = int(faces.max()) + 1
    return MeshTopology.build(faces, V), np.asarray(info["canonical_vertex"], np.float32)


def test_gather_vjp_matches_plain(topo):
    t, verts = topo
    faces = jnp.asarray(t.faces, jnp.int32)
    dual = jax.tree_util.tree_map(jnp.asarray, t.dual_faces)
    v = jnp.asarray(verts)
    g = jax.random.normal(jax.random.PRNGKey(0), faces.shape + (3,))

    def loss_plain(v):
        return jnp.sum(v[faces] * g)

    def loss_dual(v):
        return jnp.sum(gather_vjp(v, faces, dual) * g)

    np.testing.assert_allclose(loss_plain(v), loss_dual(v), rtol=1e-6)
    gp = jax.grad(loss_plain)(v)
    gd = jax.grad(loss_dual)(v)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gp), atol=1e-5, rtol=1e-5)


def test_gather_vjp_overflow_exact():
    # degree > cap on value 0: overflow list must carry the rest exactly
    idx = np.zeros((40, 2), np.int64)
    idx[:, 1] = np.arange(40) % 5
    dual = jax.tree_util.tree_map(jnp.asarray, build_dual_index(idx, 5, cap=4))
    assert dual.ov_pos.shape[0] > 0
    v = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)), jnp.float32)
    g = jnp.asarray(np.random.default_rng(1).normal(size=(40, 2, 3)), jnp.float32)
    idxj = jnp.asarray(idx, jnp.int32)
    gp = jax.grad(lambda v: jnp.sum(v[idxj] * g))(v)
    gd = jax.grad(lambda v: jnp.sum(gather_vjp(v, idxj, dual) * g))(v)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gp), atol=1e-5, rtol=1e-5)


def test_laplacian_nbr_matches_edge_scatter(topo):
    t, verts = topo
    v = jnp.asarray(verts) + 0.01 * jax.random.normal(jax.random.PRNGKey(1), verts.shape)
    edges = jnp.asarray(t.edges, jnp.int32)
    deg = jnp.asarray(t.vertex_degree)
    nt = jax.tree_util.tree_map(jnp.asarray, t.nbr_table)
    assert nt.ov_v.shape[0] > 0  # pole overflow exercised
    l_ref = uniform_laplacian_loss(v, edges, deg)
    l_nbr = uniform_laplacian_loss_nbr(v, nt, deg)
    np.testing.assert_allclose(float(l_nbr), float(l_ref), rtol=1e-5)
    g_ref = jax.grad(uniform_laplacian_loss)(v, edges, deg)
    g_nbr = jax.grad(uniform_laplacian_loss_nbr)(v, nt, deg)
    scale = float(jnp.abs(g_ref).max())
    np.testing.assert_allclose(
        np.asarray(g_nbr) / scale, np.asarray(g_ref) / scale, atol=1e-5
    )


def test_consistency_losses_with_duals(topo):
    t, verts = topo
    v = jnp.asarray(verts)
    quads = jnp.asarray(t.nc_quads, jnp.int32)
    d_nc = jax.tree_util.tree_map(jnp.asarray, t.dual_nc)
    np.testing.assert_allclose(
        float(normal_consistency_loss(v, quads, d_nc)),
        float(normal_consistency_loss(v, quads)),
        rtol=1e-6,
    )
    g0 = jax.grad(normal_consistency_loss)(v, quads)
    g1 = jax.grad(lambda v: normal_consistency_loss(v, quads, d_nc))(v)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-6)

    F = t.faces.shape[0]
    colors = jax.random.uniform(jax.random.PRNGKey(2), (F, 3))
    conn = jnp.asarray(t.face_connectivity, jnp.int32)
    d_conn = jax.tree_util.tree_map(jnp.asarray, t.dual_conn)
    g0 = jax.grad(color_consistency_loss)(colors, conn)
    g1 = jax.grad(lambda c: color_consistency_loss(c, conn, d_conn))(colors)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-6)


def test_vertex_normals_from_tri_matches(topo):
    t, verts = topo
    v = jnp.asarray(verts)
    faces = jnp.asarray(t.faces, jnp.int32)
    inc = jnp.asarray(t.vf_incidence, jnp.int32)
    val = jnp.asarray(t.vf_valid)
    d_f = jax.tree_util.tree_map(jnp.asarray, t.dual_faces)
    d_i = jax.tree_util.tree_map(jnp.asarray, t.dual_vfinc)
    n_ref = vertex_normals_incidence(v, faces, inc, val)
    n_tri = vertex_normals_from_tri(gather_vjp(v, faces, d_f), inc, val, d_i)
    np.testing.assert_allclose(np.asarray(n_tri), np.asarray(n_ref), atol=1e-6)

    g = jax.random.normal(jax.random.PRNGKey(3), n_ref.shape)
    g0 = jax.grad(lambda v: jnp.sum(vertex_normals_incidence(v, faces, inc, val) * g))(v)
    g1 = jax.grad(
        lambda v: jnp.sum(
            vertex_normals_from_tri(gather_vjp(v, faces, d_f), inc, val, d_i) * g
        )
    )(v)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-5)
