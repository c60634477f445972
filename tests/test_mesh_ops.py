"""Mesh ops vs small closed-form cases and brute-force oracles."""

import numpy as np
import jax.numpy as jnp

from gomavatar_tpu.ops.mesh_ops import (
    MeshTopology,
    unique_edges,
    face_connectivity_pairs,
    normal_consistency_pairs,
    vertex_normals,
    face_normals,
    edge_lengths,
    uniform_laplacian_loss,
    normal_consistency_loss,
    color_consistency_loss,
    subdivide_mesh,
    replicate_face_attribute,
)


def make_quad():
    """Two triangles sharing an edge (a unit square split on the diagonal)."""
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], dtype=np.float64)
    faces = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int64)
    return verts, faces


def test_unique_edges_quad():
    verts, faces = make_quad()
    edges, face_to_edge = unique_edges(faces)
    assert edges.shape == (5, 2)
    # every face's edge ids reference edges containing exactly its vertices
    for f in range(2):
        for e in face_to_edge[f]:
            assert set(edges[e]).issubset(set(faces[f]))


def test_face_connectivity_quad():
    _, faces = make_quad()
    pairs = face_connectivity_pairs(faces)
    assert pairs.shape == (1, 2)
    assert set(pairs[0]) == {0, 1}


def test_normal_consistency_flat_is_zero():
    verts, faces = make_quad()
    quads = normal_consistency_pairs(faces)
    loss = normal_consistency_loss(jnp.asarray(verts), jnp.asarray(quads))
    assert float(loss) < 1e-6


def test_normal_consistency_folded_positive():
    verts, faces = make_quad()
    verts = verts.copy()
    verts[3, 2] = 1.0  # fold the second triangle out of plane
    quads = normal_consistency_pairs(faces)
    loss = normal_consistency_loss(jnp.asarray(verts), jnp.asarray(quads))
    assert float(loss) > 0.1


def test_vertex_normals_flat():
    verts, faces = make_quad()
    n = np.asarray(vertex_normals(jnp.asarray(verts), jnp.asarray(faces)))
    expect = np.array([0, 0, 1.0])
    for i in range(4):
        np.testing.assert_allclose(n[i], expect, atol=1e-6)


def test_face_normals_ccw():
    verts, faces = make_quad()
    n = np.asarray(face_normals(jnp.asarray(verts), jnp.asarray(faces)))
    np.testing.assert_allclose(n, np.tile([0, 0, 1.0], (2, 1)), atol=1e-12)


def test_laplacian_regular_interior_zero():
    """For a vertex at the centroid of its neighbors the Laplacian vanishes."""
    # hexagon fan: center vertex 0 surrounded by 6 symmetric neighbors
    angles = np.linspace(0, 2 * np.pi, 7)[:-1]
    ring = np.stack([np.cos(angles), np.sin(angles), np.zeros(6)], axis=1)
    verts = np.vstack([[0, 0, 0], ring])
    faces = np.array([[0, 1 + i, 1 + (i + 1) % 6] for i in range(6)], dtype=np.int64)
    topo = MeshTopology.build(faces, 7)
    loss = uniform_laplacian_loss(
        jnp.asarray(verts), jnp.asarray(topo.edges), jnp.asarray(topo.vertex_degree)
    )
    # center contributes 0; ring vertices have boundary contributions > 0
    # so just check the center's own laplacian via a brute-force oracle
    lap0 = ring.mean(axis=0) - verts[0]
    np.testing.assert_allclose(lap0, 0, atol=1e-12)
    assert float(loss) >= 0.0


def test_laplacian_matches_bruteforce(rng):
    verts, faces = make_quad()
    verts = verts + rng.normal(size=verts.shape) * 0.1
    topo = MeshTopology.build(faces, 4)
    loss = float(
        uniform_laplacian_loss(
            jnp.asarray(verts), jnp.asarray(topo.edges), jnp.asarray(topo.vertex_degree)
        )
    )
    # brute force: neighbors from unique edges
    adj = {i: set() for i in range(4)}
    for a, b in topo.edges:
        adj[a].add(b)
        adj[b].add(a)
    expect = np.mean(
        [
            np.sum((np.mean([verts[j] for j in adj[i]], axis=0) - verts[i]) ** 2)
            for i in range(4)
        ]
    )
    np.testing.assert_allclose(loss, expect, rtol=1e-6)


def test_color_consistency():
    colors = jnp.asarray(np.array([[1.0, 0, 0], [0, 1.0, 0]]))
    pairs = jnp.asarray(np.array([[0, 1]], dtype=np.int64))
    loss = float(color_consistency_loss(colors, pairs))
    np.testing.assert_allclose(loss, 2.0 / 3.0, rtol=1e-6)


def test_subdivide_quad():
    verts, faces = make_quad()
    w = np.arange(4, dtype=np.float64)[:, None] * np.ones((1, 2))
    nv, nf, attrs, face_index = subdivide_mesh(verts, faces, {"weights": w})
    assert nf.shape == (8, 3)
    assert nv.shape[0] == 4 + 5  # one midpoint per unique edge
    assert np.all(face_index == np.repeat([0, 1], 4))
    # midpoint attributes are endpoint means
    edges, _ = unique_edges(faces)
    for e_i, (a, b) in enumerate(edges):
        np.testing.assert_allclose(attrs["weights"][4 + e_i], (w[a] + w[b]) / 2)
    # all new faces have positive area and consistent winding (normal +z)
    n = np.asarray(face_normals(jnp.asarray(nv), jnp.asarray(nf)))
    np.testing.assert_allclose(n, np.tile([0, 0, 1.0], (8, 1)), atol=1e-9)
    # subdivided mesh has 4x the faces, preserves total area
    def area(v, f):
        t = v[f]
        return 0.5 * np.linalg.norm(np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0]), axis=1).sum()
    np.testing.assert_allclose(area(nv, nf), area(verts, faces), rtol=1e-12)


def test_replicate_face_attribute():
    attr = np.arange(6, dtype=np.float64).reshape(2, 3)
    out = replicate_face_attribute(attr)
    assert out.shape == (8, 3)
    np.testing.assert_allclose(out[:4], np.tile(attr[0], (4, 1)))
    np.testing.assert_allclose(out[4:], np.tile(attr[1], (4, 1)))
