"""Mesh rasterizer vs numpy brute-force oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from gomavatar_tpu.ops.mesh_raster import rasterize_mesh, project_mesh

W, H = 64, 64
K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], dtype=np.float32)
E = np.eye(4, dtype=np.float32)


def simple_scene():
    """Two triangles at different depths, overlapping in the middle."""
    verts = np.array(
        [
            # near triangle (z=2)
            [-0.4, -0.4, 2.0],
            [0.4, -0.4, 2.0],
            [0.0, 0.5, 2.0],
            # far triangle (z=3), shifted right
            [0.0, -0.5, 3.0],
            [0.9, -0.5, 3.0],
            [0.45, 0.6, 3.0],
        ],
        dtype=np.float32,
    )
    faces = np.array([[0, 1, 2], [3, 4, 5]], dtype=np.int64)
    normals = np.array(
        [[0, 0, -1], [0, 0, -1], [0, 0, -1], [1, 0, 0], [1, 0, 0], [1, 0, 0]],
        dtype=np.float32,
    )
    return jnp.asarray(verts), jnp.asarray(normals), jnp.asarray(faces)


def np_point_in_tri(px, py, tri):
    (x0, y0), (x1, y1), (x2, y2) = tri
    denom = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
    if abs(denom) < 1e-12:
        return False, None
    w0 = ((y1 - y2) * (px - x2) + (x2 - x1) * (py - y2)) / denom
    w1 = ((y2 - y0) * (px - x2) + (x0 - x2) * (py - y2)) / denom
    w2 = 1 - w0 - w1
    return (w0 >= 0 and w1 >= 0 and w2 >= 0), (w0, w1, w2)


def test_hard_pass_matches_bruteforce():
    verts, normals, faces = simple_scene()
    out = rasterize_mesh(verts, normals, faces, jnp.asarray(K), jnp.asarray(E), (W, H), soft_mask=False)
    xy, z = project_mesh(verts, jnp.asarray(K), jnp.asarray(E))
    xy, z = np.asarray(xy), np.asarray(z)
    faces_np = np.asarray(faces)
    normals_np = np.asarray(normals)

    mask = np.asarray(out.mask)
    normal = np.asarray(out.normal)
    for py in range(0, H, 3):
        for px in range(0, W, 3):
            best_z, best_n = np.inf, np.zeros(3)
            for f in range(len(faces_np)):
                tri = xy[faces_np[f]]
                inside, w = np_point_in_tri(px, py, tri)
                if inside:
                    zf = sum(w[i] * z[faces_np[f][i]] for i in range(3))
                    if zf < best_z:
                        best_z = zf
                        best_n = normals_np[faces_np[f]].sum(axis=0)
            hit = best_z < np.inf
            assert mask[py, px] == (1.0 if hit else 0.0), (px, py)
            np.testing.assert_allclose(normal[py, px], best_n if hit else 0, atol=1e-5)


def test_depth_order():
    """Near triangle's normal wins in the overlap region."""
    verts, normals, faces = simple_scene()
    out = rasterize_mesh(verts, normals, faces, jnp.asarray(K), jnp.asarray(E), (W, H), soft_mask=False)
    # the near triangle (normal -z summed = (0,0,-3)) covers the center
    c = np.asarray(out.normal)[H // 2, W // 2 - 4]
    np.testing.assert_allclose(c, [0, 0, -3], atol=1e-5)


def test_soft_mask_profile():
    verts, normals, faces = simple_scene()
    out = rasterize_mesh(
        verts, normals, faces, jnp.asarray(K), jnp.asarray(E), (W, H),
        soft_mask=True, sigma=1e-4, blur_sigma=1e-4,
    )
    soft = np.asarray(out.soft_mask)
    mask = np.asarray(out.mask)
    # deep inside ~1, far outside ~0
    assert soft[H // 2, W // 2 - 4] > 0.95
    assert soft[2, 2] < 0.05
    # soft mask is a smoothed version of the hard mask
    assert 0 <= soft.min() and soft.max() <= 1.0
    inside_mean = soft[mask > 0.5].mean()
    outside_mean = soft[mask < 0.5].mean()
    assert inside_mean > 0.8 > 0.2 > outside_mean


def test_soft_mask_gradients_flow_to_verts():
    verts, normals, faces = simple_scene()

    def f(v):
        out = rasterize_mesh(v, normals, faces, jnp.asarray(K), jnp.asarray(E), (W, H), soft_mask=True, blur_sigma=1e-4)
        return jnp.sum(out.soft_mask)

    g = np.asarray(jax.grad(f)(verts))
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 1e-3  # geometry receives signal


def test_normal_gradients_flow():
    verts, normals, faces = simple_scene()

    def f(n):
        out = rasterize_mesh(verts, n, faces, jnp.asarray(K), jnp.asarray(E), (W, H), soft_mask=False)
        return jnp.sum(out.normal**2)

    g = np.asarray(jax.grad(f)(normals))
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 1e-3


def test_behind_camera_culled():
    verts = jnp.asarray(
        np.array([[-0.4, -0.4, -2.0], [0.4, -0.4, -2.0], [0.0, 0.5, -2.0]], np.float32)
    )
    normals = jnp.asarray(np.tile([0, 0, -1.0], (3, 1)).astype(np.float32))
    faces = jnp.asarray(np.array([[0, 1, 2]], np.int64))
    out = rasterize_mesh(verts, normals, faces, jnp.asarray(K), jnp.asarray(E), (W, H), soft_mask=True)
    assert float(jnp.sum(out.mask)) == 0.0
    assert float(jnp.sum(out.soft_mask)) < 1e-6
