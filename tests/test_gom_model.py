"""End-to-end GoM model tests on the synthetic rig (SURVEY.md §7 minimum
slice: canonical mesh -> FK+LBS -> Steiner cov -> splat render)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gomavatar_tpu.config import default_cfg
from gomavatar_tpu.models.gom import init_gom, gom_forward, subdivide_gom
from gomavatar_tpu.models.smpl import synthetic_body, synthetic_camera
from gomavatar_tpu.ops.skeleton import (
    body_pose_to_body_RTs,
    get_canonical_global_tfms,
)

IMG = (64, 64)


def full_model_cfg():
    cfg = default_cfg()
    m = cfg["model"]
    m["img_size"] = list(IMG)
    m["pose_refinement"]["name"] = "basic"
    m["non_rigid"]["name"] = "basic"
    m["shadow_module"]["name"] = "basic"
    m["normal_renderer"]["name"] = "mesh"
    m["canonical_geometry"]["deform_so3"] = True
    m["canonical_geometry"]["deform_scale"] = True
    return m


@pytest.fixture(scope="module")
def setup():
    info = synthetic_body(n_rings=12, n_seg=10)
    params, statics, gom_cfg = init_gom(jax.random.PRNGKey(0), full_model_cfg(), info)
    K, E = synthetic_camera(IMG, distance=3.0, focal=60.0)
    joints = info["canonical_joints"]
    cnl_gtfms = get_canonical_global_tfms(jnp.asarray(joints))
    pose = np.zeros(72, np.float32)
    Rs, Ts = body_pose_to_body_RTs(jnp.asarray(pose), jnp.asarray(joints))
    posevec = jnp.asarray(pose[3:] + 1e-2)
    return dict(
        info=info, params=params, statics=statics, cfg=gom_cfg,
        K=jnp.asarray(K), E=jnp.asarray(E), cnl=cnl_gtfms, Rs=Rs, Ts=Ts, posevec=posevec,
    )


def test_forward_shapes_and_coverage(setup):
    s = setup
    rgb, mask, aux = gom_forward(
        s["params"], s["statics"], s["cfg"], s["K"], s["E"], s["cnl"], s["Rs"], s["Ts"],
        dst_posevec=s["posevec"], i_iter=0.0, train=True,
    )
    W, H = IMG
    assert rgb.shape == (H, W, 3) and mask.shape == (H, W)
    assert aux["normal_mask"].shape == (H, W)
    # the body is visible and covers a plausible area
    cov = float(jnp.mean(mask > 0.5))
    assert 0.02 < cov < 0.9
    # at init (colors 0.5, shading ~1.0) covered pixels are mid-gray
    center = np.asarray(rgb)[H // 2, W // 2]
    assert np.all(center > 0.2) and np.all(center < 0.8)
    assert np.all(np.isfinite(np.asarray(rgb)))


def test_forward_at_init_shading_is_identityish(setup):
    s = setup
    _, _, aux = gom_forward(
        s["params"], s["statics"], s["cfg"], s["K"], s["E"], s["cnl"], s["Rs"], s["Ts"],
        dst_posevec=s["posevec"], i_iter=0.0, train=True,
    )
    # shadow MLP last layer is ~0 => sigmoid ~0.5 => x2 ~1.0 (model.py:283)
    sh = np.asarray(aux["shadow"])
    np.testing.assert_allclose(sh[sh > 0].mean(), 1.0, atol=0.05)


def test_posed_forward_differs(setup):
    s = setup
    rgb0, _, _ = gom_forward(
        s["params"], s["statics"], s["cfg"], s["K"], s["E"], s["cnl"], s["Rs"], s["Ts"],
        dst_posevec=s["posevec"], i_iter=0.0,
    )
    pose = np.zeros(72, np.float32)
    pose[3 * 4 + 0] = 0.8  # bend a joint
    Rs2, Ts2 = body_pose_to_body_RTs(
        jnp.asarray(pose), jnp.asarray(s["info"]["canonical_joints"])
    )
    rgb1, _, _ = gom_forward(
        s["params"], s["statics"], s["cfg"], s["K"], s["E"], s["cnl"], Rs2, Ts2,
        dst_posevec=jnp.asarray(pose[3:] + 1e-2), i_iter=0.0,
    )
    assert float(jnp.abs(rgb0 - rgb1).max()) > 0.01


def test_grads_flow_to_all_params(setup):
    s = setup

    def loss_fn(params):
        rgb, mask, aux = gom_forward(
            params, s["statics"], s["cfg"], s["K"], s["E"], s["cnl"], s["Rs"], s["Ts"],
            dst_posevec=s["posevec"], i_iter=2e5, train=True,
        )
        return jnp.mean(rgb**2) + jnp.mean(mask) + jnp.mean(aux["normal_mask"])

    g = jax.grad(loss_fn)(s["params"])
    flat = jax.tree_util.tree_leaves_with_path(g)
    nonzero = {jax.tree_util.keystr(k[:1]) for k, v in flat if float(jnp.abs(v).max()) > 0}
    for name in ["vertices", "appearance", "scale", "so3", "shadow"]:
        assert any(name in k for k in nonzero), f"no gradient reached {name}: {nonzero}"
    for k, v in flat:
        assert np.all(np.isfinite(np.asarray(v))), f"non-finite grad at {k}"


def test_jit_forward(setup):
    s = setup
    f = jax.jit(
        lambda p, st, K, E, cnl, Rs, Ts, pv, it: gom_forward(
            p, st, s["cfg"], K, E, cnl, Rs, Ts, dst_posevec=pv, i_iter=it
        )
    )
    rgb1, m1, _ = f(s["params"], s["statics"], s["K"], s["E"], s["cnl"], s["Rs"], s["Ts"], s["posevec"], 0.0)
    rgb2, m2, _ = gom_forward(
        s["params"], s["statics"], s["cfg"], s["K"], s["E"], s["cnl"], s["Rs"], s["Ts"],
        dst_posevec=s["posevec"], i_iter=0.0,
    )
    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb2), atol=1e-5)


def test_subdivision(setup):
    s = setup
    p2, st2, cfg2 = subdivide_gom(s["params"], s["statics"], s["cfg"])
    assert cfg2.num_faces == 4 * s["cfg"].num_faces
    assert p2["so3"].shape[0] == 4 * s["params"]["so3"].shape[0]
    assert p2["appearance"]["colors"].shape[0] == 4 * s["cfg"].num_faces // 4 * 4
    rgb, mask, _ = gom_forward(
        p2, st2, cfg2, s["K"], s["E"], s["cnl"], s["Rs"], s["Ts"],
        dst_posevec=s["posevec"], i_iter=0.0,
    )
    assert np.all(np.isfinite(np.asarray(rgb)))
    # subdivided model renders nearly the same silhouette
    _, mask0, _ = gom_forward(
        s["params"], s["statics"], s["cfg"], s["K"], s["E"], s["cnl"], s["Rs"], s["Ts"],
        dst_posevec=s["posevec"], i_iter=0.0,
    )
    iou = float(
        jnp.sum((mask > 0.5) & (mask0 > 0.5)) / jnp.sum((mask > 0.5) | (mask0 > 0.5))
    )
    assert iou > 0.7


def test_global_transform(setup):
    s = setup
    rgb0, _, _ = gom_forward(
        s["params"], s["statics"], s["cfg"], s["K"], s["E"], s["cnl"], s["Rs"], s["Ts"],
        dst_posevec=s["posevec"], i_iter=0.0,
        global_R=jnp.zeros(3), global_T=jnp.zeros(3),
    )
    rgb1, _, _ = gom_forward(
        s["params"], s["statics"], s["cfg"], s["K"], s["E"], s["cnl"], s["Rs"], s["Ts"],
        dst_posevec=s["posevec"], i_iter=0.0,
        global_R=jnp.zeros(3), global_T=jnp.asarray([0.3, 0.0, 0.0]),
    )
    assert float(jnp.abs(rgb0 - rgb1).max()) > 0.01
