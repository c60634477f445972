"""On-TPU verification: Pallas kernels vs jnp oracles, fused vs unfused.

The pytest suite pins the CPU backend (tests/conftest.py) so the Pallas
TPU lowering itself is exercised here, on real hardware:

    python tools/verify_tpu.py

Checks (hard-fails on mismatch):
  1. splat: pallas forward+grads == tiled-jnp == brute-force oracle;
  2. mesh raster: pallas forward+grads == jnp path;
  3. fused eval renderer == separate kernels (bit-exact);
  4. full-model eval forward is finite and covered;
  5. opt-in perf paths (compacted tile grids, two-band train binning) ==
     their default twins ON HARDWARE (real stale-HBM bytes, unlike the
     interpreter's deterministic NaN fill).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def check(name, a, b, tol):
    d = float(jnp.max(jnp.abs(a - b)))
    status = "OK " if d <= tol else "FAIL"
    print(f"[{status}] {name}: maxdiff {d:.3g} (tol {tol:g})")
    assert d <= tol, name


def main():
    assert jax.default_backend() != "cpu", "run on TPU"
    rng = np.random.default_rng(0)

    # --- 1. splat ---------------------------------------------------------
    from gomavatar_tpu.ops.splat.render import render_gaussians

    W = H = 64
    n = 300
    means = rng.normal(size=(n, 3)) * np.array([0.5, 0.5, 0.2]) + np.array([0, 0, 3.0])
    A = rng.normal(size=(n, 3, 3)) * 0.05
    cov = A @ np.transpose(A, (0, 2, 1)) + np.eye(3) * 1e-4
    colors = jnp.asarray(rng.random((n, 4)), jnp.float32)
    opacity = jnp.asarray(rng.random(n) * 0.9 + 0.05, jnp.float32)
    K = jnp.asarray([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]], jnp.float32)
    E = jnp.eye(4)
    means, cov = jnp.asarray(means, jnp.float32), jnp.asarray(cov, jnp.float32)

    img_r, a_r = render_gaussians(means, cov, colors, opacity, K, E, (W, H), implementation="reference")
    img_p, a_p = render_gaussians(means, cov, colors, opacity, K, E, (W, H), implementation="pallas")
    # kernel dots use 2x2 bf16 splits (~2^-16 relative, pallas_kernel._dot_mixed)
    check("splat fwd vs oracle (img)", img_p, img_r, 5e-5)
    check("splat fwd vs oracle (alpha)", a_p, a_r, 5e-5)

    def loss(impl):
        def f(m, c, o):
            img, alpha = render_gaussians(m, cov, c, o, K, E, (W, H), implementation=impl)
            return jnp.mean(img**2) + jnp.mean(alpha)
        return f

    g_j = jax.grad(loss("jnp"), argnums=(0, 1, 2))(means, colors, opacity)
    g_p = jax.grad(loss("pallas"), argnums=(0, 1, 2))(means, colors, opacity)
    for gj, gp, nm in zip(g_j, g_p, ["means", "colors", "opacity"]):
        scale = float(jnp.abs(gj).max()) + 1e-12
        check(f"splat grad {nm}", gp / scale, gj / scale, 1e-4)

    # --- 2. mesh raster ---------------------------------------------------
    from gomavatar_tpu.ops.mesh_raster import rasterize_mesh

    verts = jnp.asarray(
        np.array(
            [[-0.4, -0.4, 2.0], [0.4, -0.4, 2.0], [0.0, 0.5, 2.0],
             [0.0, -0.5, 3.0], [0.9, -0.5, 3.0], [0.45, 0.6, 3.0]],
            np.float32,
        )
    )
    normals = jnp.asarray(np.array([[0, 0, -1]] * 3 + [[1, 0, 0]] * 3, np.float32))
    faces = jnp.asarray(np.array([[0, 1, 2], [3, 4, 5]], np.int64))
    oj = rasterize_mesh(verts, normals, faces, K, E, (W, H), soft_mask=True, blur_sigma=1e-4, implementation="jnp")
    op = rasterize_mesh(verts, normals, faces, K, E, (W, H), soft_mask=True, blur_sigma=1e-4, implementation="pallas")
    check("mesh normal", op.normal, oj.normal, 1e-6)
    check("mesh mask", op.mask, oj.mask, 1e-6)
    check("mesh soft", op.soft_mask, oj.soft_mask, 1e-6)

    def mloss(impl):
        def f(v, n_):
            out = rasterize_mesh(v, n_, faces, K, E, (W, H), soft_mask=True, blur_sigma=1e-4, implementation=impl)
            return jnp.sum(out.soft_mask) + jnp.sum(out.normal**2)
        return f

    gj = jax.grad(mloss("jnp"), argnums=(0, 1))(verts, normals)
    gp = jax.grad(mloss("pallas"), argnums=(0, 1))(verts, normals)
    for a_, b_, nm in zip(gj, gp, ["verts", "normals"]):
        scale = float(jnp.abs(a_).max()) + 1e-12
        check(f"mesh grad {nm}", b_ / scale, a_ / scale, 1e-5)

    # --- 2b. opt-in perf paths == default twins on hardware ---------------
    def loss_cap(cap):
        def f(m, c, o):
            img, alpha = render_gaussians(
                m, cov, c, o, K, E, (W, H), implementation="pallas",
                active_cap=cap,
            )
            return jnp.mean(img**2) + jnp.mean(alpha)
        return f

    T_tiles = (W // 16) * (H // 16)
    img_c, a_c = render_gaussians(
        means, cov, colors, opacity, K, E, (W, H),
        implementation="pallas", active_cap=T_tiles,
    )
    check("splat compact fwd (img)", img_c, img_p, 0.0)
    check("splat compact fwd (alpha)", a_c, a_p, 0.0)
    g_c = jax.grad(loss_cap(T_tiles), argnums=(0, 1, 2))(means, colors, opacity)
    g_full = jax.grad(loss_cap(None), argnums=(0, 1, 2))(means, colors, opacity)
    for gc, gf, nm in zip(g_c, g_full, ["means", "colors", "opacity"]):
        check(f"splat compact grad {nm}", gc, gf, 0.0)

    def mloss_cap(cap):
        def f(v, n_):
            out = rasterize_mesh(
                v, n_, faces, K, E, (W, H), soft_mask=True, blur_sigma=1e-4,
                implementation="pallas", active_cap=cap,
            )
            return jnp.sum(out.soft_mask) + jnp.sum(out.normal**2)
        return f

    oc = rasterize_mesh(
        verts, normals, faces, K, E, (W, H), soft_mask=True, blur_sigma=1e-4,
        implementation="pallas", active_cap=T_tiles,
    )
    check("mesh compact fwd", oc.normal, op.normal, 0.0)
    check("mesh compact soft", oc.soft_mask, op.soft_mask, 0.0)
    gc = jax.grad(mloss_cap(T_tiles), argnums=(0, 1))(verts, normals)
    gf = jax.grad(mloss_cap(None), argnums=(0, 1))(verts, normals)
    for a_, b_, nm in zip(gc, gf, ["verts", "normals"]):
        check(f"mesh compact grad {nm}", a_, b_, 0.0)

    # --- 2c. soft-saturation skip == exact sweep on hardware --------------
    # (module-global knob: toggle + clear the jit caches so the kernels
    # retrace; the skip truncates exp-suppressed ~1e-8 contributions)
    import gomavatar_tpu.ops.mesh_raster_pallas as mrp

    o_sat = rasterize_mesh(
        verts, normals, faces, K, E, (W, H), soft_mask=True, blur_sigma=1e-4,
        implementation="pallas",
    )
    g_sat = jax.grad(mloss_cap(None), argnums=(0, 1))(verts, normals)
    mrp._SAT_ON = False
    mrp._fwd_call.clear_cache()
    mrp._bwd_call.clear_cache()
    try:
        o_ex = rasterize_mesh(
            verts, normals, faces, K, E, (W, H), soft_mask=True, blur_sigma=1e-4,
            implementation="pallas",
        )
        g_ex = jax.grad(mloss_cap(None), argnums=(0, 1))(verts, normals)
    finally:
        mrp._SAT_ON = True
        mrp._fwd_call.clear_cache()
        mrp._bwd_call.clear_cache()
    check("soft-sat fwd normal", o_sat.normal, o_ex.normal, 0.0)
    check("soft-sat fwd soft", o_sat.soft_mask, o_ex.soft_mask, 1e-6)
    for a_, b_, nm in zip(g_sat, g_ex, ["verts", "normals"]):
        scale = float(jnp.max(jnp.abs(b_))) + 1e-12
        check(f"soft-sat grad {nm}", a_ / scale, b_ / scale, 1e-5)

    # --- 3. fused vs unfused on the flagship ------------------------------
    from __graft_entry__ import _flagship
    from gomavatar_tpu.models.gom import gom_forward

    params, statics, cfg, batch, _ = _flagship()
    args = (batch["K"], batch["E"], batch["cnl_gtfms"], batch["dst_Rs"], batch["dst_Ts"])
    rgb_f, mask_f, _ = gom_forward(params, statics, cfg, *args, dst_posevec=batch["dst_posevec"], i_iter=1e7, train=False)
    rgb_u, mask_u, _ = gom_forward(params, statics, cfg, *args, dst_posevec=batch["dst_posevec"], i_iter=1e7, train=True)
    # the fused eval kernel evaluates the splat quadratic/barycentrics in
    # tile-local coefficient form and bf16x3-split matmuls — identical math
    # up to float reassociation (~1e-5).  Isolated pixels can differ more:
    # reassociation near the T<1e-4 termination threshold flips whether a
    # borderline entry contributes at all (a discrete ~1e-3 jump), so the
    # criterion is fraction-of-pixels like the CPU suite's.
    for name, a, b in (("rgb", rgb_f, rgb_u), ("mask", mask_f, mask_u)):
        close = jnp.abs(a - b) <= 1e-4
        frac = float(jnp.mean(close.astype(jnp.float32)))
        worst = float(jnp.max(jnp.abs(a - b)))
        status = "OK " if frac > 0.9995 and worst < 5e-3 else "FAIL"
        print(f"[{status}] fused vs unfused {name}: {1-frac:.2e} px > 1e-4, worst {worst:.3g}")
        assert status == "OK ", f"fused vs unfused {name}"

    # --- 3b. 2-term eval cumsum within tolerance of the 3-term default ----
    import gomavatar_tpu.ops.frame_render as fr

    fr._FAST = 2
    fr._frame_call.clear_cache()
    try:
        rgb_2, mask_2, _ = gom_forward(
            params, statics, cfg, *args,
            dst_posevec=batch["dst_posevec"], i_iter=1e7, train=False,
        )
    finally:
        fr._FAST = True
        fr._frame_call.clear_cache()
    for name, a, b in (("rgb", rgb_2, rgb_f), ("mask", mask_2, mask_f)):
        close = jnp.abs(a - b) <= 1e-3
        frac = float(jnp.mean(close.astype(jnp.float32)))
        worst = float(jnp.max(jnp.abs(a - b)))
        status = "OK " if frac > 0.999 and worst < 5e-3 else "FAIL"
        print(f"[{status}] cumsum-2term vs 3term {name}: {1-frac:.2e} px > 1e-3, worst {worst:.3g}")
        assert status == "OK ", f"cumsum terms {name}"

    # --- 4. sanity --------------------------------------------------------
    assert bool(jnp.all(jnp.isfinite(rgb_f)))
    cov_frac = float(jnp.mean(mask_f > 0.5))
    print(f"[OK ] flagship coverage {cov_frac:.3f}")
    assert 0.02 < cov_frac < 0.9

    # --- 5. phase-scaled tile budgets: zero-drop at BOTH phases ------------
    # (ADVICE r3 / VERDICT r3 item 2): the pre-subdivision phase runs with
    # 4x budgets (64/32, buffer 16) which subdivide_gom rescales to the
    # tuned 16/8/4 — the e2e train stage relies on both being drop-free at
    # real 512^2 framing.  Train-path forward so the union binning (splat
    # radius bbox + blurred triangle bbox) is the one measured.
    for sub, label in ((False, "base 14.8k"), (True, "subdiv 59k")):
        p5, s5, c5, b5, _ = _flagship(subdivide=sub)
        _, m5, aux5 = gom_forward(
            p5, s5, c5, b5["K"], b5["E"], b5["cnl_gtfms"], b5["dst_Rs"],
            b5["dst_Ts"], dst_posevec=b5["dst_posevec"], i_iter=1e7, train=True,
        )
        t5 = aux5["binning"]
        db, dbuf, mx = (
            int(t5.dropped_budget), int(t5.dropped_buffer), int(t5.max_tile_entries)
        )
        budgets = (c5.max_tiles_per_gaussian, c5.max_tiles_per_face, c5.buffer_factor)
        ok = db == 0 and dbuf == 0 and float(jnp.mean(m5 > 0.5)) > 0.02
        print(
            f"[{'OK ' if ok else 'FAIL'}] phase budgets {label} {budgets}: "
            f"dropped_budget={db} dropped_buffer={dbuf} max_tile_entries={mx}"
        )
        assert ok, f"phase budgets {label}"

    # --- 6. pose-refinement differentiability (train_pose.py frame_loss) --
    # The fused eval renderer is forward-only Pallas (no JVP rule) — pose
    # refinement must differentiate the TRAIN renderer.  Compile + run one
    # value_and_grad of the full pose-vars -> FK -> render -> loss chain on
    # hardware, the exact program cli/train_pose.py scans (caught live: a
    # train=False forward here crashed the E2E chain in the JVP rule).
    from gomavatar_tpu.models.smpl import synthetic_body
    from gomavatar_tpu.ops.skeleton import body_pose_to_body_RTs

    p6, s6, c6, b6, _ = _flagship(img_size=(128, 128), subdivide=False, rings=(24, 24))
    joints6 = jnp.asarray(synthetic_body(n_rings=24, n_seg=24)["canonical_joints"])

    def pose_loss(pose_vars):
        dst_Rs6, dst_Ts6 = body_pose_to_body_RTs(pose_vars["poses"], joints6)
        rgb6, mask6, _ = gom_forward(
            p6, s6, c6, b6["K"], b6["E"], b6["cnl_gtfms"], dst_Rs6, dst_Ts6,
            dst_posevec=pose_vars["poses"][3:] + 1e-2, i_iter=1e7,
            global_R=pose_vars["Rh"], global_T=pose_vars["Th"], train=True,
        )
        return jnp.mean(jnp.abs(rgb6)) + jnp.mean(mask6)

    pv = {"Rh": jnp.zeros(3), "Th": jnp.zeros(3),
          "poses": jnp.full((72,), 0.05, jnp.float32)}
    loss6, g6 = jax.jit(jax.value_and_grad(pose_loss))(pv)
    leaves6 = jax.tree_util.tree_leaves(g6)
    finite6 = bool(jnp.isfinite(loss6)) and all(
        bool(jnp.all(jnp.isfinite(v))) for v in leaves6
    )
    gnorm6 = float(sum(jnp.sum(v**2) for v in leaves6)) ** 0.5
    ok6 = finite6 and gnorm6 > 0
    print(
        f"[{'OK ' if ok6 else 'FAIL'}] pose-path value_and_grad (train "
        f"renderer): loss {float(loss6):.4f}, grad norm {gnorm6:.3g}"
    )
    assert ok6, "pose-path grad"

    print("ALL TPU CHECKS PASSED")


if __name__ == "__main__":
    main()
