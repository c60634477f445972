"""Generate the 512^2 synthetic teacher capture for the end-to-end
demonstration schedule (configs/exps/e2e_synthetic.yaml; VERDICT r2 item 1).

A "teacher" GoM avatar — the procedural tube body at SMPL scale (13,824
faces), with a procedural per-face albedo, smoothly bumped geometry and a
non-trivial shadow MLP — is animated over a pose sequence and rendered with
this framework's own eval renderer.  The frames are written in the
reference's exact preprocessed artifact format (images/, masks/,
cameras.pkl, mesh_infos.pkl, canonical_joints.pkl — dataset/train.py:75-126),
so the real cli/train.py trains on them unchanged.

Because the ground truth is realizable by the model class, the trained
student's PSNR measures the optimizer/schedule pipeline itself: a correct
full run (subdivision, kick-ins, lr decay, LPIPS) must converge far above
the untrained baseline, and eval on the held-out test camera checks novel
views.  Real ZJU data is not available in this environment (SURVEY.md §6).

    python tools/make_e2e_data.py --out data/e2e [--frames 100]
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import os
import pickle
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from gomavatar_tpu.config import default_cfg
from gomavatar_tpu.models.smpl import synthetic_body
from gomavatar_tpu.models.gom import init_gom, gom_forward, subdivide_gom

IMG = (512, 512)


def teacher_model(info, seed=7):
    """Teacher ONE SUBDIVISION PHASE FINER than the capture's canonical mesh
    (round-5 fix): the capture ships the coarse mesh, so the un-subdivided
    student has 4x fewer faces than the ground truth and CANNOT represent
    the sub-coarse-face albedo detail below — subdivision (which lands the
    student exactly on the teacher's midpoint topology) genuinely adds
    representational power, like the reference's real captures where the
    coarse SMPL mesh undersamples cloth/texture detail
    (/root/reference/train.py:341-346 exists for exactly this)."""
    cfg = default_cfg()
    m = cfg["model"]
    m["img_size"] = list(IMG)
    m["pose_refinement"]["name"] = "none"
    m["non_rigid"]["name"] = "none"
    m["shadow_module"]["name"] = "basic"
    m["normal_renderer"]["name"] = "mesh"
    m["canonical_geometry"]["deform_so3"] = True
    m["canonical_geometry"]["deform_scale"] = True
    params, statics, gom_cfg = init_gom(jax.random.PRNGKey(seed), m, info)
    params, statics, gom_cfg = subdivide_gom(params, statics, gom_cfg)
    rng = np.random.default_rng(seed)

    # procedural striped/checkered albedo from canonical face centroids,
    # plus a high-frequency term (~4 cm wavelength, ~3x the COARSE face
    # size) that only the subdivided resolution can express per-face
    v = np.asarray(params["vertices"])
    f = np.asarray(statics.faces)
    c = v[f].mean(axis=1)
    ang = np.arctan2(c[:, 2], c[:, 0])
    hf = 0.16 * np.sin(150.0 * c[:, 1]) * np.sin(20.0 * ang)
    colors = np.stack(
        [
            0.5 + 0.34 * np.sin(9.0 * c[:, 1] + 2.0 * ang) + hf,
            0.5 + 0.34 * np.sin(5.0 * ang + 1.0) + hf,
            0.5 + 0.34 * np.sin(14.0 * c[:, 1]) * np.cos(3.0 * ang) - hf,
        ],
        axis=-1,
    ).clip(0.03, 0.97)
    params["appearance"]["colors"] = jnp.asarray(colors, jnp.float32)

    # smooth low-frequency geometry bumps the student must learn
    bump = 1.0 + 0.07 * np.sin(4.0 * ang_of(v) + 6.0 * v[:, 1])
    v2 = v.copy()
    v2[:, 0] *= bump
    v2[:, 2] *= bump
    params["vertices"] = jnp.asarray(v2, jnp.float32)

    # mild per-face rotation/scale deviations
    params["so3"] = jnp.asarray(rng.normal(size=params["so3"].shape) * 0.1, jnp.float32)
    params["scale"] = jnp.asarray(
        1.0 + rng.normal(size=params["scale"].shape) * 0.1, jnp.float32
    )

    # shadow MLP with visible normal-dependent shading (random head is
    # ~flat 1.0 at init scale 1e-5)
    head = params["shadow"]["head"]
    params["shadow"]["head"] = {
        "w": jnp.asarray(rng.normal(size=np.asarray(head["w"]).shape) * 0.25, jnp.float32),
        "b": jnp.zeros_like(head["b"]),
    }
    return params, statics, gom_cfg


def ang_of(v):
    return np.arctan2(v[:, 2], v[:, 0])


def pose_track(t: float, T: int, rng_amp) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Smooth sinusoidal joint curves + a full-turn global yaw over the clip."""
    pose = np.zeros(72, np.float32)
    for j, (amp, freq, phase, axis) in enumerate(rng_amp):
        pose[3 * (j + 1) + axis] = amp * np.sin(2 * np.pi * freq * t / T + phase)
    Rh = np.array([0.0, 2 * np.pi * t / T, 0.0], np.float32)  # full orbit of yaw
    Th = np.array([0.05 * np.sin(2 * np.pi * t / T), 0.0, 0.0], np.float32)
    return pose, Rh, Th


def write_split(out_dir, n_frames, azimuth_deg, info, frame_offset=0, seed=3):
    """Write the artifact skeleton (cameras/mesh_infos/canonical + black
    placeholder frames); returns the frame names."""
    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "masks"), exist_ok=True)
    W, H = IMG
    focal = 1.1 * H
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1.0]], np.float64)
    az = np.deg2rad(azimuth_deg)
    Ry = np.array(
        [[np.cos(az), 0, np.sin(az)], [0, 1, 0], [-np.sin(az), 0, np.cos(az)]]
    )
    E = np.eye(4)
    E[:3, :3] = Ry
    E[2, 3] = 2.4

    rng = np.random.default_rng(seed)
    # 10 animated joints with random amplitude/frequency/axis
    tracks = [
        (float(rng.uniform(0.1, 0.3)), float(rng.integers(1, 4)),
         float(rng.uniform(0, 2 * np.pi)), int(rng.integers(0, 3)))
        for _ in range(10)
    ]

    cameras, mesh_infos, names = {}, {}, []
    black = Image.fromarray(np.zeros((H, W, 3), np.uint8))
    T_total = n_frames + frame_offset
    for i in range(n_frames):
        name = f"frame_{i:06d}"
        names.append(name)
        pose, Rh, Th = pose_track(i + frame_offset, T_total, tracks)
        cameras[name] = {"intrinsics": K, "extrinsics": E}
        mesh_infos[name] = {
            "Rh": Rh,
            "Th": Th,
            "poses": pose,
            "joints": info["canonical_joints"],
            "tpose_joints": info["canonical_joints"],
        }
        black.save(os.path.join(out_dir, "images", name + ".png"))
        black.convert("L").save(os.path.join(out_dir, "masks", name + ".png"))

    with open(os.path.join(out_dir, "cameras.pkl"), "wb") as f:
        pickle.dump(cameras, f)
    with open(os.path.join(out_dir, "mesh_infos.pkl"), "wb") as f:
        pickle.dump(mesh_infos, f)
    with open(os.path.join(out_dir, "canonical_joints.pkl"), "wb") as f:
        pickle.dump(
            {
                "vertex": info["canonical_vertex"],
                "joints": info["canonical_joints"],
                "weights": info["canonical_lbs_weights"],
                "faces": info["faces"],
                "edges": None,
            },
            f,
        )
    return names


def render_split(out_dir, params, statics, gom_cfg):
    """Teacher-render every frame through the SAME dataset pipeline the
    student will train on (bit-consistent K/E/pose handling)."""
    from gomavatar_tpu.data.dataset import TrainDataset, to_device

    ds = TrainDataset(out_dir, bgcolor=[0, 0, 0], target_size=IMG)

    @jax.jit
    def fwd(batch):
        return gom_forward(
            params, statics, gom_cfg,
            batch["K"], batch["E"], batch["cnl_gtfms"],
            batch["dst_Rs"], batch["dst_Ts"],
            dst_posevec=batch["dst_posevec"], i_iter=1e7, train=False,
        )

    t0 = time.time()
    for i in range(len(ds)):
        item = ds[i]
        rgb, mask, aux = fwd(to_device(item))
        tel = aux.get("binning")
        if tel is not None:
            dropped = int(tel.total_dropped()) + int(aux.get("tile_overflow", 0))
            assert dropped == 0, f"teacher render dropped {dropped} entries on frame {i}"
        rgb8 = (np.clip(np.asarray(rgb), 0, 1) * 255).astype(np.uint8)
        m8 = (np.clip(np.asarray(mask), 0, 1) * 255).astype(np.uint8)
        name = item["frame_name"]
        Image.fromarray(rgb8).save(os.path.join(out_dir, "images", name + ".png"))
        Image.fromarray(m8).save(os.path.join(out_dir, "masks", name + ".png"))
        if i % 20 == 0:
            print(f"  {out_dir}: {i}/{len(ds)} ({time.time() - t0:.1f}s)", flush=True)


def write_noisy_split(test_dir: str, noisy_dir: str, pose_noise: float,
                      root_noise: float, rh_noise: float, seed: int = 11):
    """A PERTURBED copy of the test split: same GT images/masks/cameras, but
    mesh_infos.pkl records inaccurate poses — the situation the reference's
    test-time pose refinement exists for (train_pose.py:217-288 recovers
    from inaccurate test poses).  The exact poses the frames were rendered
    with are kept next to it as mesh_infos_gt.pkl for diagnostics."""
    if os.path.isdir(noisy_dir):
        shutil.rmtree(noisy_dir)
    os.makedirs(noisy_dir)
    for sub in ("images", "masks"):
        shutil.copytree(os.path.join(test_dir, sub), os.path.join(noisy_dir, sub))
    for f in ("cameras.pkl", "canonical_joints.pkl"):
        shutil.copy(os.path.join(test_dir, f), os.path.join(noisy_dir, f))
    with open(os.path.join(test_dir, "mesh_infos.pkl"), "rb") as f:
        mesh_infos = pickle.load(f)
    with open(os.path.join(noisy_dir, "mesh_infos_gt.pkl"), "wb") as f:
        pickle.dump(mesh_infos, f)
    rng = np.random.default_rng(seed)
    for name, mi in mesh_infos.items():
        poses = mi["poses"].copy()
        # non-root joint angles only: the root orientation lives in Rh
        poses[3:] += rng.normal(size=poses[3:].shape).astype(np.float32) * pose_noise
        mi["poses"] = poses
        mi["Rh"] = mi["Rh"] + rng.normal(size=3).astype(np.float32) * rh_noise
        mi["Th"] = mi["Th"] + rng.normal(size=3).astype(np.float32) * root_noise
    with open(os.path.join(noisy_dir, "mesh_infos.pkl"), "wb") as f:
        pickle.dump(mesh_infos, f)
    print(f"noisy split: {noisy_dir} (pose sigma {pose_noise} rad, "
          f"Th sigma {root_noise} m, Rh sigma {rh_noise} rad)")


def write_zju_raw(raw_dir: str, train_dir: str, params, statics, gom_cfg,
                  n_views: int = 2):
    """A tiny raw-ZJU-format capture driving the novel-POSE protocol
    (reference eval.py:239-255 + dataset/test.py): annots.npy with the
    training camera as view 0 (excluded) plus ``n_views`` novel cameras,
    Camera_B*/%06d.jpg teacher renders at 2x resolution (the ZJU evaluator
    halves raw images, dataset/test.py — our model then predicts at the
    preprocessed size), and identical mask/ + mask_cihp/ silhouettes.

    Only the LAST 1/5 of the train framelist is rendered: with
    dataset.train.split_for_pose those frames are never trained on, so
    --type pose really measures novel-pose novel-view generalization
    (MonoHuman split, reference dataset/test.py:57-64)."""
    from gomavatar_tpu.data.dataset import (
        body_pose_to_body_RTs_np,
        get_canonical_global_tfms_np,
    )
    from gomavatar_tpu.ops.camera import apply_global_tfm_to_camera

    W, H = IMG[0] * 2, IMG[1] * 2
    focal = 1.1 * H
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1.0]], np.float64)

    def view_E(az_deg):
        az = np.deg2rad(az_deg)
        Ry = np.array(
            [[np.cos(az), 0, np.sin(az)], [0, 1, 0], [-np.sin(az), 0, np.cos(az)]]
        )
        E = np.eye(4)
        E[:3, :3] = Ry
        E[2, 3] = 2.4
        return E

    # view 0 = the training camera (the protocol excludes it); novel views
    # spread over the unseen side of the orbit
    azimuths = [0.0] + [140.0 + 80.0 * v / max(n_views - 1, 1) for v in range(n_views)]
    Es = [view_E(a) for a in azimuths]
    annots = {
        "cams": {
            "K": [K.copy() for _ in Es],
            "R": [E[:3, :3].copy() for E in Es],
            "T": [E[:3, 3:4] * 1000.0 for E in Es],  # ZJU stores T in mm
            "D": [np.zeros((5, 1)) for _ in Es],
        }
    }
    os.makedirs(raw_dir, exist_ok=True)
    np.save(os.path.join(raw_dir, "annots.npy"), annots)

    with open(os.path.join(train_dir, "mesh_infos.pkl"), "rb") as f:
        mesh_infos = pickle.load(f)
    names = sorted(mesh_infos.keys())
    fifth = len(names) // 5
    pose_names = names[-fifth:] if fifth > 0 else names

    # The 2x frame (64x64 tiles) would overflow the binner's 11-bit sort-key
    # tile field (ops/splat/binning.py caps a render at 2047 tiles), so each
    # frame is rendered as four quadrants with the principal point shifted
    # per quadrant and stitched on the host.  Each quadrant window carries a
    # 32px apron toward the frame interior (cropped after the render):
    # primitives are culled against the render window (projection.py
    # on_screen), so without the apron a primitive just outside a quadrant
    # is dropped while its bbox-tail still touches cropped pixels in the
    # full render (measured: <=0.03 alpha on <0.1% of pixels, all within
    # one tile of the seam).  With the apron, a culled primitive is >=32px
    # from every kept pixel — beyond any bbox margin the binner enumerates
    # — so the stitch matches a monolithic render to fp noise.  Budgets
    # stay 4x: a window of the 2x render sees up to the full 2x
    # per-gaussian footprint; offline, so generous.
    QW, QH = W // 2, H // 2
    APRON = 2 * 16  # tile-aligned
    VW, VH = QW + APRON, QH + APRON  # render-window size per quadrant
    cfg2 = dataclasses.replace(
        gom_cfg,
        img_size=(VW, VH),
        max_tiles_per_gaussian=4 * gom_cfg.max_tiles_per_gaussian,
        max_tiles_per_face=4 * gom_cfg.max_tiles_per_face,
        buffer_factor=4 * gom_cfg.buffer_factor,
        active_tile_cap=4 * gom_cfg.active_tile_cap,
        binning_band0=None,
        binning_band0_train=None,
    )

    @jax.jit
    def fwd_quadrant(K_, E_, cnl, Rs, Ts, posevec):
        return gom_forward(
            params, statics, cfg2, K_, E_, cnl, Rs, Ts,
            dst_posevec=posevec, i_iter=1e7, train=False,
        )

    def fwd(K_, E_, cnl, Rs, Ts, posevec):
        rgb_full = np.zeros((H, W, 3), np.float32)
        mask_full = np.zeros((H, W), np.float32)
        dropped = 0
        for oy in (0, QH):
            for ox in (0, QW):
                # window origin: apron extends toward the frame interior
                wx = max(0, ox - (APRON if ox else 0))
                wy = max(0, oy - (APRON if oy else 0))
                Kq = np.asarray(K_, np.float32).copy()
                Kq[0, 2] -= wx
                Kq[1, 2] -= wy
                rgb, mask, aux = fwd_quadrant(
                    jnp.asarray(Kq), E_, cnl, Rs, Ts, posevec
                )
                lx, ly = ox - wx, oy - wy  # crop offset inside the window
                rgb_full[oy:oy + QH, ox:ox + QW] = np.asarray(
                    rgb[ly:ly + QH, lx:lx + QW]
                )
                mask_full[oy:oy + QH, ox:ox + QW] = np.asarray(
                    mask[ly:ly + QH, lx:lx + QW]
                )
                tel = aux.get("binning")
                if tel is not None:
                    dropped += int(tel.total_dropped())
                dropped += int(aux.get("tile_overflow", 0))
        return rgb_full, mask_full, dropped

    cnl_gtfms = get_canonical_global_tfms_np(
        np.asarray(mesh_infos[pose_names[0]]["tpose_joints"], np.float32)
    )
    t0 = time.time()
    for vi in range(1, len(Es)):
        cam_dir = f"Camera_B{vi + 1}"
        os.makedirs(os.path.join(raw_dir, cam_dir), exist_ok=True)
        os.makedirs(os.path.join(raw_dir, "mask", cam_dir), exist_ok=True)
        os.makedirs(os.path.join(raw_dir, "mask_cihp", cam_dir), exist_ok=True)
        for name in pose_names:
            mi = mesh_infos[name]
            frame_id = int(name.split("_")[1])
            dst_Rs, dst_Ts = body_pose_to_body_RTs_np(
                mi["poses"], mi["tpose_joints"].astype(np.float32)
            )
            E_eff = apply_global_tfm_to_camera(
                Es[vi], mi["Rh"].astype(np.float32), mi["Th"].astype(np.float32)
            )
            rgb, mask, dropped = fwd(
                K, jnp.asarray(E_eff, jnp.float32),
                jnp.asarray(cnl_gtfms), jnp.asarray(dst_Rs), jnp.asarray(dst_Ts),
                jnp.asarray(mi["poses"].reshape(-1)[3:] + 1e-2),
            )
            assert dropped == 0, f"zju_raw teacher render dropped {dropped} ({name})"
            rgb8 = (np.clip(np.asarray(rgb), 0, 1) * 255).astype(np.uint8)
            m8 = (np.clip(np.asarray(mask), 0, 1) * 255).astype(np.uint8)
            Image.fromarray(rgb8).save(
                os.path.join(raw_dir, cam_dir, f"{frame_id:06d}.jpg"), quality=95
            )
            for mdir in ("mask", "mask_cihp"):
                Image.fromarray(m8).save(
                    os.path.join(raw_dir, mdir, cam_dir, f"{frame_id:06d}.png")
                )
        print(f"  zju_raw view {vi}: {len(pose_names)} frames "
              f"({time.time() - t0:.1f}s)", flush=True)


def write_mdm_fixture(path: str, info, n_frames: int = 6, seed: int = 5):
    """A tiny MDM-format pose clip for ``eval --type pose_mdm`` (reference
    dataset/newpose.py:152-164 reads thetas_ori (24,3,T) + root_translation
    (3,T) from an allow_pickle dict .npy)."""
    rng = np.random.default_rng(seed)
    thetas = np.zeros((24, 3, n_frames), np.float32)
    for j in (1, 2, 4, 5, 16, 17, 18, 19):  # legs + arms
        axis = int(rng.integers(0, 3))
        amp = float(rng.uniform(0.2, 0.5))
        ph = float(rng.uniform(0, 2 * np.pi))
        thetas[j, axis, :] = amp * np.sin(
            2 * np.pi * np.arange(n_frames) / n_frames + ph
        )
    # root row = global orientation (the loader splits it into Rh)
    thetas[0, 1, :] = np.linspace(0, np.pi, n_frames)
    # NewPoseDataset recenters by canonical_joints[0]; put the root there so
    # the radius-8 orbit camera frames the body
    root = np.tile(info["canonical_joints"][0][:, None], (1, n_frames)).astype(np.float32)
    np.save(path, {"thetas_ori": thetas, "root_translation": root})
    print(f"mdm fixture: {path} ({n_frames} frames)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/e2e")
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--test_frames", type=int, default=24)
    ap.add_argument("--rings", type=int, default=144)
    ap.add_argument("--segs", type=int, default=48)
    ap.add_argument("--img", type=int, default=512, help="square image size (tile-aligned)")
    ap.add_argument("--pose_noise", type=float, default=0.03,
                    help="sigma (rad) of joint-angle noise written into the "
                    "NOISY test split (test_noisy/) for train_pose to refine")
    ap.add_argument("--root_noise", type=float, default=0.02, help="Th noise sigma (m)")
    ap.add_argument("--rh_noise", type=float, default=0.01, help="Rh noise sigma (rad)")
    ap.add_argument("--mdm_frames", type=int, default=6)
    ap.add_argument("--zju_views", type=int, default=2)
    args = ap.parse_args()
    global IMG
    IMG = (args.img, args.img)

    info = synthetic_body(n_rings=args.rings, n_seg=args.segs)
    print(f"body: {len(info['faces'])} faces, {len(info['canonical_vertex'])} verts")
    params, statics, gom_cfg = teacher_model(info)

    train_dir = os.path.join(args.out, "train")
    test_dir = os.path.join(args.out, "test")
    write_split(train_dir, args.frames, azimuth_deg=0.0, info=info)
    # held-out camera 70 deg off + the SAME pose track continued (novel view
    # of seen-style motion, like the ZJU novel-view protocol)
    write_split(test_dir, args.test_frames, azimuth_deg=70.0, info=info)

    print("rendering teacher frames on", jax.devices()[0].platform)
    render_split(train_dir, params, statics, gom_cfg)
    render_split(test_dir, params, statics, gom_cfg)

    write_noisy_split(
        test_dir, os.path.join(args.out, "test_noisy"),
        args.pose_noise, args.root_noise, args.rh_noise,
    )
    write_zju_raw(
        os.path.join(args.out, "zju_raw"), train_dir, params, statics, gom_cfg,
        n_views=args.zju_views,
    )
    write_mdm_fixture(os.path.join(args.out, "mdm_poses.npy"), info, args.mdm_frames)

    # persist the teacher for later inspection/FPS benches on trained-like data
    np.savez(
        os.path.join(args.out, "teacher.npz"),
        colors=np.asarray(params["appearance"]["colors"]),
        vertices=np.asarray(params["vertices"]),
        so3=np.asarray(params["so3"]),
        scale=np.asarray(params["scale"]),
    )
    print("done:", args.out)


if __name__ == "__main__":
    main()
