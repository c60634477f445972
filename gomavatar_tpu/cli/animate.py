"""Multi-scene batched animation over a device mesh (CLI).

The capability behind BASELINE config #5: render a freeview orbit or an
MDM-driven motion for SEVERAL avatars simultaneously, each scene's
parameters sharded onto its own device of a ``jax.sharding.Mesh``
(embarrassingly parallel — no collectives; see parallel/step.py).
The reference has no such mode (single-GPU batch-1, SURVEY.md §2.F).

    # N trained scenes:
    python -m gomavatar_tpu.cli.animate --cfgs cfgA.yaml cfgB.yaml ... \
        --type freeview --n_frames 60 --out out_dir
    # demo without data (synthetic avatars):
    python -m gomavatar_tpu.cli.animate --synthetic 4 --n_frames 16 --out out_dir
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from gomavatar_tpu.eval_lib import to_8b_image
from gomavatar_tpu.parallel import make_mesh, make_multi_scene_render, stack_batches
from gomavatar_tpu.parallel.mesh import SCENE_AXIS


def _synthetic_scenes(n: int, img_size):
    from gomavatar_tpu.config import default_cfg
    from gomavatar_tpu.models.gom import init_gom
    from gomavatar_tpu.models.smpl import synthetic_body

    cfg = default_cfg()
    m = cfg["model"]
    m["img_size"] = list(img_size)
    m["shadow_module"]["name"] = "basic"
    m["normal_renderer"]["name"] = "mesh"
    m["canonical_geometry"]["deform_so3"] = True
    m["canonical_geometry"]["deform_scale"] = True
    packs, infos = [], []
    for s in range(n):
        info = synthetic_body(n_rings=24, n_seg=20, seed=s)
        packs.append(init_gom(jax.random.PRNGKey(s), m, info))
        infos.append(info)
    return packs, infos


def _mdm_items(infos, pose_path, n_frames, img_size):
    """Per-frame batches driving all scenes with one MDM motion clip
    (reference semantics: dataset/newpose.py — root rotation folded into the
    camera, radius-8 synthetic view scaled to the body)."""
    from gomavatar_tpu.ops.camera import apply_global_tfm_to_camera
    from gomavatar_tpu.data.dataset import (
        body_pose_to_body_RTs_np,
        get_canonical_global_tfms_np,
    )

    data = dict(np.load(pose_path, allow_pickle=True).item())
    thetas = np.asarray(data["thetas_ori"])  # (24, 3, T)
    poses_all = np.transpose(thetas, (2, 0, 1)).copy()
    Rh_all = poses_all[:, 0].copy()
    Th_all = np.transpose(np.asarray(data["root_translation"]), (1, 0))
    poses_all[:, 0] = 0.0
    T_total = min(len(poses_all), n_frames)

    W, H = img_size
    focal = 1.1 * H
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)
    E0 = np.eye(4, dtype=np.float32)
    E0[2, 3] = 2.6

    per_frame = []
    for t in range(T_total):
        items = []
        pose = poses_all[t].reshape(-1).astype(np.float32)
        for info in infos:
            E = apply_global_tfm_to_camera(
                E0, Rh_all[t], Th_all[0] - info["canonical_joints"][0]
            ).astype(np.float32)
            Rs, Ts = body_pose_to_body_RTs_np(pose, info["canonical_joints"])
            items.append(
                {
                    "K": K,
                    "E": E,
                    "cnl_gtfms": get_canonical_global_tfms_np(info["canonical_joints"]),
                    "dst_Rs": Rs,
                    "dst_Ts": Ts,
                    "dst_posevec": pose[3:] + 1e-2,
                    "bgcolor": np.zeros(3, np.float32),
                    "target_rgbs": np.zeros((H, W, 3), np.float32),
                    "target_masks": np.zeros((H, W), np.float32),
                }
            )
        per_frame.append(items)
    return per_frame


def _orbit_items(infos, frame_idx, n_frames, img_size):
    from gomavatar_tpu.models.smpl import synthetic_camera
    from gomavatar_tpu.ops.camera import rotate_camera_by_frame_idx
    from gomavatar_tpu.data.dataset import (
        body_pose_to_body_RTs_np,
        get_canonical_global_tfms_np,
    )

    K, E0 = synthetic_camera(img_size, distance=3.0, focal=0.9 * img_size[1])
    per_frame = []
    for t in range(n_frames):
        items = []
        for info in infos:
            E = rotate_camera_by_frame_idx(E0, t, period=n_frames, rotate_axis="y")
            pose = np.zeros(72, np.float32)
            pose[12] = 0.4 * np.sin(2 * np.pi * t / n_frames)
            Rs, Ts = body_pose_to_body_RTs_np(pose, info["canonical_joints"])
            H, W = img_size[1], img_size[0]
            items.append(
                {
                    "K": K,
                    "E": E.astype(np.float32),
                    "cnl_gtfms": get_canonical_global_tfms_np(info["canonical_joints"]),
                    "dst_Rs": Rs,
                    "dst_Ts": Ts,
                    "dst_posevec": pose[3:] + 1e-2,
                    "bgcolor": np.zeros(3, np.float32),
                    "target_rgbs": np.zeros((H, W, 3), np.float32),
                    "target_masks": np.zeros((H, W), np.float32),
                }
            )
        per_frame.append(items)
    return per_frame


def check_homogeneous_scenes(packs):
    """All scenes share ONE compiled program, so their static shapes must
    match (same subdivision phase / face count).  Fail with a clear message
    instead of an opaque tree_map stack error."""
    gom_cfg = packs[0][2]
    mismatched = [
        (i, p[2].num_faces) for i, p in enumerate(packs)
        if p[2].num_faces != gom_cfg.num_faces
    ]
    if mismatched:
        details = ", ".join(f"scene {i}: {f} faces" for i, f in mismatched)
        raise SystemExit(
            f"multi-scene animate needs all scenes at the SAME subdivision "
            f"phase: scene 0 has {gom_cfg.num_faces} faces but {details}. "
            f"Re-train or pick checkpoints at matching phases."
        )
    return gom_cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfgs", nargs="*", default=None, help="per-scene experiment configs")
    ap.add_argument("--synthetic", type=int, default=0, help="render N synthetic avatars instead")
    ap.add_argument("--type", default="freeview", choices=["freeview", "mdm"])
    ap.add_argument("--pose_path", default=None, help="MDM motion npy (--type mdm); synthesized if omitted")
    ap.add_argument("--n_frames", type=int, default=30)
    ap.add_argument("--img", type=int, nargs=2, default=[256, 256])
    ap.add_argument("--out", default="log/animate")
    args = ap.parse_args()

    img_size = tuple(args.img)
    if args.synthetic:
        packs, infos = _synthetic_scenes(args.synthetic, img_size)
    else:
        assert args.cfgs, "--cfgs or --synthetic required"
        from gomavatar_tpu.config import make_cfg
        from gomavatar_tpu.trainer import Trainer
        from gomavatar_tpu.data.dataset import TrainDataset

        packs, infos = [], []
        for cfg_path in args.cfgs:
            cfg = make_cfg(cfg_path)
            ds = TrainDataset(cfg["dataset"]["train"]["dataset_path"], bgcolor=[0, 0, 0])
            tr = Trainer(cfg, ds.get_canonical_info())
            tr.load_for_eval(os.path.join(cfg["save_dir"], "checkpoints"))
            packs.append((tr.params, tr.statics, tr.gom_cfg))
            infos.append(ds.get_canonical_info())

    n = len(packs)
    gom_cfg = check_homogeneous_scenes(packs)
    params_s = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *[p[0] for p in packs])
    statics_s = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *[p[1] for p in packs])

    n_dev = min(n, len(jax.devices()))
    assert n % n_dev == 0, f"#scenes {n} must divide onto {n_dev} devices"
    mesh = make_mesh(n_dev, axis=SCENE_AXIS)
    render = make_multi_scene_render(mesh, gom_cfg)

    os.makedirs(args.out, exist_ok=True)
    if args.type == "mdm":
        pose_path = args.pose_path
        if pose_path is None:
            from gomavatar_tpu.data.synthetic import write_synthetic_mdm_poses

            pose_path = os.path.join(args.out, "_demo_motion.npy")
            write_synthetic_mdm_poses(pose_path, n_frames=args.n_frames)
        frames = _mdm_items(infos, pose_path, args.n_frames, img_size)
    else:
        frames = _orbit_items(infos, 0, args.n_frames, img_size)
    for t, items in enumerate(frames):
        batch_s = stack_batches(items)
        rgb, mask = render(params_s, statics_s, batch_s, jnp.float32(1e7))
        rgb = np.asarray(rgb)
        # scene grid strip
        strip = np.concatenate(list(rgb), axis=1)
        Image.fromarray(to_8b_image(strip)).save(os.path.join(args.out, f"frame_{t:04d}.png"))
        print(f"frame {t + 1}/{args.n_frames}", flush=True)
    print(f"wrote {args.n_frames} frames x {n} scenes to {args.out}")


if __name__ == "__main__":
    main()
