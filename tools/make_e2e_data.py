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
import functools
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from gomavatar_tpu.config import default_cfg
from gomavatar_tpu.models.smpl import synthetic_body
from gomavatar_tpu.models.gom import init_gom, gom_forward

IMG = (512, 512)


def teacher_model(info, seed=7):
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
    rng = np.random.default_rng(seed)

    # procedural striped/checkered albedo from canonical face centroids
    v = np.asarray(params["vertices"])
    f = np.asarray(statics.faces)
    c = v[f].mean(axis=1)
    ang = np.arctan2(c[:, 2], c[:, 0])
    colors = np.stack(
        [
            0.5 + 0.42 * np.sin(9.0 * c[:, 1] + 2.0 * ang),
            0.5 + 0.42 * np.sin(5.0 * ang + 1.0),
            0.5 + 0.42 * np.sin(14.0 * c[:, 1]) * np.cos(3.0 * ang),
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/e2e")
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--test_frames", type=int, default=24)
    ap.add_argument("--rings", type=int, default=144)
    ap.add_argument("--segs", type=int, default=48)
    ap.add_argument("--img", type=int, default=512, help="square image size (tile-aligned)")
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
