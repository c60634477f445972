"""Synthetic preprocessed dataset generator.

Writes a tiny but format-complete artifact directory (images/, masks/,
cameras.pkl, mesh_infos.pkl, canonical_joints.pkl) from the procedural
body in models/smpl.py, so the dataset classes, trainers and eval drivers
are exercisable end-to-end without the licensed SMPL asset or the real
captures (SURVEY.md §4: the rebuild must supply its own fixtures).
"""

from __future__ import annotations

import os
import pickle

import numpy as np
from PIL import Image

from gomavatar_tpu.models.smpl import synthetic_body


def write_synthetic_dataset(
    out_dir: str,
    n_frames: int = 4,
    img_hw: tuple[int, int] = (96, 96),
    seed: int = 0,
) -> str:
    """Create a synthetic preprocessed dir; returns its path.

    Images are flat-colored silhouettes of the (rigid) synthetic body seen
    from a fixed camera; poses wave one arm joint so frames differ.
    """
    rng = np.random.default_rng(seed)
    info = synthetic_body(n_rings=12, n_seg=10)
    H, W = img_hw

    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "masks"), exist_ok=True)

    # full-res camera: datasets will halve K and the images they load are
    # written at 2x so the half-res pipeline lands on (H, W)
    focal = 2 * H * 0.9
    K = np.array([[focal, 0, W], [0, focal, H], [0, 0, 1]], np.float64)
    E = np.eye(4)
    E[2, 3] = 3.0

    cameras, mesh_infos = {}, {}
    for i in range(n_frames):
        name = f"frame_{i:06d}"
        pose = np.zeros(72, np.float32)
        pose[3 * 10] = 0.2 * np.sin(i)  # animate a joint
        Rh = np.array([0.0, 0.05 * i, 0.0], np.float32)
        Th = np.array([0.01 * i, 0.0, 0.0], np.float32)

        # rasterize a crude silhouette on the host (bbox of projected verts)
        pts = info["canonical_vertex"] @ E[:3, :3].T + E[:3, 3]
        uv = (pts[:, :2] / pts[:, 2:3]) @ np.diag([focal, focal]) + np.array([W, H])
        img = np.zeros((2 * H, 2 * W, 3), np.uint8)
        mask = np.zeros((2 * H, 2 * W), np.uint8)
        u = np.clip(uv[:, 0].astype(int), 0, 2 * W - 1)
        v = np.clip(uv[:, 1].astype(int), 0, 2 * H - 1)
        mask[v, u] = 255
        # dilate the point splat into a blob
        import cv2

        mask = cv2.dilate(mask, np.ones((9, 9), np.uint8))
        img[mask > 0] = (rng.random(3) * 128 + 96).astype(np.uint8)

        Image.fromarray(img).save(os.path.join(out_dir, "images", name + ".png"))
        Image.fromarray(np.stack([mask] * 3, -1)).save(
            os.path.join(out_dir, "masks", name + ".png")
        )
        cameras[name] = {"intrinsics": K, "extrinsics": E}
        mesh_infos[name] = {
            "Rh": Rh,
            "Th": Th,
            "poses": pose,
            "joints": info["canonical_joints"],
            "tpose_joints": info["canonical_joints"],
        }

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
    return out_dir
