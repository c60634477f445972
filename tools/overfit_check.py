"""End-to-end learning check: overfit the model to a couple of frames.

Trains the full pipeline (both Pallas rasterizer VJPs, all mesh losses,
Adam) on a synthetic two-frame dataset at 128x128 and reports train-view
PSNR before/after — the optimization-actually-works test that unit tests
can't provide (SURVEY.md §4: metric-based end-to-end evaluation).

    python tools/overfit_check.py [--iters 400]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--img", type=int, default=128)
    args = ap.parse_args()

    from gomavatar_tpu.config import default_cfg
    from gomavatar_tpu.trainer import Trainer
    from gomavatar_tpu.models.smpl import synthetic_body, synthetic_camera
    from gomavatar_tpu.ops.skeleton import body_pose_to_body_RTs, get_canonical_global_tfms
    from gomavatar_tpu.losses import unpack
    from gomavatar_tpu.metrics import psnr

    S = args.img
    cfg = default_cfg()
    cfg["img_size"] = [S, S]
    m = cfg["model"]
    m["img_size"] = [S, S]
    m["canonical_geometry"]["deform_so3"] = True
    m["canonical_geometry"]["deform_scale"] = True
    m["shadow_module"]["name"] = "basic"
    m["normal_renderer"]["name"] = "mesh"
    t = cfg["train"]
    t["losses"]["lpips"]["coeff"] = 0.0
    t["losses"]["laplacian"]["coeff_observation"] = 10.0
    t["losses"]["normal"]["coeff_mask"] = 1.0
    t["losses"]["normal"]["mask_dilate"] = True
    t["losses"]["normal"]["coeff_consist"] = 0.1
    t["losses"]["color_consist"]["coeff"] = 0.05
    # overfitting schedule: higher lr, no decay over this short run
    for k in t["lr"]:
        t["lr"][k] = 0.005 if t["lr"][k] > 0 else 0.0
    t["lr_decay_steps"] = 10_000_000

    info = synthetic_body(n_rings=24, n_seg=20)
    trainer = Trainer(cfg, info)

    # two target frames: colored stripes on the true body silhouette
    K, E = synthetic_camera((S, S), distance=2.4, focal=1.1 * S)
    joints = jnp.asarray(info["canonical_joints"])
    cnl = get_canonical_global_tfms(joints)

    batches = []
    for fidx in range(2):
        pose = np.zeros(72, np.float32)
        pose[12] = 0.3 * fidx
        Rs, Ts = body_pose_to_body_RTs(jnp.asarray(pose), joints)
        base = {
            "K": jnp.asarray(K), "E": jnp.asarray(E), "cnl_gtfms": cnl,
            "dst_Rs": Rs, "dst_Ts": Ts,
            "dst_posevec": jnp.asarray(pose[3:] + 1e-2),
            "bgcolor": jnp.zeros(3),
        }
        # render the TRUE body with a striped appearance as ground truth
        rgb0, mask0, _ = trainer.forward(base)
        yy = np.arange(S)[:, None] * np.ones((1, S))
        stripes = np.stack(
            [0.2 + 0.6 * ((yy // 8) % 2), 0.7 - 0.5 * ((yy // 8) % 2), 0.5 * np.ones((S, S))],
            axis=-1,
        ).astype(np.float32)
        m0 = np.asarray(mask0)
        target = stripes * m0[..., None]
        base["target_rgbs"] = jnp.asarray(target)
        base["target_masks"] = jnp.asarray((m0 > 0.5).astype(np.float32))
        batches.append(base)

    def train_psnr():
        vals = []
        for b in batches:
            rgb, mask, _ = trainer.forward(b)
            pred = unpack(rgb, mask, b["bgcolor"], clamp=True)
            vals.append(float(psnr(pred, b["target_rgbs"])))
        return float(np.mean(vals))

    p0 = train_psnr()
    t0 = time.perf_counter()
    for i in range(args.iters):
        total, losses = trainer.step(batches[i % 2])
        if i % 100 == 0:
            print(f"iter {i}: loss {float(total):.4f}", flush=True)
    dt = time.perf_counter() - t0
    p1 = train_psnr()
    print(f"PSNR {p0:.2f} -> {p1:.2f} dB after {args.iters} iters "
          f"({args.iters / dt:.1f} it/s)")
    assert p1 > p0 + 5.0, "model failed to learn (expected >= +5 dB)"
    print("OVERFIT CHECK PASSED")


if __name__ == "__main__":
    main()
