"""Test-time pose refinement (PeopleSnapshot protocol) — the reference's
train_pose.py:150-296 rebuilt TPU-first.

Per test frame, optimize (Rh, Th, 72-d pose) by Adam against
rgb+mask+LPIPS with the model frozen, keeping the best-loss pose
(train_pose.py:227-284: lr cfg.pose.lr, StepLR x0.5 every cfg.pose.decay,
cfg.pose.iters steps).

TPU-native difference: the ENTIRE per-frame optimization (N Adam steps,
each with a full differentiable render) is ONE jitted `lax.scan` program —
no host round-trips between steps, versus the reference's 300 sequential
Python iterations of launch-bound CUDA work.
"""

from __future__ import annotations

import argparse
import functools
import logging
import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import optax

from gomavatar_tpu.config import make_cfg
from gomavatar_tpu.trainer import Trainer
from gomavatar_tpu.data.dataset import TrainDataset, to_device
from gomavatar_tpu.eval_lib import EvaluatorSnapshot, to_8b_image
from gomavatar_tpu.losses import unpack
from gomavatar_tpu.models.gom import gom_forward
from gomavatar_tpu.models import lpips as lpips_lib
from gomavatar_tpu.ops.skeleton import body_pose_to_body_RTs
from gomavatar_tpu.cli.train import setup_logging


def make_pose_optimizer(gom_cfg, loss_cfg, pose_cfg, n_iters: int):
    """One jitted program: scan of Adam steps over (Rh, Th, pose)."""
    base_lr = float(pose_cfg["lr"])
    decay = int(pose_cfg["decay"])

    def schedule(t):
        return base_lr * 0.5 ** (t // decay)

    tx = optax.adam(schedule)

    def frame_loss(pose_vars, params, statics, lpips_params, batch):
        Rh, Th, poses = pose_vars["Rh"], pose_vars["Th"], pose_vars["poses"]
        dst_Rs, dst_Ts = body_pose_to_body_RTs(poses, batch["dst_tpose_joints"])
        # train=True: the optimization must run through the training
        # renderer (custom-VJP splat + soft-silhouette kernels) — the fused
        # eval Pallas sweep is forward-only (no JVP rule), and the soft mask
        # is what the reference's pose loss differentiates through anyway
        # (train_pose.py:227-284 drives the training forward)
        rgb, mask, _ = gom_forward(
            params, statics, gom_cfg,
            batch["K"], batch["E"], batch["cnl_gtfms"], dst_Rs, dst_Ts,
            dst_posevec=poses[3:] + 1e-2,
            i_iter=1e7, global_R=Rh, global_T=Th, train=True,
        )
        rgb_u = unpack(rgb, mask, batch["bgcolor"])
        loss = jnp.mean(jnp.abs(rgb_u - batch["target_rgbs"])) * loss_cfg["rgb"]["coeff"]
        loss = loss + jnp.mean(jnp.abs(mask - batch["target_masks"])) * loss_cfg["mask"]["coeff"]
        if lpips_params is not None and loss_cfg["lpips"]["coeff"] > 0:
            loss = loss + loss_cfg["lpips"]["coeff"] * lpips_lib.lpips(
                lpips_params, 2 * rgb_u - 1, 2 * batch["target_rgbs"] - 1
            )
        return loss

    @jax.jit
    def optimize(params, statics, lpips_params, batch, init_poses):
        pose_vars = {
            "Rh": jnp.zeros(3),
            "Th": jnp.zeros(3),
            "poses": init_poses,
        }
        opt_state = tx.init(pose_vars)
        best = {"loss": jnp.asarray(jnp.inf), "vars": pose_vars}

        def body(carry, _):
            pose_vars, opt_state, best = carry
            loss, grads = jax.value_and_grad(frame_loss)(
                pose_vars, params, statics, lpips_params, batch
            )
            updates, opt_state = tx.update(grads, opt_state)
            new_vars = optax.apply_updates(pose_vars, updates)
            improved = loss < best["loss"]
            best = {
                "loss": jnp.where(improved, loss, best["loss"]),
                "vars": jax.tree_util.tree_map(
                    lambda old, cur: jnp.where(improved, cur, old),
                    best["vars"],
                    pose_vars,
                ),
            }
            return (new_vars, opt_state, best), loss

        (_, _, best), losses = jax.lax.scan(
            body, (pose_vars, opt_state, best), None, length=n_iters
        )
        return best["vars"], best["loss"], losses

    return optimize


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--max_frames", type=int, default=None)
    ap.add_argument(
        "--dataset_path", default=None,
        help="override the test split directory — point it at the NOISY-"
        "pose split (tools/make_e2e_data.py --pose_noise) so refinement "
        "has genuinely inaccurate poses to recover, like the reference's "
        "real captures (train_pose.py:217-288)",
    )
    args = ap.parse_args()

    cfg = make_cfg(args.cfg)
    setup_logging(cfg["save_dir"], "log_pose.txt")
    d = cfg["dataset"]["test_view"]
    dataset = TrainDataset(
        args.dataset_path or d["dataset_path"], bgcolor=cfg["bgcolor"],
        skip=d.get("skip", 1), target_size=cfg["img_size"],
    )
    trainer = Trainer(cfg, dataset.get_canonical_info())
    trainer.load_for_eval(os.path.join(cfg["save_dir"], "checkpoints"))

    lpips_params = None
    if cfg["train"]["losses"]["lpips"]["coeff"] > 0:
        lpips_params, _, _ = lpips_lib.load_lpips("vgg")

    n_pose_iters = int(cfg["pose"]["iters"])
    optimize = make_pose_optimizer(
        trainer.gom_cfg, cfg["train"]["losses"], cfg["pose"], n_pose_iters
    )

    n = len(dataset) if args.max_frames is None else min(len(dataset), args.max_frames)
    bg = jnp.asarray(np.asarray(cfg["bgcolor"], np.float32) / 255.0)

    def evaluate(tag, Rhs, Ths, poses_all):
        # PeopleSnapshot protocol (reference train_pose.py:34 imports
        # Evaluator_snapshot): gaussian-window SSIM + alex-LPIPS
        evaluator = EvaluatorSnapshot()
        out_dir = os.path.join(cfg["save_dir"], "eval", "test_refine")
        os.makedirs(out_dir, exist_ok=True)
        for i in range(n):
            item = dataset[i]
            batch = to_device(item)
            dst_Rs, dst_Ts = body_pose_to_body_RTs(
                jnp.asarray(poses_all[i]), batch["dst_tpose_joints"]
            )
            rgb, mask, _ = gom_forward(
                trainer.params, trainer.statics, trainer.gom_cfg,
                batch["K"], batch["E"], batch["cnl_gtfms"], dst_Rs, dst_Ts,
                dst_posevec=jnp.asarray(poses_all[i][3:] + 1e-2),
                i_iter=1e7,
                global_R=jnp.asarray(Rhs[i]), global_T=jnp.asarray(Ths[i]),
            )
            pred = np.asarray(unpack(rgb, mask, bg, clamp=True))
            evaluator.evaluate(pred, np.asarray(item["target_rgbs"]))
            from PIL import Image

            Image.fromarray(to_8b_image(pred)).save(
                os.path.join(out_dir, item["frame_name"] + f"_{tag}.png")
            )
        means = evaluator.summarize()
        logging.info("eval [%s]: %s", tag, {k: round(v, 4) for k, v in means.items()})
        return means

    raw_poses = np.stack([dataset[i]["dst_poses"] for i in range(n)])
    zeros3 = np.zeros((n, 3), np.float32)
    evaluate("raw", zeros3, zeros3, raw_poses)

    Rhs = np.zeros((n, 3), np.float32)
    Ths = np.zeros((n, 3), np.float32)
    best_poses = raw_poses.copy()
    for i in range(n):
        batch = to_device(dataset[i])
        best_vars, best_loss, losses = optimize(
            trainer.params, trainer.statics, lpips_params, batch,
            jnp.asarray(raw_poses[i]),
        )
        Rhs[i] = np.asarray(best_vars["Rh"])
        Ths[i] = np.asarray(best_vars["Th"])
        best_poses[i] = np.asarray(best_vars["poses"])
        logging.info(
            "frame %d: loss %.4f -> best %.4f",
            i, float(losses[0]), float(best_loss),
        )

    evaluate("zeroed", zeros3, zeros3, best_poses)
    evaluate("refined", Rhs, Ths, best_poses)

    ckpt_path = os.path.join(cfg["save_dir"], "checkpoints", "pose.pkl")
    with open(ckpt_path, "wb") as f:
        pickle.dump({"Rhs": Rhs, "Ths": Ths, "dst_poses": best_poses}, f)
    logging.info("saved refined poses to %s", ckpt_path)


if __name__ == "__main__":
    main()
