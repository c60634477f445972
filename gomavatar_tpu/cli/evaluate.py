"""Evaluation driver (CLI): the reference's eval.py:183-365 —
``--type {view, pose, train, freeview, pose_mdm}`` dispatch, checkpoint
load with subdivision replay, per-frame rendering + metrics, PNG dumps.

    python -m gomavatar_tpu.cli.evaluate --cfg configs/exps/zju-mocap_377.yaml \
        --type view [--iter N] [--frame_idx I] [--n_frames N] [--pose_path P]
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from gomavatar_tpu.config import make_cfg
from gomavatar_tpu.trainer import Trainer
from gomavatar_tpu.data.dataset import (
    TrainDataset,
    ZJUTestDataset,
    FreeviewDataset,
    NewPoseDataset,
    to_device,
)
from gomavatar_tpu.eval_lib import Evaluator, EvaluatorSnapshot, to_8b_image
from gomavatar_tpu.losses import unpack
from gomavatar_tpu.cli.train import setup_logging


def model_size_mb(params) -> float:
    """Total parameter bytes (reference logs it at eval, eval.py:321-325)."""
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params)) / 1e6


class RenderBudgetCheck:
    """Loud per-frame check of the static binning budgets at eval.

    The CUDA reference allocates dynamically and never drops content; our
    static budgets (max_tiles_per_gaussian, the entry-buffer cap, the
    active-tile cap, the kernel's per-tile chunk cap) can silently crop a
    close-up render instead.  The train path surfaces the counters next to
    the losses (trainer.py); this does the same for eval/bench frames."""

    def __init__(self):
        self.frames_dropped = 0
        self.total_dropped = 0

    def check(self, aux: dict, frame_name: str) -> int:
        tel = aux.get("binning")
        if tel is None:
            return 0
        dropped = int(tel.total_dropped()) + int(aux.get("tile_overflow", 0))
        if dropped:
            self.frames_dropped += 1
            self.total_dropped += dropped
            logging.warning(
                "RENDER BUDGET OVERFLOW on %s: %d entries dropped "
                "(budget=%d buffer=%d tile_overflow=%d) — the image is "
                "silently missing content; raise model.max_tiles_per_gaussian"
                " / model.active_tile_cap",
                frame_name, dropped, int(tel.dropped_budget),
                int(tel.dropped_buffer), int(aux.get("tile_overflow", 0)),
            )
        return dropped

    def summarize(self):
        if self.frames_dropped:
            logging.warning(
                "render budget overflow on %d frames (%d entries total)",
                self.frames_dropped, self.total_dropped,
            )
        else:
            logging.info("render budgets: zero dropped entries on all frames")


def load_refined_poses(path: str):
    """Read a train_pose output (checkpoints/pose.pkl: Rhs/Ths/dst_poses —
    the reference's pose.pt, train_pose.py:290-296) for re-evaluation."""
    import pickle

    with open(path, "rb") as f:
        d = pickle.load(f)
    return (
        np.asarray(d["Rhs"], np.float32),
        np.asarray(d["Ths"], np.float32),
        np.asarray(d["dst_poses"], np.float32),
    )


def build_dataset(cfg, args):
    t = args.type
    if t == "view":
        d = cfg["dataset"]["test_view"]
        if d.get("name", "zju-mocap") == "snapshot":
            return TrainDataset(
                args.dataset_path or d["dataset_path"], bgcolor=cfg["bgcolor"],
                skip=d.get("skip", 1), target_size=cfg["img_size"],
            ), "snapshot"
        return ZJUTestDataset(
            d["raw_dataset_path"], d["dataset_path"], test_type="view",
            bgcolor=cfg["bgcolor"], exclude_view=d.get("exclude_view", 0),
            skip=d.get("skip", 30),
        ), "zju"
    if t == "pose":
        d = cfg["dataset"]["test_pose"]
        return ZJUTestDataset(
            d["raw_dataset_path"], d["dataset_path"], test_type="pose",
            bgcolor=cfg["bgcolor"], skip=d.get("skip", 30),
        ), "zju"
    if t == "train":
        d = cfg["dataset"]["train"]
        return TrainDataset(
            d["dataset_path"], bgcolor=cfg["bgcolor"], skip=d.get("skip", 1),
            target_size=cfg["img_size"],
        ), "zju"
    if t == "freeview":
        d = cfg["dataset"]["test_freeview"]
        return FreeviewDataset(
            d["dataset_path"], frame_idx=args.frame_idx, total_frames=args.n_frames,
            bgcolor=cfg["bgcolor"], src_type=d.get("src_type", "zju_mocap"),
            target_size=cfg["img_size"],
        ), None
    if t == "pose_mdm":
        d = cfg["dataset"]["test_pose_mdm"]
        return NewPoseDataset(
            d["dataset_path"], args.pose_path or d["pose_path"], bgcolor=cfg["bgcolor"],
            img_size=tuple(cfg["img_size"]),
        ), None
    raise ValueError(args.type)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--type", default="view",
                    choices=["view", "pose", "train", "freeview", "pose_mdm"])
    ap.add_argument("--iter", type=int, default=None)
    ap.add_argument("--frame_idx", type=int, default=0)
    ap.add_argument("--n_frames", type=int, default=100)
    ap.add_argument("--pose_path", default=None)
    ap.add_argument("--bgcolor", type=float, nargs=3, default=None)
    ap.add_argument(
        "--dataset_path", default=None,
        help="override the eval split directory (snapshot view protocol "
        "only) — used to evaluate the NOISY-pose test split raw vs refined",
    )
    ap.add_argument(
        "--tag", default=None,
        help="output name (log/eval dir/metric file) instead of --type, so "
        "e.g. the raw and refined noisy-pose evals don't overwrite the "
        "clean view eval",
    )
    args = ap.parse_args()
    tag = args.tag or args.type

    cfg = make_cfg(args.cfg)
    cfg["model"]["eval_mode"] = True
    if args.bgcolor is not None:
        cfg["bgcolor"] = list(args.bgcolor)
    setup_logging(cfg["save_dir"], filename=f"log_eval_{tag}.txt")

    dataset, protocol = build_dataset(cfg, args)
    trainer = Trainer(cfg, dataset.get_canonical_info())
    it = trainer.load_for_eval(os.path.join(cfg["save_dir"], "checkpoints"), args.iter)
    logging.info("loaded iter %d; model size %.2f MB", it, model_size_mb(trainer.params))

    # novel-pose protocols disable the pose refiner (eval.py:327-329)
    if args.type in ("pose", "pose_mdm") and "pose_refinement" in trainer.params:
        import dataclasses

        trainer.gom_cfg = dataclasses.replace(trainer.gom_cfg, pose_refinement=None)

    evaluator = None
    if protocol == "zju":
        evaluator = Evaluator()
    elif protocol == "snapshot":
        evaluator = EvaluatorSnapshot()

    # chain refined poses from train_pose (--pose_path checkpoints/pose.pkl)
    # into the render loop, like the reference's pose.pt workflow
    # (train_pose.py:290-296 -> eval re-consumption)
    refined = None
    if args.pose_path is not None and args.type != "pose_mdm":
        refined = load_refined_poses(args.pose_path)
        assert refined[0].shape[0] >= len(dataset), (
            f"pose file has {refined[0].shape[0]} frames, dataset {len(dataset)}"
        )
        logging.info("using refined poses from %s", args.pose_path)

    out_dir = os.path.join(cfg["save_dir"], "eval", tag)
    os.makedirs(out_dir, exist_ok=True)
    bg = jnp.asarray(np.asarray(cfg["bgcolor"], np.float32) / 255.0)
    budget = RenderBudgetCheck()

    for i in range(len(dataset)):
        item = dataset[i]
        batch = to_device(item)
        if refined is not None:
            from gomavatar_tpu.ops.skeleton import body_pose_to_body_RTs

            Rhs, Ths, poses = refined
            batch["dst_Rs"], batch["dst_Ts"] = body_pose_to_body_RTs(
                jnp.asarray(poses[i]), batch["dst_tpose_joints"]
            )
            batch["dst_posevec"] = jnp.asarray(poses[i][3:] + 1e-2)
            batch["global_R"] = jnp.asarray(Rhs[i])
            batch["global_T"] = jnp.asarray(Ths[i])
        rgb, mask, aux = trainer.forward(batch)
        pred = np.asarray(unpack(rgb, mask, bg, clamp=True))
        budget.check(aux, item["frame_name"])
        Image.fromarray(to_8b_image(pred)).save(
            os.path.join(out_dir, item["frame_name"] + ".png")
        )
        if evaluator is not None:
            evaluator.evaluate(pred, np.asarray(item["target_rgbs"]))
        if i % 10 == 0:
            logging.info("rendered %d/%d", i, len(dataset))

    budget.summarize()
    if evaluator is not None:
        means = evaluator.summarize(
            os.path.join(cfg["save_dir"], "eval", f"metric_{tag}.npy")
        )
        logging.info("metrics: %s", {k: round(v, 4) for k, v in means.items()})


if __name__ == "__main__":
    main()
