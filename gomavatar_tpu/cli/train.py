"""Training driver (CLI): the reference's train.py:178-386 re-built on the
jitted Trainer.

    python -m gomavatar_tpu.cli.train --cfg configs/exps/zju-mocap_377.yaml
        [--resume]

Differences from the reference, by design:
  * the whole optimizer step is one compiled XLA program (Trainer);
  * host image decode overlaps device compute via the thread Prefetcher;
  * checkpoints are orbax with the subdivision phase stored inside.
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np
import jax.numpy as jnp

from gomavatar_tpu.config import make_cfg
from gomavatar_tpu.trainer import Trainer
from gomavatar_tpu.data.dataset import TrainDataset, to_device, Prefetcher
from gomavatar_tpu.eval_lib import Evaluator, to_8b_image
from gomavatar_tpu.losses import unpack
from gomavatar_tpu.utils.tb import TBLogger
from gomavatar_tpu.models import lpips as lpips_lib


def setup_logging(save_dir: str, filename: str = "log.txt"):
    os.makedirs(save_dir, exist_ok=True)
    logging.basicConfig(
        handlers=[logging.FileHandler(os.path.join(save_dir, filename)), logging.StreamHandler()],
        format="%(asctime)s %(message)s",
        datefmt="%m/%d/%Y %H:%M:%S",
        level=logging.INFO,
        force=True,
    )


def evaluate_on(trainer: Trainer, dataset, tb, split: str, random_bgcolor: bool, max_items=None):
    evaluator = Evaluator(lpips_params=trainer.lpips_params, lpips_calibrated=False)
    bg = np.asarray(dataset.bgcolor if dataset.bgcolor is not None else [0, 0, 0], np.float32) / 255.0
    n = len(dataset) if max_items is None else min(len(dataset), max_items)
    for i in range(n):
        batch = to_device(dataset[i])
        rgb, mask, _ = trainer.forward(batch)
        pred = unpack(rgb, mask, jnp.asarray(bg), clamp=True)
        evaluator.evaluate(np.asarray(pred), np.asarray(batch["target_rgbs"]))
    means = evaluator.summarize()
    logging.info("evaluate on %s: %s", split, {k: round(v, 4) for k, v in means.items()})
    for k, v in means.items():
        tb.summ_scalar(f"{split}/{k}", v, force=True)
    return means


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--max_iters", type=int, default=None, help="override total_iters")
    args = ap.parse_args()

    cfg = make_cfg(args.cfg)
    setup_logging(cfg["save_dir"])
    with open(os.path.join(cfg["save_dir"], "config.yaml"), "w") as f:
        f.write(cfg.dump())
    ckpt_dir = os.path.join(cfg["save_dir"], "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)

    tcfg = cfg["train"]
    dcfg = cfg["dataset"]["train"]
    dataset = TrainDataset(
        dcfg["dataset_path"],
        maxframes=dcfg["maxframes"],
        bgcolor=None if cfg["random_bgcolor"] else cfg["bgcolor"],
        skip=dcfg["skip"],
        target_size=cfg["img_size"],
        crop_size=dcfg["crop_size"],
        prefetch=dcfg["prefetch"],
        split_for_pose=dcfg["split_for_pose"],
    )
    logging.info("train frames: %d", len(dataset))

    lpips_params = None
    if tcfg["losses"]["lpips"]["coeff"] > 0:
        lpips_params, calibrated = lpips_lib.init_lpips()
        if not calibrated:
            logging.warning(
                "LPIPS running with a random VGG backbone (no pretrained "
                "weights in this environment) — the loss is a usable "
                "perceptual signal but values are not comparable to "
                "published LPIPS numbers."
            )

    trainer = Trainer(cfg, dataset.get_canonical_info(), lpips_params=lpips_params)
    if args.resume:
        trainer.resume(ckpt_dir)

    tb = TBLogger(os.path.join(cfg["save_dir"], "tb"), freq=tcfg["tb_freq"])
    total_iters = args.max_iters or tcfg["total_iters"]

    if trainer.i_iter == 0:
        trainer.save(ckpt_dir)  # iter_0 baseline (reference train.py:288-295)

    rng = np.random.default_rng(0)
    t_last = time.perf_counter()
    while trainer.i_iter < total_iters:
        order = rng.permutation(len(dataset))
        for item in Prefetcher(dataset, order=order):
            if trainer.i_iter >= total_iters:
                break
            batch = to_device(item)
            total, losses = trainer.step(batch)
            it = trainer.i_iter
            tb.set_step(it)

            if it % tcfg["log_freq"] == 0:
                dt = time.perf_counter() - t_last
                t_last = time.perf_counter()
                loss_str = ", ".join(f"{k}: {float(v):.4f}" for k, v in losses.items())
                logging.info(
                    "iter %d (%.2f it/s) - loss: %.4f (%s)",
                    it, tcfg["log_freq"] / max(dt, 1e-9), float(total), loss_str,
                )
            tb.summ_scalar("train/total_loss", float(total))
            for k, v in losses.items():
                tb.summ_scalar(f"train/loss_{k}", float(v))

            if it % tcfg["save_freq"] == 0:
                trainer.save(ckpt_dir)
            if it % tcfg["eval_freq"] == 0:
                evaluate_on(trainer, dataset, tb, "test_on_train", cfg["random_bgcolor"], max_items=4)

    trainer.save(ckpt_dir)
    logging.info("training done at iter %d", trainer.i_iter)


if __name__ == "__main__":
    main()
