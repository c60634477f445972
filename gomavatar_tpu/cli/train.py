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


def evaluate_on(trainer: Trainer, dataset, tb, split: str, random_bgcolor: bool,
                max_items=None, protocol: str = "zju"):
    """Periodic eval (reference train.py:58-95,379-382), protocol-aware:
    snapshot test splits use the Anim-NeRF evaluator (gaussian-window SSIM +
    alex-LPIPS), like the reference's Evaluator_snapshot."""
    if protocol == "snapshot":
        from gomavatar_tpu.eval_lib import EvaluatorSnapshot

        evaluator = EvaluatorSnapshot()
    else:
        evaluator = Evaluator(lpips_params=trainer.lpips_params,
                              lpips_calibrated=trainer.lpips_calibrated)
    bg = np.asarray(dataset.bgcolor if dataset.bgcolor is not None else [0, 0, 0], np.float32) / 255.0
    n = len(dataset) if max_items is None else min(len(dataset), max_items)
    for i in range(n):
        batch = to_device(dataset[i])
        rgb, mask, _ = trainer.forward(batch)
        # composite over the SAME background the item's target was composited
        # with.  The reference keeps pred and GT on one STATIC background
        # (it composites over dataloader.dataset.bgcolor, train.py:58-95,
        # and its eval datasets are built with fixed cfg.bgcolor); here
        # eval-on-train items carry per-item random backgrounds under
        # random_bgcolor, so the equivalent is the item's own bg — a static
        # bg would score the background mismatch, not the model
        item_bg = batch.get("bgcolor", None)
        pred = unpack(rgb, mask, item_bg if item_bg is not None else jnp.asarray(bg), clamp=True)
        evaluator.evaluate(np.asarray(pred), np.asarray(batch["target_rgbs"]))
    means = evaluator.summarize()
    logging.info("evaluate on %s: %s", split, {k: round(v, 4) for k, v in means.items()})
    for k, v in means.items():
        tb.summ_scalar(f"{split}/{k}", v, force=True)
    return means


def log_tb_visuals(trainer: Trainer, tb, batch):
    """The reference's in-forward TB summaries (models/model.py:252-285):
    rendered maps + canonical/observation point clouds with LBS coloring."""
    rgb, mask, aux = trainer.forward(batch, train=True)
    tb.summ_image("model/rgb", np.asarray(rgb))
    tb.summ_image("model/albedo", np.asarray(aux["albedo"]))
    tb.summ_image("model/mask", np.asarray(mask))
    normal = np.asarray(aux["normal"])
    tb.summ_image("model/normal", 1.0 - (normal + 1.0) * 0.5)
    if aux.get("normal_mask") is not None:
        tb.summ_image("model/normal_mask", np.asarray(aux["normal_mask"]))
    if aux.get("shadow") is not None:
        sh = np.asarray(aux["shadow"])
        tb.summ_image("model/shadow", sh[..., 0] / max(float(sh.max()), 1e-6))
    tb.summ_error_map("model/error", np.asarray(rgb), np.asarray(batch["target_rgbs"]))
    # PCA feature viz of the normal map (tb_util.py:85-100 equivalent)
    tb.summ_feat("model/normal_pca", normal.transpose(2, 0, 1))

    verts_cnl = np.asarray(aux["verts_cnl"])
    verts_obs = np.asarray(aux["verts_obs"])
    # projected observation vertices as a 2D raster (tb_util.py:126-135)
    K = np.asarray(batch["K"])
    E = np.asarray(batch["E"])
    cam = verts_obs @ E[:3, :3].T + E[:3, 3]
    uvw = cam @ K.T
    uv = uvw[:, :2] / np.maximum(uvw[:, 2:3], 1e-6)
    H, W = np.asarray(rgb).shape[:2]
    tb.summ_pointcloud2d("observation/projected", uv, (W, H))
    faces = np.asarray(trainer.statics.faces)
    colors = np.asarray(aux["colors"])
    tb.summ_pointcloud("canonical/density", verts_cnl, faces=faces)
    tb.summ_pointcloud("observation/density", verts_obs, faces=faces)
    # per-face colors -> per-vertex for mesh display
    vc = np.zeros_like(verts_cnl)
    np.add.at(vc, faces[:, 0], colors)
    np.add.at(vc, faces[:, 1], colors)
    np.add.at(vc, faces[:, 2], colors)
    cnt = np.zeros(len(verts_cnl))
    np.add.at(cnt, faces.reshape(-1), 1.0)
    vc = vc / np.maximum(cnt, 1.0)[:, None]
    tb.summ_pointcloud("canonical/color", verts_cnl, colors=vc, faces=faces)
    # LBS-weight coloring (models/model.py:264-268) via a simple palette
    lbs = np.asarray(trainer.statics.lbs_weights)
    palette = np.asarray(
        [np.cos(np.arange(lbs.shape[1])), np.sin(np.arange(lbs.shape[1])),
         np.linspace(0, 1, lbs.shape[1])]
    ).T * 0.5 + 0.5
    tb.summ_pointcloud("canonical/lbs", verts_cnl, colors=lbs @ palette, faces=faces)


def evaluate_test_split(trainer: Trainer, cfg, tb):
    """Periodic novel-view eval against the configured test split
    (reference train.py:379-382); skipped gracefully if the data is absent."""
    try:
        d = cfg["dataset"]["test_view"]
        if d.get("name", "zju-mocap") == "snapshot":
            ds = TrainDataset(
                d["dataset_path"], bgcolor=cfg["bgcolor"], skip=d.get("skip", 1),
                target_size=cfg["img_size"],
            )
        else:
            from gomavatar_tpu.data.dataset import ZJUTestDataset

            ds = ZJUTestDataset(
                d["raw_dataset_path"], d["dataset_path"], test_type="view",
                bgcolor=cfg["bgcolor"], exclude_view=d.get("exclude_view", 0),
                skip=d.get("skip", 30),
            )
    except (FileNotFoundError, KeyError, OSError) as e:
        logging.info("skipping test-split eval (%s)", e)
        return
    protocol = "snapshot" if d.get("name", "zju-mocap") == "snapshot" else "zju"
    evaluate_on(trainer, ds, tb, "test", cfg["random_bgcolor"], max_items=8,
                protocol=protocol)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--max_iters", type=int, default=None, help="override total_iters")
    ap.add_argument(
        "--data_parallel", type=int, default=1,
        help="frames per optimizer step, sharded over that many devices "
        "(grad psum over the mesh; beyond-reference capability)",
    )
    args = ap.parse_args()

    cfg = make_cfg(args.cfg)
    setup_logging(cfg["save_dir"])
    with open(os.path.join(cfg["save_dir"], "config.yaml"), "w") as f:
        f.write(cfg.dump())
    ckpt_dir = os.path.join(cfg["save_dir"], "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)

    tcfg = cfg["train"]
    dcfg = cfg["dataset"]["train"]
    use_native = bool(dcfg.get("use_native", False))
    if use_native:
        from gomavatar_tpu.data import native_loader

        if not native_loader.available():
            logging.warning(
                "dataset.train.use_native requested but the native library "
                "is unavailable; falling back to the cv2 path"
            )
            use_native = False
    dataset = TrainDataset(
        dcfg["dataset_path"],
        maxframes=dcfg["maxframes"],
        bgcolor=None if cfg["random_bgcolor"] else cfg["bgcolor"],
        skip=dcfg["skip"],
        target_size=cfg["img_size"],
        crop_size=dcfg["crop_size"],
        prefetch=dcfg["prefetch"],
        split_for_pose=dcfg["split_for_pose"],
        use_native=use_native,
    )
    logging.info("train frames: %d", len(dataset))

    lpips_params, calibrated = None, False
    if tcfg["losses"]["lpips"]["coeff"] > 0:
        # best-available weights (calibrated trunk > reference heads >
        # random); load_lpips logs the one calibration-status line
        lpips_params, calibrated, _ = lpips_lib.load_lpips("vgg")

    trainer = Trainer(
        cfg, dataset.get_canonical_info(), lpips_params=lpips_params,
        data_parallel=args.data_parallel, lpips_calibrated=calibrated,
    )
    if args.resume:
        trainer.resume(ckpt_dir)

    tb = TBLogger(os.path.join(cfg["save_dir"], "tb"), freq=tcfg["tb_freq"])
    total_iters = args.max_iters or tcfg["total_iters"]

    if trainer.i_iter == 0:
        trainer.save(ckpt_dir)  # iter_0 baseline (reference train.py:288-295)

    rng = np.random.default_rng(0)
    t_last = time.perf_counter()
    dp = max(1, args.data_parallel)
    balanced_Es = None
    if tcfg.get("pose_balanced_sampling", False):
        balanced_Es = dataset.get_all_Es()
        logging.info("pose-balanced frame sampling ON (%d frames)", len(balanced_Es))
    while trainer.i_iter < total_iters:
        if balanced_Es is not None:
            from gomavatar_tpu.utils.sampling import balanced_order

            order = balanced_order(balanced_Es, len(dataset), rng)
        else:
            order = rng.permutation(len(dataset))
        pending = []
        for item in Prefetcher(dataset, order=order):
            if trainer.i_iter >= total_iters:
                break
            if dp > 1:
                pending.append(item)
                if len(pending) < dp:
                    continue
                batch = pending
                pending = []
                total, losses = trainer.step(batch)
                batch = to_device(batch[0])  # representative frame for TB visuals
            else:
                batch = to_device(item)
                total, losses = trainer.step(batch)
            it = trainer.i_iter
            tb.set_step(it)

            if it % tcfg["log_freq"] == 0:
                dt = time.perf_counter() - t_last
                t_last = time.perf_counter()
                total_f = float(total)
                loss_str = ", ".join(f"{k}: {float(v):.4f}" for k, v in losses.items())
                logging.info(
                    "iter %d (%.2f it/s) - loss: %.4f (%s)",
                    it, tcfg["log_freq"] / max(dt, 1e-9), total_f, loss_str,
                )
                if not np.isfinite(total_f):
                    # fail fast: continuing poisons every parameter and the
                    # next checkpoint; the last good checkpoint stays usable
                    # for --resume after the bug is fixed
                    raise RuntimeError(
                        f"non-finite training loss at iter {it}: {loss_str}"
                    )
            # pass device scalars through: TBLogger converts AFTER its freq
            # gate, so off-cadence steps don't block on the device result
            tb.summ_scalar("train/total_loss", total)
            for k, v in losses.items():
                tb.summ_scalar(f"train/loss_{k}", v)

            if it % tcfg["tb_freq"] == 0:
                log_tb_visuals(trainer, tb, batch)
            if it % tcfg["save_freq"] == 0:
                trainer.save(ckpt_dir)
            if it % tcfg["eval_freq"] == 0:
                evaluate_on(trainer, dataset, tb, "test_on_train", cfg["random_bgcolor"], max_items=4)
                evaluate_test_split(trainer, cfg, tb)

    trainer.save(ckpt_dir)
    logging.info("training done at iter %d", trainer.i_iter)


if __name__ == "__main__":
    main()
