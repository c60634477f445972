"""Evaluators for both benchmark protocols of the reference.

  * ``Evaluator`` — ZJU-MoCap / neuralbody protocol (eval.py:86-143):
    numpy-style MSE/PSNR, skimage-0.18 SSIM (data_range=2 float quirk),
    VGG-LPIPS x1000;
  * ``EvaluatorSnapshot`` — Anim-NeRF protocol (eval.py:146-180):
    torchmetrics PSNR/SSIM (data_range=1) and alex-LPIPS (AlexNet trunk,
    eval.py:155; flagged uncalibrated without a converted pretrained
    checkpoint — see models/lpips.py for the offline conversion procedure).

Both quantize through uint8 before metrics, exactly like the reference
(to_8b_image round-trip, train.py:82-85), and dump per-frame lists to
``metric_{type}.npy``.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from gomavatar_tpu.metrics import psnr, ssim_skimage, ssim_torchmetrics
from gomavatar_tpu.models import lpips as lpips_lib


def to_8b_image(img: np.ndarray) -> np.ndarray:
    return (255.0 * np.clip(img, 0.0, 1.0)).astype(np.uint8)


class _EvaluatorBase:
    def __init__(self, lpips_params=None, lpips_calibrated=False):
        if lpips_params is None:
            # best-available weights; logs the calibration status once
            lpips_params, lpips_calibrated, _ = lpips_lib.load_lpips("vgg")
        self.lpips_params = lpips_params
        self.lpips_calibrated = lpips_calibrated
        self.metrics: dict[str, list] = {}

    def _add(self, name, value):
        self.metrics.setdefault(name, []).append(float(value))

    def _lpips(self, pred, gt):
        return float(
            lpips_lib.lpips(
                self.lpips_params,
                jnp.asarray(pred * 2.0 - 1.0, jnp.float32),
                jnp.asarray(gt * 2.0 - 1.0, jnp.float32),
            )
        )

    def summarize(self, path: str | None = None) -> dict[str, float]:
        means = {k: float(np.mean(v)) for k, v in self.metrics.items()}
        if not self.lpips_calibrated and "lpips" in means:
            means["lpips_uncalibrated"] = means.pop("lpips")
        if path is not None:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            np.save(path, self.metrics)
        self.metrics = {}
        return means


class Evaluator(_EvaluatorBase):
    """ZJU / neuralbody protocol."""

    def evaluate(self, rgb_pred: np.ndarray, rgb_gt: np.ndarray):
        pred = to_8b_image(rgb_pred) / 255.0
        gt = to_8b_image(rgb_gt) / 255.0
        mse = float(np.mean((pred - gt) ** 2))
        self._add("mse", mse)
        self._add("psnr", -10.0 * np.log(mse) / np.log(10.0))
        self._add("ssim", ssim_skimage(jnp.asarray(pred, jnp.float32), jnp.asarray(gt, jnp.float32)))
        self._add("lpips", self._lpips(pred, gt) * 1000.0)


class EvaluatorSnapshot(_EvaluatorBase):
    """PeopleSnapshot / Anim-NeRF protocol: alex-LPIPS per the reference
    (torchmetrics ``net_type="alex"``, eval.py:155)."""

    def __init__(self, lpips_params=None, lpips_calibrated=False):
        if lpips_params is None:
            lpips_params, lpips_calibrated, _ = lpips_lib.load_lpips("alex")
        super().__init__(lpips_params, lpips_calibrated)

    def evaluate(self, rgb_pred: np.ndarray, rgb_gt: np.ndarray):
        pred = to_8b_image(rgb_pred) / 255.0
        gt = to_8b_image(rgb_gt) / 255.0
        self._add("psnr", psnr(jnp.asarray(pred, jnp.float32), jnp.asarray(gt, jnp.float32)))
        self._add("ssim", ssim_torchmetrics(jnp.asarray(pred, jnp.float32), jnp.asarray(gt, jnp.float32)))
        self._add("lpips", self._lpips(pred, gt))
