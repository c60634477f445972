"""Image metrics: PSNR and SSIM in both evaluation protocols of the
reference (SURVEY.md §2.D):

  * ZJU / neuralbody protocol (eval.py:86-143): numpy PSNR
    (-10 log10(mse)) and scikit-image 0.18 ``structural_similarity`` with
    its float-image quirk — no explicit data_range means skimage 0.18
    assumes data_range = 2.0 (float dtype range [-1, 1]), uniform 7x7
    window, channel-averaged;
  * Anim-NeRF / PeopleSnapshot protocol (eval.py:146-180): torchmetrics
    defaults — data_range = 1.0, gaussian 11x11 window with sigma 1.5.

Pure jnp, jit-friendly; used both as eval metrics and in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(pred: jax.Array, gt: jax.Array, data_range: float = 1.0) -> jax.Array:
    mse = jnp.mean((pred - gt) ** 2)
    return 10.0 * jnp.log10(data_range**2 / mse)


def mse(pred: jax.Array, gt: jax.Array) -> jax.Array:
    return jnp.mean((pred - gt) ** 2)


def _uniform_filter(img: jax.Array, size: int) -> jax.Array:
    """Valid-mode uniform filter over the two leading spatial dims of
    (H, W, C)."""
    x = img.transpose(2, 0, 1)[:, None]  # (C, 1, H, W)
    out = jax.lax.conv_general_dilated(
        x, jnp.ones((1, 1, size, size), img.dtype) / (size * size),
        window_strides=(1, 1), padding="VALID",
    )
    return out[:, 0].transpose(1, 2, 0)


def _gaussian_filter(img: jax.Array, size: int, sigma: float) -> jax.Array:
    r = jnp.arange(size, dtype=img.dtype) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (r / sigma) ** 2)
    g = g / jnp.sum(g)
    k = jnp.outer(g, g)[None, None]  # (1, 1, size, size)
    x = img.transpose(2, 0, 1)[:, None]
    out = jax.lax.conv_general_dilated(x, k, (1, 1), "VALID")
    return out[:, 0].transpose(1, 2, 0)


def _ssim_core(pred, gt, data_range, win_size, filt, use_sample_covariance):
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    mu_p = filt(pred)
    mu_g = filt(gt)
    mu_pp = filt(pred * pred)
    mu_gg = filt(gt * gt)
    mu_pg = filt(pred * gt)
    if use_sample_covariance:
        # skimage: unbiased covariance with N/(N-1) correction
        NP = win_size * win_size
        cov_norm = NP / (NP - 1.0)
    else:
        cov_norm = 1.0
    var_p = cov_norm * (mu_pp - mu_p * mu_p)
    var_g = cov_norm * (mu_gg - mu_g * mu_g)
    cov = cov_norm * (mu_pg - mu_p * mu_g)
    num = (2 * mu_p * mu_g + C1) * (2 * cov + C2)
    den = (mu_p**2 + mu_g**2 + C1) * (var_p + var_g + C2)
    return jnp.mean(num / den)


def ssim_skimage(pred: jax.Array, gt: jax.Array, data_range: float = 2.0) -> jax.Array:
    """scikit-image 0.18 ``structural_similarity(multichannel=True)`` on
    float images: uniform 7x7 window, sample covariance, and the infamous
    implicit data_range of 2.0 for floats (the protocol the reference's ZJU
    numbers are computed with, eval.py:106-108)."""
    return _ssim_core(
        pred, gt, data_range, 7, lambda x: _uniform_filter(x, 7), use_sample_covariance=True
    )


def ssim_torchmetrics(pred: jax.Array, gt: jax.Array, data_range: float = 1.0) -> jax.Array:
    """torchmetrics ``StructuralSimilarityIndexMeasure`` defaults: gaussian
    11x11 sigma-1.5 window, population covariance (eval.py:160)."""
    return _ssim_core(
        pred, gt, data_range, 11, lambda x: _gaussian_filter(x, 11, 1.5),
        use_sample_covariance=False,
    )
