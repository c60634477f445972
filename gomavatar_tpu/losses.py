"""Training loss: the reference's ``compute_loss`` (train.py:98-163) as one
pure jnp function over the model's aux outputs.

Terms (coefficients from cfg.train.losses, configs/default.yaml:101-109 and
exps/zju-mocap_377.yaml:99-112):
  rgb L1 (1.0) + mask L1 (5.0) + VGG-LPIPS (1.0)
  + uniform mesh Laplacian on the observation mesh (10.0)
  + L1 of the soft normal-mask vs the max-pool-DILATED GT mask (1.0, k=7)
  + mesh normal consistency (0.10)
  + color consistency across edge-adjacent faces (0.05)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gomavatar_tpu.ops.mesh_ops import (
    uniform_laplacian_loss,
    uniform_laplacian_loss_nbr,
    normal_consistency_loss,
    color_consistency_loss,
)
from gomavatar_tpu.models.lpips import lpips as lpips_fn


def dilate_mask(mask: jax.Array, kernel_size: int) -> jax.Array:
    """Max-pool dilation, stride 1, same padding (train.py:137-142).

    Matches F.max_pool2d(k, stride=1, padding=k//2): for even k the torch
    output is shifted; the reference uses k=7 (odd) so plain SAME padding
    is exact.  Separable (max over rows then columns — identical result,
    2k compares per pixel instead of k^2)."""
    pad = kernel_size // 2
    out = jax.lax.reduce_window(
        mask, -jnp.inf, jax.lax.max, (kernel_size, 1), (1, 1), [(pad, pad), (0, 0)]
    )
    return jax.lax.reduce_window(
        out, -jnp.inf, jax.lax.max, (1, kernel_size), (1, 1), [(0, 0), (pad, pad)]
    )


def compute_loss(
    rgb_pred: jax.Array,  # (H, W, 3)
    mask_pred: jax.Array,  # (H, W)
    aux: dict,
    rgb_gt: jax.Array,
    mask_gt: jax.Array,
    statics,
    loss_cfg: dict,
    lpips_params=None,
):
    """Returns (total_loss, dict of unscaled per-term losses)."""
    losses = {}
    total = 0.0

    l_rgb = jnp.mean(jnp.abs(rgb_pred - rgb_gt))
    losses["rgb"] = l_rgb
    total = total + l_rgb * loss_cfg["rgb"]["coeff"]

    l_mask = jnp.mean(jnp.abs(mask_pred - mask_gt))
    losses["mask"] = l_mask
    total = total + l_mask * loss_cfg["mask"]["coeff"]

    if lpips_params is not None and loss_cfg["lpips"]["coeff"] > 0:
        l_lpips = lpips_fn(lpips_params, 2.0 * rgb_pred - 1.0, 2.0 * rgb_gt - 1.0)
        losses["lpips"] = l_lpips
        total = total + l_lpips * loss_cfg["lpips"]["coeff"]

    lap = loss_cfg["laplacian"]
    if lap["coeff_canonical"] > 0:
        l = uniform_laplacian_loss_nbr(aux["verts_cnl"], statics.nbr_table, statics.vertex_degree)
        losses["laplacian_canonical"] = l
        total = total + l * lap["coeff_canonical"]
    if lap["coeff_observation"] > 0:
        l = uniform_laplacian_loss_nbr(aux["verts_obs"], statics.nbr_table, statics.vertex_degree)
        losses["laplacian_observation"] = l
        total = total + l * lap["coeff_observation"]

    nrm = loss_cfg["normal"]
    if nrm["coeff_mask"] > 0:
        gt = dilate_mask(mask_gt, nrm.get("kernel_size", 7)) if nrm.get("mask_dilate", False) else mask_gt
        l = jnp.mean(jnp.abs(aux["normal_mask"] - gt))
        losses["normal_mask"] = l
        total = total + l * nrm["coeff_mask"]
    if nrm["coeff_consist"] > 0:
        l = normal_consistency_loss(aux["verts_obs"], statics.nc_quads, statics.dual_nc)
        losses["normal_consist"] = l
        total = total + l * nrm["coeff_consist"]

    cc = loss_cfg["color_consist"]
    if cc["coeff"] > 0:
        l = color_consistency_loss(aux["colors"], statics.face_connectivity, statics.dual_conn)
        losses["color_consist"] = l
        total = total + l * cc["coeff"]

    return total, losses


def unpack(rgb: jax.Array, mask: jax.Array, bgcolor: jax.Array, clamp: bool = False) -> jax.Array:
    """Composite rendered rgb over a background color, exactly as the
    reference does (train.py:53-55: rgb * mask + bg * (1 - mask); the eval
    variant also clamps to [0, 1], eval.py:80-83)."""
    out = rgb * mask[..., None] + bgcolor[None, None, :] * (1.0 - mask)[..., None]
    return jnp.clip(out, 0.0, 1.0) if clamp else out
