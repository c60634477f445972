"""Model modules: appearance table, pose refinement, non-rigid offset, shadow.

Pure init/apply pairs over plain pytrees — TPU-native equivalents of the
reference's nn.Modules:
  * AppearanceModule (models/modules/appearance_module.py:6-23) — per-face
    RGB parameter table;
  * PoseRefinementModule (models/modules/pose_refinement_module.py:10-48) —
    posevec -> 23 residual bone rotations, identity root prepended;
  * NonRigidModule (models/modules/non_rigid_module.py:75-147) — pose-
    conditioned per-vertex offsets with Hann-annealed positional encoding;
  * ShadowModule (models/modules/shadow_module.py:67-117) — per-pixel
    normal -> sigmoid shading scalar.

All kick-in gating happens in the caller (models/gom.py) with traced
``i_iter`` so one compiled program covers the whole schedule.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gomavatar_tpu.nn import mlp_init, mlp_apply
from gomavatar_tpu.ops.embedding import (
    annealed_positional_encoding,
    positional_encoding,
    embed_dim,
)
from gomavatar_tpu.ops.transforms import so3_exp


# -- appearance --------------------------------------------------------------

def appearance_init(num_faces: int, color_init: float = 0.5):
    """Per-face color table, init 0.5 (appearance_module.py:12-14)."""
    return {"colors": jnp.full((num_faces, 3), color_init, jnp.float32)}


def appearance_apply(params):
    return params["colors"]


# -- pose refinement ----------------------------------------------------------

def pose_refinement_init(key, cfg):
    total = cfg["total_bones"] if cfg.get("refine_root", False) else cfg["total_bones"] - 1
    return mlp_init(
        key,
        d_in=cfg["embedding_size"],
        width=cfg["mlp_width"],
        depth=cfg["mlp_depth"],
        d_out=3 * total,
        last_init_scale=1e-5,
    )


def pose_refinement_apply(params, posevec, total_bones: int = 24, refine_root: bool = False):
    """posevec (69,) -> delta rotations (J, 3, 3), identity for the root
    unless refine_root (pose_refinement_module.py:40-48)."""
    rvec = mlp_apply(params, posevec).reshape(-1, 3)
    Rs = so3_exp(rvec)
    if not refine_root:
        Rs = jnp.concatenate([jnp.eye(3, dtype=Rs.dtype)[None], Rs], axis=0)
    return Rs


# -- non-rigid offsets --------------------------------------------------------

def non_rigid_embed_dim(cfg) -> int:
    return embed_dim(cfg["multires"], include_input=False)


def non_rigid_init(key, cfg):
    pe = non_rigid_embed_dim(cfg)
    return mlp_init(
        key,
        d_in=pe + cfg["condition_code_size"],
        width=cfg["mlp_width"],
        depth=cfg["mlp_depth"],
        d_out=3,
        skips=tuple(cfg["skips"]),
        skip_dim=pe,
        last_init_scale=cfg.get("init_scale", 1e-5),
    )


def non_rigid_apply(params, cfg, xyz, posevec, i_iter):
    """xyz (N, 3), posevec (69,) -> offset vertices (N, 3)
    (non_rigid_module.py:122-134: input = [posevec, pos_embed], skip layers
    re-concat pos_embed)."""
    pe = annealed_positional_encoding(
        xyz,
        cfg["multires"],
        i_iter,
        kick_in_iter=cfg["kick_in_iter"],
        full_band_iter=cfg["full_band_iter"],
    )
    N = xyz.shape[0]
    cond = jnp.broadcast_to(posevec[None, :], (N, posevec.shape[0]))
    h = jnp.concatenate([cond, pe], axis=-1)
    offset = mlp_apply(params, h, skips=tuple(cfg["skips"]), skip_input=pe)
    return xyz + offset[:, :3]


# -- shadow -------------------------------------------------------------------

def shadow_embed_dim(cfg) -> int:
    return embed_dim(cfg["multires"], include_input=True)


def shadow_init(key, cfg):
    pe = shadow_embed_dim(cfg)
    skips = tuple(s for s in cfg["skips"] if s < cfg["mlp_depth"])
    return mlp_init(
        key,
        d_in=pe,
        width=cfg["mlp_width"],
        depth=cfg["mlp_depth"],
        d_out=1,
        skips=skips,
        skip_dim=pe,
        last_init_scale=cfg.get("init_scale", 1e-5),
    )


def shadow_apply(params, cfg, normals):
    """normals (..., 3) -> sigmoid shading (..., 1)
    (shadow_module.py:108-117); the x2 identity-at-init scaling is applied
    by the caller (models/model.py:283).

    Runs in bfloat16: the MLP is evaluated per PIXEL (H*W points — the
    heaviest matmuls of the forward) and shading is a smooth sigmoid
    scalar, so bf16 costs ~1e-3 shading error for ~3x MXU throughput."""
    pe = positional_encoding(normals, cfg["multires"], include_input=True)
    skips = tuple(s for s in cfg["skips"] if s < cfg["mlp_depth"])
    p16 = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    out = mlp_apply(p16, pe.astype(jnp.bfloat16), skips=skips, skip_input=pe.astype(jnp.bfloat16))
    return jax.nn.sigmoid(out.astype(jnp.float32))
