"""Sharded training / rendering steps over a device mesh.

Capabilities beyond the reference (which is single-GPU batch-1,
SURVEY.md §2.F):

  * ``make_data_parallel_train_step`` — train ONE avatar on ``n_devices``
    frames per optimizer step: the per-frame forward+backward runs fully
    replicated-model / sharded-batch under ``shard_map``; gradients are
    averaged with ``psum`` over the ICI and the Adam update is computed
    identically on every device (standard DP);
  * ``make_multi_scene_render`` — render N independent scenes (stacked
    parameter pytrees) sharded across devices: embarrassingly parallel, no
    collectives (BASELINE config #5: all 6 ZJU scenes batched on a mesh);
  * ``stack_batches`` — host-side collation of per-frame numpy items into a
    leading-axis-stacked pytree for sharding.

The per-device work keeps the renderer's single-image semantics (one frame
per device per step), so the Pallas kernels never see a batch axis.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map  # noqa: the jax.shard_map API enforces vma typing that rejects custom-VJP kernels under P() out_specs

from gomavatar_tpu.models.gom import GoMConfig, GoMStatics, gom_forward
from gomavatar_tpu.losses import compute_loss, unpack
from gomavatar_tpu.parallel.mesh import DATA_AXIS, SCENE_AXIS

_BATCH_KEYS = (
    "K", "E", "cnl_gtfms", "dst_Rs", "dst_Ts", "dst_posevec",
    "bgcolor", "target_rgbs", "target_masks",
)


def stack_batches(items: list[dict]) -> dict:
    """Collate numpy items -> one stacked pytree (leading axis = frames)."""
    return {
        k: jnp.asarray(np.stack([np.asarray(it[k]) for it in items]))
        for k in _BATCH_KEYS
        if k in items[0]
    }


def make_data_parallel_train_step(
    mesh: Mesh,
    gom_cfg: GoMConfig,
    loss_cfg: dict,
    tx: optax.GradientTransformation,
):
    """Jitted DP train step: batch leading axis sharded over ``data``,
    params/opt_state replicated, gradients psum-averaged over ICI."""

    def per_device(params, opt_state, statics, lpips_params, batch, i_iter):
        # shard_map gives this device a leading axis of size B/n -> one frame
        local = jax.tree_util.tree_map(lambda x: x[0], batch)

        def loss_fn(p):
            rgb, mask, aux = gom_forward(
                p, statics, gom_cfg,
                local["K"], local["E"], local["cnl_gtfms"],
                local["dst_Rs"], local["dst_Ts"],
                dst_posevec=local["dst_posevec"],
                i_iter=i_iter, train=True,
            )
            rgb_u = unpack(rgb, mask, local["bgcolor"])
            total, losses = compute_loss(
                rgb_u, mask, aux,
                local["target_rgbs"], local["target_masks"],
                statics, loss_cfg, lpips_params=lpips_params,
            )
            return total, losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # average over the data axis — the one collective of the step
        grads = jax.lax.pmean(grads, DATA_AXIS)
        total = jax.lax.pmean(total, DATA_AXIS)
        losses = jax.lax.pmean(losses, DATA_AXIS)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, total, losses

    sharded = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(DATA_AXIS), P()),
        out_specs=(P(), P(), P(), P()),
        check_rep=False,
    )
    return jax.jit(sharded)


def make_multi_scene_render(mesh: Mesh, gom_cfg: GoMConfig, train: bool = False):
    """Jitted multi-scene forward: scene-stacked params/statics/batches
    sharded over devices; returns stacked (rgb, mask)."""

    def per_device(params_s, statics_s, batch_s, i_iter):
        params = jax.tree_util.tree_map(lambda x: x[0], params_s)
        statics = jax.tree_util.tree_map(lambda x: x[0], statics_s)
        local = jax.tree_util.tree_map(lambda x: x[0], batch_s)
        rgb, mask, _ = gom_forward(
            params, statics, gom_cfg,
            local["K"], local["E"], local["cnl_gtfms"],
            local["dst_Rs"], local["dst_Ts"],
            dst_posevec=local.get("dst_posevec"),
            i_iter=i_iter, train=train,
        )
        return rgb[None], mask[None]

    sharded = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(SCENE_AXIS), P(SCENE_AXIS), P(SCENE_AXIS), P()),
        out_specs=(P(SCENE_AXIS), P(SCENE_AXIS)),
        check_rep=False,
    )
    return jax.jit(sharded)
