"""Training engine: jitted train step, phase management, checkpointing.

TPU-native equivalent of the reference's training loop (train.py:309-386).
One ``TrainState`` per *phase* (mesh resolution); the entire step — forward,
all losses, backward, Adam — is ONE jitted XLA program with ``i_iter``
traced (SURVEY.md §7 north star).  Subdivision milestones
(cfg.model.subdivide_iters) trigger a host-side phase change: subdivide the
state, rebuild the optimizer, re-jit (mirroring train.py:341-346).
"""

from __future__ import annotations

import functools
import logging
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import optax

from gomavatar_tpu.models.gom import (
    GoMConfig,
    GoMStatics,
    init_gom,
    gom_forward,
    subdivide_gom,
)
from gomavatar_tpu.losses import compute_loss, unpack
from gomavatar_tpu.optim import make_optimizer, fast_forward_schedule
from gomavatar_tpu import checkpoint as ckpt_lib

log = logging.getLogger(__name__)

# fail hard on any binning-budget overflow (device sync per step; debug only)
import os as _os

_DEBUG_BINNING = bool(int(_os.environ.get("GOMAVATAR_DEBUG_BINNING", "0")))


def make_train_step(gom_cfg: GoMConfig, loss_cfg: dict, tx: optax.GradientTransformation):
    """Build the jitted train step for one phase."""

    @jax.jit
    def step(params, opt_state, statics: GoMStatics, lpips_params, batch: dict, i_iter):
        def loss_fn(p):
            rgb, mask, aux = gom_forward(
                p,
                statics,
                gom_cfg,
                batch["K"],
                batch["E"],
                batch["cnl_gtfms"],
                batch["dst_Rs"],
                batch["dst_Ts"],
                dst_posevec=batch["dst_posevec"],
                i_iter=i_iter,
                train=True,
            )
            rgb_u = unpack(rgb, mask, batch["bgcolor"])
            total, losses = compute_loss(
                rgb_u,
                mask,
                aux,
                batch["target_rgbs"],
                batch["target_masks"],
                statics,
                loss_cfg,
                lpips_params=lpips_params,
            )
            # surface binning-overflow telemetry next to the losses (ends up
            # in the train log / TB; nonzero = renders silently degraded)
            tel = aux.get("binning")
            if tel is not None:
                from gomavatar_tpu.ops.splat.binning import CHUNK
                from gomavatar_tpu.ops.splat.pallas_kernel import NCMAX

                losses = dict(losses)
                losses["bin_drop_budget"] = tel.dropped_budget
                losses["bin_drop_buffer"] = tel.dropped_buffer
                # entries beyond the per-tile chunk cap of the train kernels:
                # the forward truncates them (content loss), so surface it
                losses["bin_drop_ncmax"] = jnp.maximum(
                    tel.max_tile_entries - NCMAX * CHUNK, 0
                )
            return total, losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, total, losses

    return step


class Trainer:
    """Owns params/statics/optimizer across subdivision phases.

    ``data_parallel > 1`` trains on that many frames per optimizer step,
    sharded over a device mesh with gradient psum (a capability the
    reference lacks — SURVEY.md §2.F); ``step`` then expects a LIST of
    ``data_parallel`` batch dicts."""

    def __init__(
        self, cfg, canonical_info: dict, lpips_params=None, seed: int = 0,
        data_parallel: int = 1, lpips_calibrated: bool = False,
    ):
        self.cfg = cfg
        self.loss_cfg = cfg["train"]["losses"]
        self.lpips_params = lpips_params
        self.lpips_calibrated = lpips_calibrated
        self.subdivide_iters = sorted(cfg["model"].get("subdivide_iters", []))
        self.phase = 0
        self.data_parallel = int(data_parallel)

        key = jax.random.PRNGKey(seed)
        self.params, self.statics, self.gom_cfg = init_gom(key, cfg["model"], canonical_info)
        self.i_iter = 0
        self._rebuild_optimizer()

    # -- phase management ----------------------------------------------------

    def _rebuild_optimizer(self):
        self.tx = make_optimizer(self.cfg["train"], self.params)
        self.opt_state = self.tx.init(self.params)
        if self.i_iter:
            # keep lr decay continuous across the phase change (the reference
            # recomputes lr from the global iteration, train.py:166-175)
            self.opt_state = fast_forward_schedule(self.opt_state, self.i_iter)
        if self.data_parallel > 1:
            from gomavatar_tpu.parallel import make_mesh, make_data_parallel_train_step

            assert len(jax.devices()) >= self.data_parallel, (
                f"data_parallel={self.data_parallel} needs that many devices"
            )
            mesh = make_mesh(self.data_parallel)
            self._step_fn = make_data_parallel_train_step(
                mesh, self.gom_cfg, self.loss_cfg, self.tx
            )
        else:
            self._step_fn = make_train_step(self.gom_cfg, self.loss_cfg, self.tx)

    def _subdivide(self):
        log.info(
            "subdividing at iter %d: %d -> %d faces",
            self.i_iter,
            self.gom_cfg.num_faces,
            self.gom_cfg.num_faces * 4,
        )
        self.params, self.statics, self.gom_cfg = subdivide_gom(
            self.params, self.statics, self.gom_cfg
        )
        self.phase += 1
        self._rebuild_optimizer()

    def maybe_subdivide(self) -> bool:
        """Subdivide when crossing a milestone (reference triggers at
        iter == milestone inside the loop, train.py:341-346)."""
        if self.phase < len(self.subdivide_iters) and self.i_iter >= self.subdivide_iters[self.phase]:
            self._subdivide()
            return True
        return False

    # -- stepping ------------------------------------------------------------

    def step(self, batch):
        """One optimizer step.  ``batch``: a dict (data_parallel == 1) or a
        list of ``data_parallel`` dicts (sharded over the mesh)."""
        self.maybe_subdivide()
        if self.data_parallel > 1:
            from gomavatar_tpu.parallel import stack_batches

            assert isinstance(batch, (list, tuple)) and len(batch) == self.data_parallel
            batch = stack_batches(list(batch))
        self.params, self.opt_state, total, losses = self._step_fn(
            self.params,
            self.opt_state,
            self.statics,
            self.lpips_params,
            batch,
            jnp.asarray(self.i_iter, jnp.float32),
        )
        if _DEBUG_BINNING:
            dropped = (
                int(losses.get("bin_drop_budget", 0))
                + int(losses.get("bin_drop_buffer", 0))
                + int(losses.get("bin_drop_ncmax", 0))
            )
            assert dropped == 0, (
                f"binning dropped {dropped} entries at iter {self.i_iter} — "
                f"raise max_tiles_per_gaussian / buffer_factor / kernel NCMAX "
                f"(GOMAVATAR_DEBUG_BINNING=1 makes this fatal)"
            )
        self.i_iter += 1
        return total, losses

    def forward(self, batch: dict, train: bool = False):
        return gom_forward(
            self.params,
            self.statics,
            self.gom_cfg,
            batch["K"],
            batch["E"],
            batch["cnl_gtfms"],
            batch["dst_Rs"],
            batch["dst_Ts"],
            dst_posevec=batch.get("dst_posevec"),
            i_iter=jnp.asarray(self.i_iter, jnp.float32),
            global_R=batch.get("global_R"),
            global_T=batch.get("global_T"),
            train=train,
        )

    # -- checkpointing -------------------------------------------------------

    def save(self, ckpt_dir: str):
        ckpt_lib.save_checkpoint(ckpt_dir, self.i_iter, self.params, self.opt_state, self.phase)

    def resume(self, ckpt_dir: str) -> bool:
        """Find the latest checkpoint, replay subdivisions to its phase
        (shapes change across phases, cf. train.py:271-279), restore."""
        latest = ckpt_lib.latest_checkpoint(ckpt_dir)
        if latest is None:
            return False
        path, it = latest
        phase = ckpt_lib.read_phase(path)
        while self.phase < phase:
            self._subdivide()
        params, opt_state, it, _ = ckpt_lib.restore_checkpoint(path, self.params, self.opt_state)
        self.params, self.opt_state, self.i_iter = params, opt_state, it
        log.info("resumed from %s (iter %d, phase %d)", path, it, phase)
        return True

    def load_for_eval(self, ckpt_dir: str, it: int | None = None) -> int:
        """Eval-time load (eval.py:302-316): replay subdivisions, then load
        params only."""
        latest = ckpt_lib.latest_checkpoint(ckpt_dir)
        if latest is None:
            raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
        path, found_it = latest
        if it is not None:
            import os

            path = os.path.join(ckpt_dir, f"iter_{it}")
            found_it = it
        phase = ckpt_lib.read_phase(path)
        while self.phase < phase:
            self._subdivide()
        params, opt_state, found_it, _ = ckpt_lib.restore_checkpoint(path, self.params, self.opt_state)
        self.params = params
        self.i_iter = found_it
        return found_it
