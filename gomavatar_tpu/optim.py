"""Optimizer: Adam with per-module learning-rate groups and the reference's
exponential decay schedule.

The reference builds Adam param groups with per-module base lrs
(models/model.py:305-324) and rescales every group each step by
0.1^(iter / lr_decay_steps) (train.py:166-175).  Here that is one optax
chain: scale_by_adam -> per-leaf base-lr scaling (mapped by group label) ->
global decay schedule.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax


# param-key -> lr-group name (the reference's names, train config cfg.train.lr)
_GROUP_OF_KEY = {
    "vertices": "canonical_geometry_xyz",
    "so3": "canonical_geometry",
    "scale": "canonical_geometry",
    "appearance": "appearance",
    "lbs_logits": "lbs_weights",
    "pose_refinement": "pose_refinement",
    "non_rigid": "non_rigid",
    "shadow": "shadow",
}


def label_params(params: dict) -> dict:
    """Pytree of group labels matching the params structure."""

    def label_subtree(key, subtree):
        group = _GROUP_OF_KEY[key]
        return jax.tree_util.tree_map(lambda _: group, subtree)

    return {k: label_subtree(k, v) for k, v in params.items()}


def make_optimizer(train_cfg: dict, params: dict) -> optax.GradientTransformation:
    """Adam(b1=0.9, b2=0.999, eps=1e-8 — torch defaults) with per-group lr
    and exponential decay 0.1^(t / lr_decay_steps)."""
    lrs = train_cfg["lr"]
    decay_steps = float(train_cfg["lr_decay_steps"])
    use_decay = bool(train_cfg.get("lr_update_exp", True))

    transforms = {
        group: optax.scale(-float(lrs[group]))
        for group in set(_GROUP_OF_KEY.values())
        if group in lrs
    }
    chain = [
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.multi_transform(transforms, label_params(params)),
    ]
    if use_decay:
        chain.append(
            optax.scale_by_schedule(lambda t: 0.1 ** (t / decay_steps))
        )
    return optax.chain(*chain)


def fast_forward_schedule(opt_state, step: int):
    """Set every ScaleByScheduleState count in ``opt_state`` to ``step``.

    The reference recomputes lr from the GLOBAL iteration every step
    (train.py:166-175,348), so when it rebuilds Adam at a subdivision
    milestone (train.py:341-346) the decay is continuous.  Our optimizer is
    rebuilt too (shapes change), which would re-init the schedule count to 0
    and jump the effective lr back up; this fast-forward restores parity.
    Adam's own bias-correction count is intentionally NOT touched — the
    reference's fresh ``torch.optim.Adam`` restarts moments/bias correction.
    """

    def fix(s):
        if isinstance(s, optax.ScaleByScheduleState):
            return optax.ScaleByScheduleState(count=jnp.asarray(step, jnp.int32))
        if isinstance(s, tuple) and not hasattr(s, "_fields"):
            return tuple(fix(x) for x in s)
        return s

    return fix(opt_state)
