"""Checkpoint / resume via orbax.

TPU-native equivalent of the reference's torch.save/load checkpointing
(train.py:269-295, 370-377): saves {iter, params, opt_state, phase} where
``phase`` counts completed subdivisions — the shape-changing milestone that
the reference replays before loading (train.py:271-279).  We persist the
phase index in the checkpoint so restore knows how many times to subdivide
a freshly-initialized model before loading arrays.
"""

from __future__ import annotations

import os
import re

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, it: int, params, opt_state, phase: int) -> None:
    path = os.path.abspath(os.path.join(ckpt_dir, f"iter_{it}"))
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": params,
        "opt_state": opt_state,
        "meta": {"iter": np.asarray(it), "phase": np.asarray(phase)},
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def latest_checkpoint(ckpt_dir: str) -> tuple[str, int] | None:
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"iter_(\d+)", name)
        if m:
            it = int(m.group(1))
            if best is None or it > best[1]:
                best = (os.path.join(ckpt_dir, name), it)
    return best


def read_phase(path: str) -> int:
    """Read only the phase counter (cheap metadata restore)."""
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(os.path.abspath(path))
    return int(np.asarray(payload["meta"]["phase"]))


def restore_checkpoint(path: str, params_like, opt_state_like):
    """Restore arrays into templates with matching structure/shapes (the
    caller must already have replayed subdivisions to the stored phase)."""
    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": params_like,
        "opt_state": opt_state_like,
        "meta": {"iter": np.asarray(0), "phase": np.asarray(0)},
    }
    payload = ckptr.restore(os.path.abspath(path), template)
    return (
        payload["params"],
        payload["opt_state"],
        int(np.asarray(payload["meta"]["iter"])),
        int(np.asarray(payload["meta"]["phase"])),
    )
