"""Positional encodings: standard NeRF-style and Hann-annealed coarse-to-fine.

TPU-native equivalents of the reference's two Embedder variants:
  * annealed (HumanNeRF-style) for the non-rigid MLP
    (models/modules/non_rigid_module.py:15-72) — frequency bands windowed by
    a Hann ramp driven by the training iteration, so the MLP sees coarse
    frequencies first;
  * standard with include_input for the shadow MLP
    (models/modules/shadow_module.py:16-64).

Both take ``i_iter`` (where relevant) as a *traced* scalar so a single
compiled program serves the whole training run (SURVEY.md §7).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def embed_dim(multires: int, include_input: bool, d: int = 3) -> int:
    return (d if include_input else 0) + 2 * multires * d


def positional_encoding(x: jax.Array, multires: int, include_input: bool = True) -> jax.Array:
    """Standard log-spaced encoding: [x?, sin(2^k x), cos(2^k x)]_k.

    Band order matches the reference's Embedder (per-frequency, sin then
    cos), so converted checkpoints line up."""
    freqs = 2.0 ** jnp.arange(multires, dtype=x.dtype)
    parts = [x] if include_input else []
    for k in range(multires):
        parts.append(jnp.sin(x * freqs[k]))
        parts.append(jnp.cos(x * freqs[k]))
    return jnp.concatenate(parts, axis=-1)


def hann_window_weights(
    multires: int, i_iter: jax.Array, kick_in_iter: float, full_band_iter: float
) -> jax.Array:
    """Per-frequency Hann ramp (non_rigid_module.py:33-43): band j fades in
    as alpha = multires * (i - kick_in) / (full_band - kick_in) passes j."""
    t = jnp.maximum(jnp.asarray(i_iter, jnp.float32) - kick_in_iter, 0.0)
    alpha = multires * t / (full_band_iter - kick_in_iter)
    j = jnp.arange(multires, dtype=jnp.float32)
    return (1.0 - jnp.cos(np.pi * jnp.clip(alpha - j, 0.0, 1.0))) / 2.0


def annealed_positional_encoding(
    x: jax.Array,
    multires: int,
    i_iter: jax.Array,
    kick_in_iter: float = 0.0,
    full_band_iter: float = 50000.0,
) -> jax.Array:
    """Hann-annealed encoding (no include_input), matching
    non_rigid_module.py:41-46: weight w_j * [sin, cos](2^j x)."""
    w = hann_window_weights(multires, i_iter, kick_in_iter, full_band_iter)
    freqs = 2.0 ** jnp.arange(multires, dtype=x.dtype)
    parts = []
    for k in range(multires):
        parts.append(w[k] * jnp.sin(x * freqs[k]))
        parts.append(w[k] * jnp.cos(x * freqs[k]))
    return jnp.concatenate(parts, axis=-1)
