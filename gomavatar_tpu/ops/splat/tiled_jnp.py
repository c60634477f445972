"""Tiled splat compositing in pure jnp (differentiable; CPU/TPU portable).

Same tile/chunk structure and identical math as the Pallas kernel
(pallas_kernel.py) but expressed as a vmap-over-tiles of a scan-over-chunks,
so JAX autodiff provides gradients.  Used as the CPU fallback, as the
autodiff oracle for the Pallas custom VJP, and for interpret-mode tests.

Compositing identity (the TPU-native reformulation of the CUDA sequential
blend): with per-entry alpha a_i and exclusive transmittance
T_i = exp(sum_{j<i} log(1-a_j)), the blend weights are w_i = T_i * a_i and
the tile color is the matmul w^T @ colors — cumsum + MXU instead of a
sequential per-splat loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gomavatar_tpu.ops.splat.binning import TileBinning, TILE, CHUNK
from gomavatar_tpu.ops.splat.reference import ALPHA_MAX, ALPHA_MIN, T_EPS


def _chunk_alpha(mean2d, conic, opacity, px, py):
    """alpha for a chunk of entries at a tile of pixels: (CHUNK, P)."""
    dx = px[None, :] - mean2d[:, 0:1]
    dy = py[None, :] - mean2d[:, 1:2]
    power = (
        -0.5 * (conic[:, 0:1] * dx * dx + conic[:, 2:3] * dy * dy)
        - conic[:, 1:2] * dx * dy
    )
    alpha = jnp.minimum(ALPHA_MAX, opacity[:, None] * jnp.exp(power))
    alpha = jnp.where(power > 0.0, 0.0, alpha)
    alpha = jnp.where(alpha < ALPHA_MIN, 0.0, alpha)
    return alpha


def composite_tiles_jnp(
    entry_mean2d: jax.Array,  # (Dp, 2)
    entry_conic: jax.Array,  # (Dp, 3)
    entry_color: jax.Array,  # (Dp, C)
    entry_opacity: jax.Array,  # (Dp,) — already multiplied by entry_valid
    tile_start: jax.Array,  # (T,)
    tile_count: jax.Array,  # (T,)
    num_tiles_x: int,
    num_tiles_y: int,
    max_chunks: int = 64,
):
    """Composite all tiles; returns (img (H, W, C), alpha (H, W))."""
    C = entry_color.shape[-1]
    P = TILE * TILE
    Dp = entry_mean2d.shape[0]

    xs = jnp.arange(TILE, dtype=jnp.float32)
    pix_dx = jnp.tile(xs, TILE)  # within-tile x, flattened row-major
    pix_dy = jnp.repeat(xs, TILE)

    def one_tile(t, start, count):
        tx = (t % num_tiles_x).astype(jnp.float32)
        ty = (t // num_tiles_x).astype(jnp.float32)
        px = tx * TILE + pix_dx
        py = ty * TILE + pix_dy

        def step(carry, k):
            log_T, color_acc, alpha_acc = carry
            offs = jnp.minimum(start + k * CHUNK, Dp - CHUNK)
            in_range = (k * CHUNK < count).astype(jnp.float32)
            m2 = jax.lax.dynamic_slice_in_dim(entry_mean2d, offs, CHUNK, axis=0)
            cn = jax.lax.dynamic_slice_in_dim(entry_conic, offs, CHUNK, axis=0)
            cl = jax.lax.dynamic_slice_in_dim(entry_color, offs, CHUNK, axis=0)
            op = jax.lax.dynamic_slice_in_dim(entry_opacity, offs, CHUNK, axis=0)
            alpha = _chunk_alpha(m2, cn, op * in_range, px, py)  # (CHUNK, P)
            log1m = jnp.log1p(-alpha)
            cum = jnp.cumsum(log1m, axis=0) + log_T[None, :]
            T_incl = jnp.exp(cum)
            T_excl = jnp.exp(cum - log1m)
            w = jnp.where(T_incl < T_EPS, 0.0, T_excl * alpha)  # (CHUNK, P)
            color_acc = color_acc + jnp.dot(
                cl.T, w, preferred_element_type=jnp.float32, precision="highest"
            )  # (C, P)
            alpha_acc = alpha_acc + jnp.sum(w, axis=0)
            log_T = cum[-1]
            return (log_T, color_acc, alpha_acc), None

        init = (
            jnp.zeros((P,), jnp.float32),
            jnp.zeros((C, P), jnp.float32),
            jnp.zeros((P,), jnp.float32),
        )
        (log_T, color_acc, alpha_acc), _ = jax.lax.scan(
            step, init, jnp.arange(max_chunks, dtype=jnp.int32)
        )
        return color_acc, alpha_acc

    T = tile_start.shape[0]
    color_t, alpha_t = jax.vmap(one_tile)(
        jnp.arange(T, dtype=jnp.int32), tile_start, tile_count
    )  # (T, C, P), (T, P)

    H = num_tiles_y * TILE
    W = num_tiles_x * TILE
    img = (
        color_t.reshape(num_tiles_y, num_tiles_x, C, TILE, TILE)
        .transpose(0, 3, 1, 4, 2)
        .reshape(H, W, C)
    )
    alpha = (
        alpha_t.reshape(num_tiles_y, num_tiles_x, TILE, TILE)
        .transpose(0, 2, 1, 3)
        .reshape(H, W)
    )
    return img, alpha
