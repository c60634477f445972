"""Pallas TPU kernel for tiled splat compositing (forward + analytic VJP).

This is the TPU-native core of the framework — the replacement for the
reference's CUDA ``diff_gaussian_rasterization`` forward/backward
(SURVEY.md §2.H.1).  Same math as tiled_jnp.py; tested against it and the
brute-force oracle.

Layout strategy:
  * per-entry quantities are packed channel-major ``[NCH, Dp]`` in HBM so a
    compositing chunk is one lane-aligned ``[NCH, 128]`` DMA (tile segments
    are 128-aligned by construction, see binning.py);
  * alpha matrices live as ``[256 pixels (sublanes), 128 entries (lanes)]``
    — the front-to-back transmittance is a log-space cumulative sum along
    lanes, and the color accumulation is an MXU ``dot_general`` contracting
    the entry axis: colors [C,128] x weights [256,128] -> [C,256];
  * the backward runs two in-kernel sweeps (recompute-forward + gradient)
    instead of storing per-entry residuals — O(tile) VMEM, no HBM residuals.

Entry channels (NCH = 6 + C):
  0: mean_x, 1: mean_y, 2: conic_a, 3: conic_b, 4: conic_c,
  5: opacity, 6..6+C: colors.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gomavatar_tpu.ops.splat.binning import TILE, CHUNK, written_slot_mask
from gomavatar_tpu.ops.splat.reference import ALPHA_MAX, ALPHA_MIN, T_EPS

P = TILE * TILE  # pixels per tile
_NEG_INF = -1e30
NCMAX = 64  # max chunks a tile program ingests (fwd truncates, bwd writes)


def _pixel_coords(t, num_tiles_x):
    """Within-image pixel coordinates of this tile, shape (P, 1) each."""
    tx = (t % num_tiles_x).astype(jnp.float32)
    ty = (t // num_tiles_x).astype(jnp.float32)
    lin = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = tx * TILE + (lin % TILE).astype(jnp.float32)
    py = ty * TILE + (lin // TILE).astype(jnp.float32)
    return px, py


def _chunk_terms(chunk, px, py, C):
    """Shared forward math for one chunk.

    chunk: (NCH, CHUNK) VMEM block.  Returns (alpha, gate, G, dx, dy, rows)
    where alpha is the post-gate alpha (P, CHUNK) and ``rows`` unpacks the
    per-entry channels as (1, CHUNK) arrays.
    """
    mx = chunk[0:1, :]  # (1, CHUNK)
    my = chunk[1:2, :]
    ca = chunk[2:3, :]
    cb = chunk[3:4, :]
    cc = chunk[4:5, :]
    op = chunk[5:6, :]
    dx = px - mx  # (P, CHUNK)
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    G = jnp.exp(power)
    raw = op * G
    gate = (power <= 0.0) & (raw >= ALPHA_MIN) & (raw <= ALPHA_MAX)
    alpha = jnp.where(power > 0.0, 0.0, jnp.minimum(raw, ALPHA_MAX))
    alpha = jnp.where(alpha < ALPHA_MIN, 0.0, alpha)
    return alpha, gate, G, dx, dy, (ca, cb, cc, op)


def _dot_split3(x, m, dims, terms: int = 3):
    """x @ m with x split into ``terms`` exact bf16 terms (x == sum(x_i) to
    2^-8/2^-16/2^-24 for 1/2/3 terms) and DEFAULT-precision bf16 matmuls.
    Requires ``m`` EXACT in bf16 (0/1 masks, the triangular cumsum matrix).
    3 terms is ~HIGHEST at half its MXU passes; Mosaic lowers neither
    Precision.HIGH nor f32 single-pass."""
    mb = m.astype(jnp.bfloat16)

    def mm(a):
        return jax.lax.dot_general(
            a, mb, dimension_numbers=dims, preferred_element_type=jnp.float32
        )

    x1 = x.astype(jnp.bfloat16)
    out = mm(x1)
    if terms >= 2:
        r1 = x - x1.astype(jnp.float32)
        x2 = r1.astype(jnp.bfloat16)
        out = out + mm(x2)
        if terms >= 3:
            x3 = (r1 - x2.astype(jnp.float32)).astype(jnp.bfloat16)
            out = out + mm(x3)
    return out


def _lane_cumsum(x, fast: bool = False):
    """Inclusive prefix sum along the lane (last) axis as one MXU matmul:
    cum[p, j] = sum_i x[p, i] * [i <= j].  Pallas TPU has no cumsum
    primitive; a [256,128]x[128,128] triangular matmul is ~free on the MXU.
    ``fast`` uses the 3-term bf16 split (~2^-24 relative, half the MXU
    passes of HIGHEST).  Both the forward-only fused kernel AND the
    custom-VJP train kernels run fast=True (+ _dot_mixed, ~2^-16 relative):
    train gradients are accurate to ~1e-4 relative, asserted against the
    jnp reference by check_grads in tests/test_splat.py — bit-stability vs
    HIGHEST is NOT part of the contract."""
    n = x.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    tri = (row <= col).astype(x.dtype)
    dims = (((1,), (0,)), ((), ()))
    if fast:
        return _dot_split3(x, tri, dims, terms=3 if fast is True else int(fast))
    return jax.lax.dot_general(
        x,
        tri,
        dimension_numbers=dims,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _dot_mixed(a, b, dims):
    """a @ b, both f32, via a 2x2 bf16 split keeping the three leading
    product terms (~2^-16 relative).  DEFAULT-precision passes only —
    Mosaic lowers neither Precision.HIGH nor single-pass f32 dots, and
    HIGHEST is a 12-pass decomposition."""
    a1 = a.astype(jnp.bfloat16)
    a2 = (a - a1.astype(jnp.float32)).astype(jnp.bfloat16)
    b1 = b.astype(jnp.bfloat16)
    b2 = (b - b1.astype(jnp.float32)).astype(jnp.bfloat16)

    def mm(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=dims, preferred_element_type=jnp.float32
        )

    return mm(a1, b1) + mm(a2, b1) + mm(a1, b2)


def _transmittance(alpha, log_T, fast: bool = False):
    """Cumulative transmittance along the entry (lane) axis.

    Returns (w, log1m, cum): blend weights with the CUDA termination gate,
    per-entry log(1-alpha), and the full inclusive log-transmittance
    (P, CHUNK) — callers carry ``cum[:, -1:]`` to the next chunk.
    """
    log1m = jnp.log1p(-alpha)
    cum = _lane_cumsum(log1m, fast) + log_T
    T_incl = jnp.exp(cum)
    T_excl = jnp.exp(cum - log1m)
    w = jnp.where(T_incl < T_EPS, 0.0, T_excl * alpha)
    return w, log1m, cum


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(
    # scalar prefetch: (start, count) over tiles, or (active_id, start,
    # count) over compacted slots (compact=True)
    *refs,
    C: int,
    num_tiles_x: int,
    ncmax: int,
    compact: bool = False,
):
    if compact:
        aid_ref, start_ref, count_ref, entries_hbm, color_out, alpha_out, chunk_vmem, sem = refs
        s = pl.program_id(0)
        t = aid_ref[s]
    else:
        start_ref, count_ref, entries_hbm, color_out, alpha_out, chunk_vmem, sem = refs
        s = t = pl.program_id(0)
    start = start_ref[s]
    nchunks = jnp.minimum(count_ref[s] // CHUNK, ncmax)
    px, py = _pixel_coords(t, num_tiles_x)

    def get_dma(slot, k):
        return pltpu.make_async_copy(
            entries_hbm.at[:, pl.ds(pl.multiple_of(start + k * CHUNK, CHUNK), CHUNK)],
            chunk_vmem.at[slot],
            sem.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    def body(carry):
        k, log_T, color_acc, alpha_acc = carry

        @pl.when(k + 1 < nchunks)
        def _():
            get_dma((k + 1) % 2, k + 1).start()

        get_dma(k % 2, k).wait()
        chunk = chunk_vmem[k % 2]

        alpha, _, _, _, _, _ = _chunk_terms(chunk, px, py, C)
        w, _, cum = _transmittance(alpha, log_T, fast=True)
        log_T = cum[:, CHUNK - 1 : CHUNK]
        colors_c = chunk[6 : 6 + C, :]  # (C, CHUNK)
        color_acc = color_acc + _dot_mixed(
            colors_c, w, (((1,), (1,)), ((), ()))
        )  # (C, P)
        alpha_acc = alpha_acc + jnp.sum(w, axis=1, keepdims=True)
        return k + 1, log_T, color_acc, alpha_acc

    def cond(carry):
        k, log_T, _, _ = carry
        return jnp.logical_and(k < nchunks, jnp.max(log_T) > jnp.log(T_EPS))

    init = (
        jnp.int32(0),
        jnp.zeros((P, 1), jnp.float32),
        jnp.zeros((C, P), jnp.float32),
        jnp.zeros((P, 1), jnp.float32),
    )
    k_final, _, color_acc, alpha_acc = jax.lax.while_loop(cond, body, init)

    # On early exit one prefetched DMA may still be in flight — consume it so
    # the semaphore is clean for the next tile program.
    @pl.when(k_final < nchunks)
    def _():
        get_dma(k_final % 2, k_final).wait()

    color_out[0] = color_acc
    alpha_out[0] = alpha_acc.reshape(1, P)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(
    # scalar prefetch ((start, count) or (active_id, start, count)), then:
    # inputs   entries_hbm, g_color_in (1, C, P) block, g_alpha_in (1, 1, P)
    # outputs  d_entries_hbm (NCH, Dp) in HBM, written per-segment
    # scratch  chunk_vmem (2, NCH, CHUNK), dchunk_vmem (NCH, CHUNK),
    #          carries_vmem (NCMAX, P) entering log_T per chunk, sem, dsem
    *refs,
    C: int,
    num_tiles_x: int,
    ncmax: int,
    compact: bool = False,
):
    if compact:
        (aid_ref, start_ref, count_ref, entries_hbm, g_color_in, g_alpha_in,
         d_entries_hbm, chunk_vmem, dchunk_vmem, carries_vmem, sem, dsem) = refs
        s = pl.program_id(0)
        t = aid_ref[s]
    else:
        (start_ref, count_ref, entries_hbm, g_color_in, g_alpha_in,
         d_entries_hbm, chunk_vmem, dchunk_vmem, carries_vmem, sem, dsem) = refs
        s = t = pl.program_id(0)
    start = start_ref[s]
    nchunks = jnp.minimum(count_ref[s] // CHUNK, ncmax)
    px, py = _pixel_coords(t, num_tiles_x)
    g_img = g_color_in[0]  # (C, P)
    g_alpha = g_alpha_in[0].reshape(P, 1)

    def get_dma(slot, k):
        return pltpu.make_async_copy(
            entries_hbm.at[:, pl.ds(pl.multiple_of(start + k * CHUNK, CHUNK), CHUNK)],
            chunk_vmem.at[slot],
            sem.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    # ---- pass A: recompute forward; store per-chunk entering log_T and the
    # total sum of u*w (u = dL/dw) needed for the suffix term.
    def body_a(k, carry):
        log_T, total_uw = carry

        @pl.when(k + 1 < nchunks)
        def _():
            get_dma((k + 1) % 2, k + 1).start()

        get_dma(k % 2, k).wait()
        chunk = chunk_vmem[k % 2]
        carries_vmem[k] = log_T.reshape(P)

        alpha, _, _, _, _, _ = _chunk_terms(chunk, px, py, C)
        w, _, cum = _transmittance(alpha, log_T, fast=True)
        log_T = cum[:, CHUNK - 1 : CHUNK]
        colors_c = chunk[6 : 6 + C, :]
        # u[p, e] = sum_c g_img[c, p] * color[c, e] + g_alpha[p]
        u = _dot_mixed(
            g_img, colors_c, (((0,), (0,)), ((), ()))
        ) + g_alpha  # (P, CHUNK)
        total_uw = total_uw + jnp.sum(u * w, axis=1, keepdims=True)
        return log_T, total_uw

    log_T0 = jnp.zeros((P, 1), jnp.float32)
    _, total_uw = jax.lax.fori_loop(
        0, nchunks, body_a, (log_T0, jnp.zeros((P, 1), jnp.float32))
    )

    # ---- pass B: per-entry gradients, front to back.
    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    def body_b(k, prefix_uw):
        @pl.when(k + 1 < nchunks)
        def _():
            get_dma((k + 1) % 2, k + 1).start()

        get_dma(k % 2, k).wait()
        chunk = chunk_vmem[k % 2]
        log_T = carries_vmem[k].reshape(P, 1)

        alpha, gate, G, dx, dy, (ca, cb, cc, op) = _chunk_terms(chunk, px, py, C)
        w, log1m, cum = _transmittance(alpha, log_T, fast=True)
        colors_c = chunk[6 : 6 + C, :]
        u = _dot_mixed(
            g_img, colors_c, (((0,), (0,)), ((), ()))
        ) + g_alpha  # (P, CHUNK)

        uw = u * w
        prefix_incl = _lane_cumsum(uw, fast=True) + prefix_uw  # (P, CHUNK)
        suffix = total_uw - prefix_incl  # sum over later entries
        T_excl = jnp.exp(cum - log1m)
        T_incl = jnp.exp(cum)
        m = jnp.logical_and(T_incl >= T_EPS, alpha > 0.0)
        d_alpha = (
            jnp.where(m, T_excl * u, 0.0) - suffix / (1.0 - alpha)
        )  # (P, CHUNK)
        d_raw = jnp.where(gate, d_alpha, 0.0)
        d_op = jnp.sum(d_raw * G, axis=0, keepdims=True)  # (1, CHUNK)
        d_power = d_raw * op * G
        d_ca = jnp.sum(d_power * (-0.5 * dx * dx), axis=0, keepdims=True)
        d_cb = jnp.sum(d_power * (-dx * dy), axis=0, keepdims=True)
        d_cc = jnp.sum(d_power * (-0.5 * dy * dy), axis=0, keepdims=True)
        d_mx = jnp.sum(d_power * (ca * dx + cb * dy), axis=0, keepdims=True)
        d_my = jnp.sum(d_power * (cc * dy + cb * dx), axis=0, keepdims=True)
        # d_color[c, e] = sum_p g_img[c, p] * w[p, e]
        d_col = _dot_mixed(g_img, w, (((1,), (0,)), ((), ())))  # (C, CHUNK)

        dchunk_vmem[0:1, :] = d_mx
        dchunk_vmem[1:2, :] = d_my
        dchunk_vmem[2:3, :] = d_ca
        dchunk_vmem[3:4, :] = d_cb
        dchunk_vmem[4:5, :] = d_cc
        dchunk_vmem[5:6, :] = d_op
        dchunk_vmem[6 : 6 + C, :] = d_col

        out_dma = pltpu.make_async_copy(
            dchunk_vmem,
            d_entries_hbm.at[:, pl.ds(pl.multiple_of(start + k * CHUNK, CHUNK), CHUNK)],
            dsem,
        )
        out_dma.start()
        out_dma.wait()

        return prefix_incl[:, CHUNK - 1 : CHUNK]

    jax.lax.fori_loop(0, nchunks, body_b, jnp.zeros((P, 1), jnp.float32))


# ---------------------------------------------------------------------------
# host-side wrappers + custom VJP
# ---------------------------------------------------------------------------

def pack_gaussian_channels(mean2d, conic, opacity, colors):
    """Per-gaussian channel matrix (N, NCH_pad), rows padded to a multiple
    of 8 so the per-entry gather + transpose feeds aligned HBM DMAs.

    Channel order must match the kernels: mean(2), conic(3), opacity(1),
    colors(C), zero padding."""
    parts = [mean2d, conic, opacity[:, None], colors]
    nch = 6 + colors.shape[-1]
    nch_pad = -(-nch // 8) * 8
    if nch_pad != nch:
        parts.append(jnp.zeros((mean2d.shape[0], nch_pad - nch), mean2d.dtype))
    return jnp.concatenate(parts, axis=-1)


@functools.partial(
    jax.jit, static_argnames=("C", "num_tiles_x", "num_tiles_y", "ncmax", "active_cap")
)
def _fwd_call(entries, tile_start, tile_count, C, num_tiles_x, num_tiles_y,
              ncmax=NCMAX, active_cap=None):
    NCH, Dp = entries.shape
    T = num_tiles_x * num_tiles_y
    compact = active_cap is not None
    scratch = [
        pltpu.VMEM((2, NCH, CHUNK), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if compact:
        # grid over compacted non-empty tile slots: every empty tile saves
        # its ~1.4-2 us/program pipeline overhead; compact outputs are
        # scattered back with a zeros-extended gather (pos_of_tile)
        from gomavatar_tpu.ops.splat.binning import compact_tiles

        A = active_cap
        aid, st, ct, pos, _, _ = compact_tiles(tile_start, tile_count, A)
        prefetch, grid, args = 3, (A,), (aid, st, ct, entries)
    else:
        A = T
        prefetch, grid, args = 2, (T,), (tile_start, tile_count, entries)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=prefetch,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, C, P), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
    )
    color_t, alpha_t = pl.pallas_call(
        functools.partial(
            _fwd_kernel, C=C, num_tiles_x=num_tiles_x, ncmax=ncmax, compact=compact
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((A, C, P), jnp.float32),
            jax.ShapeDtypeStruct((A, 1, P), jnp.float32),
        ],
    )(*args)
    if compact:
        color_t = jnp.concatenate(
            [color_t, jnp.zeros((1, C, P), color_t.dtype)]
        )[pos]
        alpha_t = jnp.concatenate(
            [alpha_t, jnp.zeros((1, 1, P), alpha_t.dtype)]
        )[pos]
    return color_t, alpha_t


@functools.partial(
    jax.jit, static_argnames=("C", "num_tiles_x", "num_tiles_y", "ncmax", "active_cap")
)
def _bwd_call(entries, tile_start, tile_count, g_color_t, g_alpha_t, C,
              num_tiles_x, num_tiles_y, ncmax=NCMAX, active_cap=None):
    NCH, Dp = entries.shape
    T = num_tiles_x * num_tiles_y
    compact = active_cap is not None
    if compact:
        # grid over compacted slots; g blocks are read straight out of the
        # full (T, ...) tensors through the scalar-prefetched active_id
        # index map (no pre-gather)
        from gomavatar_tpu.ops.splat.binning import compact_tiles

        aid, st, ct, _, _, _ = compact_tiles(tile_start, tile_count, active_cap)
        prefetch, grid = 3, (active_cap,)
        args = (aid, st, ct, entries, g_color_t, g_alpha_t)
        g_index = lambda s, aid_ref, *_: (aid_ref[s], 0, 0)
    else:
        prefetch, grid = 2, (T,)
        args = (tile_start, tile_count, entries, g_color_t, g_alpha_t)
        g_index = lambda t, *_: (t, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=prefetch,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, C, P), g_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), g_index, memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, NCH, CHUNK), jnp.float32),
            pltpu.VMEM((NCH, CHUNK), jnp.float32),
            pltpu.VMEM((ncmax, P), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    d_entries = pl.pallas_call(
        functools.partial(
            _bwd_kernel, C=C, num_tiles_x=num_tiles_x, ncmax=ncmax, compact=compact
        ),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((NCH, Dp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(*args)[0]
    return d_entries


def _untile(color_t, alpha_t, num_tiles_x, num_tiles_y, C):
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


def _retile(g_img, g_alpha, num_tiles_x, num_tiles_y, C):
    g_color_t = (
        g_img.reshape(num_tiles_y, TILE, num_tiles_x, TILE, C)
        .transpose(0, 2, 4, 1, 3)
        .reshape(num_tiles_y * num_tiles_x, C, P)
    )
    g_alpha_t = (
        g_alpha.reshape(num_tiles_y, TILE, num_tiles_x, TILE)
        .transpose(0, 2, 1, 3)
        .reshape(num_tiles_y * num_tiles_x, 1, P)
    )
    return g_color_t, g_alpha_t


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def composite_tiles_pallas(
    entries,
    entry_valid,
    tile_start,
    tile_count,
    C: int,
    num_tiles_x: int,
    num_tiles_y: int,
    active_cap: int | None = None,
):
    """Composite all tiles on TPU; returns (img (H, W, C), alpha (H, W)).

    ``entries``: (NCH_pad, Dp) channel-major per-entry matrix (see
    :func:`pack_gaussian_channels`); the opacity row must already be zeroed
    on padding entries.  ``entry_valid`` masks gradients of buffer regions
    no tile program writes (the backward output is uninitialized there).
    ``active_cap``: grid over that many compacted non-empty tiles instead
    of the full raster (tiles beyond the cap render black and get zero
    gradients — size it generously and watch the binning telemetry).
    """
    out, _ = _composite_fwd(
        entries, entry_valid, tile_start, tile_count,
        C, num_tiles_x, num_tiles_y, active_cap,
    )
    return out


def _composite_fwd(entries, entry_valid, tile_start, tile_count, C,
                   num_tiles_x, num_tiles_y, active_cap):
    color_t, alpha_t = _fwd_call(
        entries, tile_start, tile_count, C, num_tiles_x, num_tiles_y,
        active_cap=active_cap,
    )
    img, alpha = _untile(color_t, alpha_t, num_tiles_x, num_tiles_y, C)
    residuals = (entries, entry_valid, tile_start, tile_count)
    return (img, alpha), residuals


def _composite_bwd(C, num_tiles_x, num_tiles_y, active_cap, residuals, g):
    entries, entry_valid, tile_start, tile_count = residuals
    g_img, g_alpha = g
    g_color_t, g_alpha_t = _retile(g_img, g_alpha, num_tiles_x, num_tiles_y, C)
    d_entries = _bwd_call(
        entries, tile_start, tile_count, g_color_t, g_alpha_t,
        C, num_tiles_x, num_tiles_y, active_cap=active_cap,
    )
    # SELECT (never multiply): slots no tile program writes hold stale HBM
    # bytes that can decode as NaN, and 0 * NaN = NaN.  The mask must also
    # exclude written-region *padding* entries (entry_valid == 0), whose
    # gradients would otherwise scatter into gaussian 0 via the pack gather's
    # transpose.  Rows >= 6+C are alignment padding the kernel's dchunk
    # scratch never initializes — uninitialized VMEM, masked likewise.
    # Under a compacted grid only the in-cap slots' segments are swept, so
    # the mask is built from exactly those segments.
    if active_cap is None:
        ws, wc = tile_start, tile_count
    else:
        from gomavatar_tpu.ops.splat.binning import compact_tiles

        _, ws, wc, _, _, _ = compact_tiles(tile_start, tile_count, active_cap)
    written = written_slot_mask(ws, wc, entries.shape[1], ncmax=NCMAX)
    row_real = (jnp.arange(entries.shape[0]) < 6 + C)[:, None]
    d_entries = jnp.where(
        row_real & ((entry_valid * written)[None, :] > 0), d_entries, 0.0
    )
    ft0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return (d_entries, jnp.zeros_like(entry_valid), ft0(tile_start), ft0(tile_count))


composite_tiles_pallas.defvjp(_composite_fwd, _composite_bwd)
