"""Pallas TPU kernels for mesh rasterization (hard normal pass + soft
silhouette) with custom VJP.

Companion to ops/mesh_raster.py (same tile/chunk structure and math as its
jnp path, which remains the CPU fallback and autodiff oracle).  Replaces
the PyTorch3D ``MeshRasterizer``/``SoftSilhouetteShader`` pair the reference
wraps (models/modules/renderer/mesh.py) — see mesh_raster.py for the
semantics notes.

Kernel design:
  * per-face channels packed ``[16, Dp]`` (x0 y0 x1 y1 x2 y2 | z0 z1 z2 |
    nsx nsy nsz | valid | pad), tile segments 128-aligned (binning.py);
  * z-buffering carries (best_z, best_normal) per pixel; the winning face's
    summed normal is extracted with a first-winner one-hot matmul on the
    MXU (no gather);
  * the soft silhouette accumulates per-pixel sum of log(1-p), p =
    sigmoid(-signed_d^2/sigma) over every face in the tile;
  * the backward recomputes forward state (no HBM residuals) and gets the
    coordinate gradients of the soft term by running jax.vjp INSIDE the
    kernel over the chunk's distance function — autodiff at trace time,
    lowered like hand-written code.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gomavatar_tpu.ops.splat.binning import TILE, CHUNK, written_slot_mask
from gomavatar_tpu.ops.splat.pallas_kernel import _dot_split3, _pixel_coords

P = TILE * TILE
_BIG = 1e10
NCH = 16
NCMAX = 64  # max chunks a tile program ingests (fwd truncates, bwd writes)

# Soft-silhouette saturation skip: once EVERY pixel of a tile has
# log(1-soft) below this, later chunks change the mask by < exp(_LOG_SAT)
# per face (~1.5e-8) and their gradients are exp-suppressed to the same
# scale, so the (expensive, ~3x the rest of the body) sigmoid-distance math
# is skipped.  Entries are depth-sorted, so interior tiles saturate right
# after the front surface and skip the entire back-face layer.  A single
# covering face contributes log(1e-7) ~= -16.1, hence -18 is reached after
# ~2 front-surface chunks.  GOMAVATAR_SOFT_SAT_OFF=1 disables (perf A/B /
# bit-exactness vs the jnp oracle).  Adjudicated r5 (BENCH_NOTES flag
# table): skip ON 67.55 vs OFF 68.03 ms/step on the 55k-face flagship,
# loss-neutral — the skip stays default; the flag survives as the
# oracle-exactness debug switch.
_LOG_SAT = -18.0
_SAT_ON = os.environ.get("GOMAVATAR_SOFT_SAT_OFF", "0") != "1"


def _bary(chunk, px, py):
    """Barycentric coverage of a chunk: returns (ok, z_px, inside)."""
    x0, y0, x1, y1, x2, y2 = (chunk[i : i + 1, :] for i in range(6))
    z0, z1, z2 = (chunk[i : i + 1, :] for i in range(6, 9))
    valid = chunk[12:13, :]
    denom = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
    denom_ok = jnp.abs(denom) >= 1e-12
    # reciprocal on the (1, CHUNK) row, multiply on the (P, CHUNK) block —
    # full-block divides are multi-pass on the VPU
    inv_denom = 1.0 / jnp.where(denom_ok, denom, 1.0)
    w0 = ((y1 - y2) * (px - x2) + (x2 - x1) * (py - y2)) * inv_denom
    w1 = ((y2 - y0) * (px - x2) + (x0 - x2) * (py - y2)) * inv_denom
    w2 = 1.0 - w0 - w1
    inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
    z_px = w0 * z0 + w1 * z1 + w2 * z2
    ok = inside & denom_ok & (valid > 0)
    return ok, z_px, inside


def _soft_log1m(coords, px, py, valid_row, sigma_px2):
    """Sum over chunk faces of log(1 - sigmoid(-signed_d2/sigma)) per pixel.

    ``coords``: (6, CHUNK) rows x0 y0 x1 y1 x2 y2.  Differentiable in
    coords — the backward kernel takes jax.vjp of this function.
    """
    x0, y0, x1, y1, x2, y2 = (coords[i : i + 1, :] for i in range(6))

    def seg(ax, ay, bx, by):
        abx = bx - ax
        aby = by - ay
        d2ab = abx * abx + aby * aby
        inv_ab = 1.0 / jnp.maximum(d2ab, 1e-12)  # (1, CHUNK) row reciprocal
        t = ((px - ax) * abx + (py - ay) * aby) * inv_ab
        t = jnp.clip(t, 0.0, 1.0)
        dx = px - (ax + t * abx)
        dy = py - (ay + t * aby)
        return dx * dx + dy * dy

    d2 = jnp.minimum(seg(x0, y0, x1, y1), jnp.minimum(seg(x1, y1, x2, y2), seg(x2, y2, x0, y0)))
    denom = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
    w0 = ((y1 - y2) * (px - x2) + (x2 - x1) * (py - y2))
    w1 = ((y2 - y0) * (px - x2) + (x0 - x2) * (py - y2))
    # sign test without division: all edge functions share denom's sign
    s0 = w0 * jnp.sign(denom)
    s1 = w1 * jnp.sign(denom)
    s2 = (denom - w0 - w1) * jnp.sign(denom)
    inside = (s0 >= 0) & (s1 >= 0) & (s2 >= 0) & (jnp.abs(denom) >= 1e-12)
    signed = jnp.where(inside, -d2, d2)
    prob = jax.nn.sigmoid(-signed / sigma_px2)
    prob = jnp.where(valid_row > 0, prob, 0.0)
    return jnp.sum(jnp.log1p(-jnp.minimum(prob, 1.0 - 1e-7)), axis=1, keepdims=True)


def _first_onehot(eligible):
    """Keep only the first True along lanes via iota-min (exact; cheaper
    than a prefix-sum one-hot — no MXU pass)."""
    n = eligible.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.float32)
    cand = jnp.where(eligible, lane, 2.0 * n)
    first = jnp.min(cand, axis=1, keepdims=True)
    return jnp.logical_and(eligible, cand <= first)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(
    *refs,
    num_tiles_x: int, ncmax: int, soft: bool, sigma_px2: float,
    compact: bool = False,
):
    if compact:
        aid_ref, start_ref, count_ref, entries_hbm, hard_out, soft_out, chunk_vmem, sem = refs
        s = pl.program_id(0)
        t = aid_ref[s]
    else:
        start_ref, count_ref, entries_hbm, hard_out, soft_out, chunk_vmem, sem = refs
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

    def body(k, carry):
        best_z, best_n, log_om = carry

        @pl.when(k + 1 < nchunks)
        def _():
            get_dma((k + 1) % 2, k + 1).start()

        get_dma(k % 2, k).wait()
        chunk = chunk_vmem[k % 2]

        ok, z_px, _ = _bary(chunk, px, py)
        z_cand = jnp.where(ok, z_px, _BIG)
        chunk_min = jnp.min(z_cand, axis=1, keepdims=True)  # (P, 1)
        better = chunk_min < best_z
        onehot = _first_onehot((z_cand <= chunk_min) & ok & better)
        nsum = chunk[9:12, :]  # (3, CHUNK)
        n_chunk = _dot_split3(
            nsum, onehot.astype(jnp.float32), (((1,), (1,)), ((), ()))
        )  # (3, P) — exact: one-hot is 0/1, values bf16x3-split
        best_n = jnp.where(better.reshape(1, P), n_chunk, best_n)
        best_z = jnp.minimum(best_z, chunk_min)

        if soft:
            def _soft_add(lo):
                return lo + _soft_log1m(chunk[0:6, :], px, py, chunk[12:13, :], sigma_px2)

            if _SAT_ON:
                log_om = jax.lax.cond(
                    jnp.max(log_om) > _LOG_SAT, _soft_add, lambda lo: lo, log_om
                )
            else:
                log_om = _soft_add(log_om)
        return best_z, best_n, log_om

    init = (
        jnp.full((P, 1), _BIG, jnp.float32),
        jnp.zeros((3, P), jnp.float32),
        jnp.zeros((P, 1), jnp.float32),
    )
    best_z, best_n, log_om = jax.lax.fori_loop(0, nchunks, body, init)

    hit = (best_z < _BIG).astype(jnp.float32).reshape(1, P)
    hard_out[0] = jnp.concatenate([best_n, hit], axis=0)
    soft_out[0] = (1.0 - jnp.exp(log_om)).reshape(1, P) if soft else jnp.zeros((1, P))


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(
    *refs,
    num_tiles_x: int, ncmax: int, soft: bool, sigma_px2: float,
    compact: bool = False,
):
    if compact:
        (aid_ref, start_ref, count_ref, entries_hbm, g_hard_in, g_soft_in,
         d_entries_hbm, chunk_vmem, dchunk_vmem, sem, dsem) = refs
        s = pl.program_id(0)
        t = aid_ref[s]
    else:
        (start_ref, count_ref, entries_hbm, g_hard_in, g_soft_in,
         d_entries_hbm, chunk_vmem, dchunk_vmem, sem, dsem) = refs
        s = t = pl.program_id(0)
    start = start_ref[s]
    nchunks = jnp.minimum(count_ref[s] // CHUNK, ncmax)
    px, py = _pixel_coords(t, num_tiles_x)
    g_n = g_hard_in[0][0:3]  # (3, P)
    g_soft = g_soft_in[0].reshape(P, 1)

    def get_dma(slot, k):
        return pltpu.make_async_copy(
            entries_hbm.at[:, pl.ds(pl.multiple_of(start + k * CHUNK, CHUNK), CHUNK)],
            chunk_vmem.at[slot],
            sem.at[slot],
        )

    # pass A: recompute best_z (and total log(1-p) for the soft chain)
    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    def body_a(k, carry):
        best_z, log_om = carry

        @pl.when(k + 1 < nchunks)
        def _():
            get_dma((k + 1) % 2, k + 1).start()

        get_dma(k % 2, k).wait()
        chunk = chunk_vmem[k % 2]
        ok, z_px, _ = _bary(chunk, px, py)
        z_cand = jnp.where(ok, z_px, _BIG)
        best_z = jnp.minimum(best_z, jnp.min(z_cand, axis=1, keepdims=True))
        if soft:
            def _soft_add(lo):
                return lo + _soft_log1m(chunk[0:6, :], px, py, chunk[12:13, :], sigma_px2)

            if _SAT_ON:
                log_om = jax.lax.cond(
                    jnp.max(log_om) > _LOG_SAT, _soft_add, lambda lo: lo, log_om
                )
            else:
                log_om = _soft_add(log_om)
        return best_z, log_om

    best_z, log_om = jax.lax.fori_loop(
        0, nchunks, body_a,
        (jnp.full((P, 1), _BIG, jnp.float32), jnp.zeros((P, 1), jnp.float32)),
    )
    # d(soft)/d(S) with soft = 1 - exp(S):  -g_soft * exp(S)
    dL_dS = -g_soft * jnp.exp(log_om) if soft else None

    # pass B: per-entry gradients
    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    def body_b(k, carry):
        claimed, log_om_b = carry

        @pl.when(k + 1 < nchunks)
        def _():
            get_dma((k + 1) % 2, k + 1).start()

        get_dma(k % 2, k).wait()
        chunk = chunk_vmem[k % 2]

        ok, z_px, _ = _bary(chunk, px, py)
        z_cand = jnp.where(ok, z_px, _BIG)
        eligible = (z_cand <= best_z) & ok & (claimed < 0.5) & (best_z < _BIG)
        onehot = _first_onehot(eligible)
        claimed = jnp.maximum(
            claimed, jnp.max(onehot.astype(jnp.float32), axis=1, keepdims=True)
        )
        # d_nsum[c, e] = sum_p g_n[c, p] * onehot[p, e]
        d_nsum = _dot_split3(
            g_n, onehot.astype(jnp.float32), (((1,), (0,)), ((), ()))
        )  # (3, CHUNK) — exact: one-hot is 0/1, cotangents bf16x3-split

        dchunk_vmem[:] = jnp.zeros((NCH, CHUNK), jnp.float32)
        dchunk_vmem[9:12, :] = d_nsum
        if soft:
            def _soft_vjp(lo):
                # the vjp's primal is free — reuse it to track the same
                # truncated log_om prefix as the forward
                S, vjp_fn = jax.vjp(
                    lambda c: _soft_log1m(c, px, py, chunk[12:13, :], sigma_px2),
                    chunk[0:6, :],
                )
                (d_coords,) = vjp_fn(dL_dS)
                return lo + S, d_coords

            def _soft_skip(lo):
                # saturated: this chunk was never added in the forward, so
                # its exact gradient under the truncated objective is zero
                return lo, jnp.zeros((6, CHUNK), jnp.float32)

            if _SAT_ON:
                log_om_b, d_coords = jax.lax.cond(
                    jnp.max(log_om_b) > _LOG_SAT, _soft_vjp, _soft_skip, log_om_b
                )
            else:
                log_om_b, d_coords = _soft_vjp(log_om_b)
            dchunk_vmem[0:6, :] = d_coords

        out_dma = pltpu.make_async_copy(
            dchunk_vmem,
            d_entries_hbm.at[:, pl.ds(pl.multiple_of(start + k * CHUNK, CHUNK), CHUNK)],
            dsem,
        )
        out_dma.start()
        out_dma.wait()
        return claimed, log_om_b

    jax.lax.fori_loop(
        0, nchunks, body_b,
        (jnp.zeros((P, 1), jnp.float32), jnp.zeros((P, 1), jnp.float32)),
    )


# ---------------------------------------------------------------------------
# wrappers + custom VJP
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("num_tiles_x", "num_tiles_y", "soft", "sigma_px2", "ncmax", "active_cap"),
)
def _fwd_call(entries, tile_start, tile_count, num_tiles_x, num_tiles_y, soft,
              sigma_px2, ncmax=NCMAX, active_cap=None):
    T = num_tiles_x * num_tiles_y
    compact = active_cap is not None
    if compact:
        # compacted non-empty-tile grid (see splat _fwd_call)
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
            pl.BlockSpec((1, 4, P), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, NCH, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    hard_t, soft_t = pl.pallas_call(
        functools.partial(
            _fwd_kernel, num_tiles_x=num_tiles_x, ncmax=ncmax, soft=soft,
            sigma_px2=sigma_px2, compact=compact,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((A, 4, P), jnp.float32),
            jax.ShapeDtypeStruct((A, 1, P), jnp.float32),
        ],
    )(*args)
    if compact:
        hard_t = jnp.concatenate([hard_t, jnp.zeros((1, 4, P), hard_t.dtype)])[pos]
        soft_t = jnp.concatenate([soft_t, jnp.zeros((1, 1, P), soft_t.dtype)])[pos]
    return hard_t, soft_t


@functools.partial(
    jax.jit,
    static_argnames=("num_tiles_x", "num_tiles_y", "soft", "sigma_px2", "ncmax", "active_cap"),
)
def _bwd_call(entries, tile_start, tile_count, g_hard_t, g_soft_t, num_tiles_x,
              num_tiles_y, soft, sigma_px2, ncmax=NCMAX, active_cap=None):
    T = num_tiles_x * num_tiles_y
    Dp = entries.shape[1]
    compact = active_cap is not None
    if compact:
        # g blocks read from the full (T, ...) tensors through the
        # scalar-prefetched active_id index map (see splat _bwd_call)
        from gomavatar_tpu.ops.splat.binning import compact_tiles

        aid, st, ct, _, _, _ = compact_tiles(tile_start, tile_count, active_cap)
        prefetch, grid = 3, (active_cap,)
        args = (aid, st, ct, entries, g_hard_t, g_soft_t)
        g_index = lambda s, aid_ref, *_: (aid_ref[s], 0, 0)
    else:
        prefetch, grid = 2, (T,)
        args = (tile_start, tile_count, entries, g_hard_t, g_soft_t)
        g_index = lambda t, *_: (t, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=prefetch,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 4, P), g_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), g_index, memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, NCH, CHUNK), jnp.float32),
            pltpu.VMEM((NCH, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    d_entries = pl.pallas_call(
        functools.partial(
            _bwd_kernel, num_tiles_x=num_tiles_x, ncmax=ncmax, soft=soft,
            sigma_px2=sigma_px2, compact=compact,
        ),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((NCH, Dp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(*args)[0]
    return d_entries


def _untile1(x_t, num_tiles_x, num_tiles_y):
    H, W = num_tiles_y * TILE, num_tiles_x * TILE
    return x_t.reshape(num_tiles_y, num_tiles_x, TILE, TILE).transpose(0, 2, 1, 3).reshape(H, W)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def mesh_composite_pallas(
    entries, entry_valid, tile_start, tile_count,
    num_tiles_x: int, num_tiles_y: int, soft: bool, sigma_px2: float,
    active_cap: int | None = None,
):
    """Returns (normal (H, W, 3), mask (H, W), soft (H, W)).

    ``active_cap``: grid over that many compacted non-empty tiles instead of
    the full raster (tiles beyond the cap render empty with zero gradients —
    size it generously and watch the binning telemetry)."""
    out, _ = _mesh_fwd(
        entries, entry_valid, tile_start, tile_count,
        num_tiles_x, num_tiles_y, soft, sigma_px2, active_cap,
    )
    return out


def _mesh_fwd(entries, entry_valid, tile_start, tile_count, num_tiles_x,
              num_tiles_y, soft, sigma_px2, active_cap):
    hard_t, soft_t = _fwd_call(
        entries, tile_start, tile_count, num_tiles_x, num_tiles_y, soft,
        sigma_px2, active_cap=active_cap,
    )
    TY, TX = num_tiles_y, num_tiles_x
    H, W = TY * TILE, TX * TILE
    normal = (
        hard_t[:, 0:3, :].reshape(TY, TX, 3, TILE, TILE)
        .transpose(0, 3, 1, 4, 2)
        .reshape(H, W, 3)
    )
    mask = _untile1(hard_t[:, 3, :], TX, TY)
    soft_img = _untile1(soft_t[:, 0, :], TX, TY)
    return (normal, mask, soft_img), (entries, entry_valid, tile_start, tile_count)


def _mesh_bwd(num_tiles_x, num_tiles_y, soft, sigma_px2, active_cap, residuals, g):
    entries, entry_valid, tile_start, tile_count = residuals
    g_normal, _g_mask, g_soft = g  # hard mask carries no gradient
    TY, TX = num_tiles_y, num_tiles_x
    g_hard_t = jnp.concatenate(
        [
            g_normal.reshape(TY, TILE, TX, TILE, 3).transpose(0, 2, 4, 1, 3).reshape(TY * TX, 3, P),
            jnp.zeros((TY * TX, 1, P), jnp.float32),
        ],
        axis=1,
    )
    g_soft_t = g_soft.reshape(TY, TILE, TX, TILE).transpose(0, 2, 1, 3).reshape(TY * TX, 1, P)
    d_entries = _bwd_call(
        entries, tile_start, tile_count, g_hard_t, g_soft_t,
        num_tiles_x, num_tiles_y, soft, sigma_px2, active_cap=active_cap,
    )
    # SELECT (never multiply): unwritten output slots hold stale HBM bytes
    # that can decode as NaN, and 0 * NaN = NaN (see splat _composite_bwd).
    # Under a compacted grid only in-cap slots' segments are swept.
    if active_cap is None:
        ws, wc = tile_start, tile_count
    else:
        from gomavatar_tpu.ops.splat.binning import compact_tiles

        _, ws, wc, _, _, _ = compact_tiles(tile_start, tile_count, active_cap)
    written = written_slot_mask(ws, wc, entries.shape[1], ncmax=NCMAX)
    d_entries = jnp.where((entry_valid * written)[None, :] > 0, d_entries, 0.0)
    ft0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return (d_entries, jnp.zeros_like(entry_valid), ft0(tile_start), ft0(tile_count))


mesh_composite_pallas.defvjp(_mesh_fwd, _mesh_bwd)
