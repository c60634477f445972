"""Fused single-pass frame renderer v2 (eval path).

One Pallas sweep per frame computes the splat blend, the z-buffered normal/
shading selection and the alpha accumulation — the image-space tail of
``gom_forward(train=False)`` (reference semantics: models/model.py:236-287).
Design points (all measured on the v5e):

  * consumes :class:`~gomavatar_tpu.ops.splat.binning.SortedBinning` — raw
    depth-sorted per-tile (start, count) segments.  Each chunk DMA starts at
    the aligned-down 128 boundary and head/tail lanes are masked, which
    removes the old 128-aligned repack gather (~2.6 ms at 55k faces);
  * the grid runs over COMPACTED non-empty tiles (scalar-prefetched tile
    ids), not the full tile raster — empty tiles cost nothing and are filled
    by a cheap row-gather afterwards;
  * per-face quantities arrive as raw screen-space channels; the kernel
    derives TILE-LOCAL pixel-polynomial coefficients per chunk (splat
    log-density is pixel-quadratic, barycentrics and triangle depth are
    pixel-linear) so one MXU ``(P,6)x(6,4*CHUNK)`` matmul per chunk
    replaces ~30 VPU passes;
  * the shadow MLP does NOT run per pixel: the reference's per-pixel MLP
    input (the `ones`-barycentric summed normal, mesh.py:26-29) is constant
    per winning face, so shading is computed once per FACE outside the
    kernel (one big MXU matmul over F faces) and the kernel z-buffer-selects
    the winning face's scalar (channel 22 of the entry table).  An
    in-kernel per-tile MLP was measured at ~17 us/program — 10x the rest of
    the kernel;
  * per-entry pass flags keep the union binning bit-faithful per pass:
    splat contributions only inside the CUDA radius bbox, mesh contributions
    only inside the triangle(+margin) bbox.  The flags are folded into the
    entry stream at gather time (opacity row 5 *= splat flag, mesh-valid
    row 18 *= mesh flag) so the kernel sees plain 24-row chunks (Mosaic
    DMA slices need 8-aligned leading dims — 24 is, 26 isn't).

Numerics: identical math to the unfused train path up to float reassociation
(the MXU coefficient form re-associates the quadratic, ~1e-5 relative);
fused-vs-unfused agreement is asserted in tests at that tolerance.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gomavatar_tpu.ops.splat.binning import SortedBinning, TILE, CHUNK
from gomavatar_tpu.ops.splat.pallas_kernel import _transmittance, _dot_split3, _dot_mixed
from gomavatar_tpu.ops.splat.reference import ALPHA_MAX, ALPHA_MIN
from gomavatar_tpu.ops.geometry import NCH

P = TILE * TILE
_BIG = 1e10


NCMAX = 64  # max CHUNK-sized entry chunks a tile sweep ingests (segments
# beyond NCMAX*CHUNK entries are clamped; binning telemetry detects it)

GROUP = 4  # tile slots per kernel program (amortizes ~1.4 us/program of
# grid/pipeline overhead).  Adjudicated r5 (BENCH_NOTES flag table): 1/2/4/8
# all land 9.3-9.4 ms on the 512^2 flagship — grouping is free but not
# load-bearing at this scale; the env A/B knob was removed.

# bf16-split terms of the transmittance cumsum matmul (the kernel's largest
# MXU cost, one (256,128)x(128,128) pass per term per chunk).  3 terms is
# ~2^-24 relative.  Adjudicated r5: the 2-term variant measured SLOWER
# (11.47 vs 9.21 ms — the narrower split breaks the fused layout), so the
# GOMAVATAR_EVAL_CUMSUM_TERMS knob was removed; 3 terms is the only path.
_FAST = True


def _frame_kernel(
    # scalar prefetch
    nact_ref, aid_ref, st_ref, ct_ref,
    # tensor inputs
    entries_hbm,
    *refs,
    num_tiles_x: int,
    ncmax: int,
    with_mesh: bool,
    group: int,
):
    out_refs = refs[:-2]
    chunk_vmem, sem = refs[-2], refs[-1]
    rgb_out, alpha_out = out_refs[0], out_refs[1]
    sel_out = out_refs[2] if with_mesh else None

    i = pl.program_id(0)

    # slots >= n_active are never read back (pos_of_tile points empty tiles
    # at the appended zeros row), so their body is skipped — the static
    # active_cap grid costs only its unread window copies.
    for g in range(group):
        s = i * group + g

        @pl.when(s < nact_ref[0])
        def _active_body(s=s, g=g):
            _frame_tile(
                s, g, aid_ref, st_ref, ct_ref, entries_hbm,
                rgb_out, alpha_out, sel_out, chunk_vmem, sem,
                num_tiles_x=num_tiles_x, ncmax=ncmax, with_mesh=with_mesh,
            )


def _frame_tile(
    s, g, aid_ref, st_ref, ct_ref, entries_hbm,
    rgb_out, alpha_out, sel_out, chunk_vmem, sem,
    *, num_tiles_x: int, ncmax: int, with_mesh: bool,
):
    tile = aid_ref[s]
    start = st_ref[s]
    count = ct_ref[s]
    astart = (start // CHUNK) * CHUNK
    head = start - astart
    nchunks = jnp.minimum((head + count + CHUNK - 1) // CHUNK, ncmax)

    # tile origin (scalars) + TILE-RELATIVE pixel features.  Polynomials are
    # evaluated in tile-local coordinates (0..15) against per-chunk rebased
    # coefficients — image-absolute coefficients would cancel catastrophically.
    px0 = (tile % num_tiles_x).astype(jnp.float32) * TILE
    py0 = (tile // num_tiles_x).astype(jnp.float32) * TILE
    lin = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    prx = (lin % TILE).astype(jnp.float32)  # (P, 1)
    pry = (lin // TILE).astype(jnp.float32)
    prx2 = prx * prx
    pry2 = pry * pry
    prxy = prx * pry
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

    def get_dma(slot, k):
        return pltpu.make_async_copy(
            entries_hbm.at[:, pl.ds(pl.multiple_of(astart + k * CHUNK, CHUNK), CHUNK)],
            chunk_vmem.at[slot],
            sem.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    def body(k, carry):
        log_T, color_acc, alpha_acc, best_z, best_s = carry

        @pl.when(k + 1 < nchunks)
        def _():
            get_dma((k + 1) % 2, k + 1).start()

        get_dma(k % 2, k).wait()
        chunk = chunk_vmem[k % 2]

        pos = k * CHUNK + lane
        lane_ok = (pos >= head) & (pos < head + count)  # (1, CHUNK)

        # --- tile-local polynomial coefficients, (1, CHUNK)-row math (cheap)
        mx, my = chunk[0:1, :], chunk[1:2, :]
        ca, cb, cc = chunk[2:3, :], chunk[3:4, :], chunk[4:5, :]
        dx0 = px0 - mx
        dy0 = py0 - my
        qc = -0.5 * (ca * dx0 * dx0 + cc * dy0 * dy0) - cb * dx0 * dy0
        qx = -(ca * dx0 + cb * dy0)
        qy = -(cc * dy0 + cb * dx0)

        # --- polynomial evaluation via VPU broadcast-FMAs ((P,1) pixel
        # columns x (1,CHUNK) coefficient rows).  An MXU (P,6)x(6,4*CHUNK)
        # formulation was measured SLOWER: f32 MXU matmuls decompose into
        # multi-pass bf16x3, ~1.1 us/chunk for the widened form, while the
        # FMA chain is single-pass f32 on the VPU.
        power = qc + qx * prx + qy * pry - 0.5 * (ca * prx2 + cc * pry2) - cb * prxy

        # splat blend (CUDA gate semantics; the splat-pass flag is already
        # folded into the opacity row)
        op = chunk[5:6, :] * lane_ok.astype(jnp.float32)
        alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
        alpha = jnp.where(power > 0.0, 0.0, alpha)
        alpha = jnp.where(alpha < ALPHA_MIN, 0.0, alpha)
        w, _, cum_t = _transmittance(alpha, log_T, fast=_FAST)
        log_T = cum_t[:, CHUNK - 1 : CHUNK]
        color_acc = color_acc + _dot_mixed(
            chunk[6:9, :], w, (((1,), (1,)), ((), ()))
        )
        alpha_acc = alpha_acc + jnp.sum(w, axis=1, keepdims=True)

        if with_mesh:
            # z-buffered selection of [normal | shading] (mesh_raster
            # semantics; the mesh-pass flag is folded into the valid row).
            # Plane coefficients are per-face constants (ops/geometry.py);
            # only the tile-origin rebase happens here (row math).
            w0x, w0y = chunk[9:10, :], chunk[10:11, :]
            w1x, w1y = chunk[11:12, :], chunk[12:13, :]
            dx2 = px0 - chunk[13:14, :]
            dy2 = py0 - chunk[14:15, :]
            zx, zy = chunk[15:16, :], chunk[16:17, :]
            w0c = w0x * dx2 + w0y * dy2
            w1c = w1x * dx2 + w1y * dy2
            zc0 = zx * dx2 + zy * dy2 + chunk[17:18, :]
            w0 = w0c + w0x * prx + w0y * pry
            w1 = w1c + w1x * prx + w1y * pry
            z_px = zc0 + zx * prx + zy * pry
            w2 = 1.0 - w0 - w1
            ok = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (chunk[18:19, :] > 0) & lane_ok
            z_cand = jnp.where(ok, z_px, _BIG)
            chunk_min = jnp.min(z_cand, axis=1, keepdims=True)
            better = chunk_min < best_z
            # first eligible lane via iota-min (exact; cheaper than a
            # prefix-sum-based one-hot)
            cand_lane = jnp.where(
                (z_cand <= chunk_min) & ok, lane.astype(jnp.float32), 2.0 * CHUNK
            )
            first = jnp.min(cand_lane, axis=1, keepdims=True)
            onehot = (cand_lane <= first) & better
            # exact select: values bf16x3-split against the exact 0/1 one-hot
            s_chunk = _dot_split3(
                chunk[19:23, :], onehot.astype(jnp.float32),
                (((1,), (1,)), ((), ())),
            )  # (4, P): [nx, ny, nz, shading]
            best_s = jnp.where(better.reshape(1, P), s_chunk, best_s)
            best_z = jnp.minimum(best_z, chunk_min)
        return log_T, color_acc, alpha_acc, best_z, best_s

    init = (
        jnp.zeros((P, 1), jnp.float32),
        jnp.zeros((3, P), jnp.float32),
        jnp.zeros((P, 1), jnp.float32),
        jnp.full((P, 1), _BIG, jnp.float32),
        jnp.zeros((4, P), jnp.float32),
    )
    _, color_acc, alpha_acc, best_z, best_s = jax.lax.fori_loop(0, nchunks, body, init)

    rgb_out[g] = color_acc
    alpha_out[g] = alpha_acc.reshape(1, P)
    if with_mesh:
        hit = (best_z < _BIG).astype(jnp.float32).reshape(1, P)
        sel_out[g] = jnp.concatenate([best_s, hit], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("num_tiles_x", "num_tiles_y", "ncmax", "with_mesh", "interpret"),
)
def _frame_call(
    entries, active_id, seg_start, seg_count, n_active,
    num_tiles_x, num_tiles_y, ncmax=NCMAX, with_mesh=True,
    interpret=False,
):
    A = active_id.shape[0]
    G = math.gcd(A, GROUP)  # shard-local A (tile-parallel) may be < GROUP
    out_specs = [
        pl.BlockSpec((G, 3, P), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((G, 1, P), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((A, 3, P), jnp.float32),
        jax.ShapeDtypeStruct((A, 1, P), jnp.float32),
    ]
    if with_mesh:
        out_specs.append(
            pl.BlockSpec((G, 5, P), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((A, 5, P), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(A // G,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, NCH, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _frame_kernel,
            num_tiles_x=num_tiles_x,
            ncmax=ncmax,
            with_mesh=with_mesh,
            group=G,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(n_active.reshape(1), active_id, seg_start, seg_count, entries)


def render_frame_sorted(
    table: jax.Array,  # (F, NCH) from ops.geometry.frame_geometry
    bins: SortedBinning,
    img_size: tuple[int, int],
    shading0: jax.Array | None = None,  # shading of the zero normal (no-hit
    # pixels); None disables the shading multiply (albedo passthrough)
    with_normal: bool = False,
    ncmax: int = NCMAX,
    interpret: bool = False,
):
    """Render the frame: returns (rgb (H,W,3), alpha (H,W)) and, with
    ``with_normal``, also (normal (H,W,3), hard mask (H,W)).  ``table``
    channel 22 must hold the per-face shading (x2 applied) when ``shading0``
    is given."""
    W, H = img_size
    TX, TY = bins.num_tiles_x, bins.num_tiles_y
    with_shadow = shading0 is not None
    with_mesh = with_shadow or with_normal
    # (NCH, Dcap) — the only data gather.  Adjudicated r5: a 128-lane-padded
    # "wide" gather (5x HBM traffic for lower per-row overhead) measured
    # dead even (9.24 vs 9.27 ms on the 512^2 flagship — BENCH_NOTES flag
    # table), so the narrow gather stays and the env knob was removed.
    entries = table[bins.order].T
    # fold the per-pass flags into the entry stream (see module docstring)
    entries = entries.at[5].multiply(bins.entry_splat)
    entries = entries.at[18].multiply(bins.entry_mesh)

    outs = _frame_call(
        entries, bins.active_id, bins.seg_start, bins.seg_count, bins.n_active,
        TX, TY, ncmax=ncmax, with_mesh=with_mesh, interpret=interpret,
    )

    def untile(compact, c):
        # scatter-free fill: inactive tiles index the appended zeros row
        full = jnp.concatenate(
            [compact, jnp.zeros((1,) + compact.shape[1:], compact.dtype)], axis=0
        )[bins.pos_of_tile]  # (T, c, P)
        return (
            full.reshape(TY, TX, c, TILE, TILE)
            .transpose(0, 3, 1, 4, 2)
            .reshape(H, W, c)
        )

    rgb = untile(outs[0], 3)
    alpha = untile(outs[1], 1)[..., 0]
    if with_mesh:
        sel = untile(outs[2], 5)
        hit = sel[..., 4]
        if with_shadow:
            shading = jnp.where(hit > 0, sel[..., 3], shading0)
            rgb = rgb * shading[..., None]
    if with_normal:
        return rgb, alpha, sel[..., :3], hit
    return rgb, alpha
