"""Stage-by-stage timing of the fused eval render path on the bench backend.

Breaks render_frame_eval (models/gom.py) into separately-jitted stages —
LBS+geometry table, per-face shading, two-band binning, entry gather, frame
kernel, full fused forward — and times each with block_until_ready, so a
perf regression or win localizes to a stage in one command:

    python tools/profile_eval.py [--trained] [--band0 4] [--iters 50]

Stage boundaries materialize intermediates to HBM that XLA would otherwise
fuse away, so stage times OVERESTIMATE slightly and the full-forward row is
the ground truth (stages are for attribution, not absolute accounting).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_gomavatar")
)

import jax
import jax.numpy as jnp

import _mfu


_PEAKS = (None, None)  # set in main() from the actual device


def _time(fn, args, n, name):
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    flops, nbytes = _mfu.compiled_cost(fn, args)
    print(_mfu.fmt_row(name, dt, flops, nbytes, *_PEAKS))
    return out, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trained", action="store_true",
                    help="use artifacts/e2e_trained.npz instead of the flagship")
    ap.add_argument("--band0", type=int, default=-1,
                    help="two-band binning band0 (-1 = GoMConfig default, 0 = single-band)")
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    from __graft_entry__ import _flagship
    from gomavatar_tpu.models import modules as M
    from gomavatar_tpu.models.gom import gom_forward
    from gomavatar_tpu.ops.geometry import frame_geometry
    from gomavatar_tpu.ops.skeleton import get_global_RTs, apply_lbs
    from gomavatar_tpu.ops.splat.binning import bin_sorted
    from gomavatar_tpu.ops.frame_render import render_frame_sorted, _frame_call

    if args.trained:
        from bench import _trained_scene  # builds params from the artifact

        params, statics, cfg, batch, it = _trained_scene()
        print(f"scene: TRAINED e2e avatar (iter {it})", file=sys.stderr)
    else:
        params, statics, cfg, batch, _ = _flagship()
    if args.band0 >= 0:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, binning_band0=args.band0 if args.band0 > 0 else None
        )
    global _PEAKS
    _PEAKS = _mfu.device_peaks()
    dev = jax.devices()[0]
    print(f"scene: {cfg.num_faces} faces @ {cfg.img_size}, "
          f"band0={cfg.binning_band0}, backend={dev.platform} "
          f"({getattr(dev, 'device_kind', '?')})",
          file=sys.stderr)
    if _PEAKS[0]:
        print(f"peaks: {_PEAKS[0] / 1e12:.0f} TFLOP/s bf16, "
              f"{_PEAKS[1] / 1e9:.0f} GB/s HBM (MFU is a lower bound: "
              f"XLA flop counts are precision-blind)", file=sys.stderr)
    n = args.iters
    K, E = batch["K"], batch["E"]
    F = statics.faces.shape[0]
    overflow_cap = max(F // 8, 2048)

    # --- stage 1: skeleton + LBS + geometry table
    @jax.jit
    def s_geom(params):
        gR, gT = get_global_RTs(
            batch["cnl_gtfms"], batch["dst_Rs"], batch["dst_Ts"],
            use_smplx=cfg.use_smplx,
        )
        verts_obs = apply_lbs(params["vertices"], gR, gT, statics.lbs_weights)
        colors = M.appearance_apply(params["appearance"])
        geom = frame_geometry(
            verts_obs, statics.faces, params["so3"], params["scale"], colors,
            statics.vf_incidence, statics.vf_valid, K, E, cfg.img_size,
            cfg.sigma, 0.0,
        )
        return geom

    geom, _ = _time(s_geom, (params,), n, "geometry (LBS+table+boxes)")

    # --- stage 2: per-face shading
    @jax.jit
    def s_shade(params, geom):
        sh_cfg = cfg.module_cfg("shadow")
        face_sh = M.shadow_apply(params["shadow"], sh_cfg, geom.table[:, 19:22])[:, 0] * 2.0
        return geom.table.at[:, 22].set(face_sh)

    table, _ = _time(s_shade, (params, geom), n, "per-face shadow MLP")

    # --- stage 3: binning
    @jax.jit
    def s_bin(geom):
        ub = geom.union_box
        return bin_sorted(
            ub[0], ub[1], ub[2], ub[3], geom.depth, geom.valid, cfg.img_size,
            max_tiles_per_primitive=cfg.max_tiles_per_gaussian,
            buffer_factor=4, active_cap=cfg.active_tile_cap,
            flag_boxes=(
                (geom.sx0, geom.sx1, geom.sy0, geom.sy1, geom.valid_splat),
                (geom.mx0, geom.mx1, geom.my0, geom.my1, geom.valid_mesh),
            ),
            band0=cfg.binning_band0, overflow_cap=overflow_cap,
        )

    bins, _ = _time(s_bin, (geom,), n, "binning (sort+segments)")
    bins = bins._replace(num_tiles_x=int(bins.num_tiles_x),
                         num_tiles_y=int(bins.num_tiles_y))
    print(f"{'':28s} n_active={int(bins.n_active)} "
          f"dropped={int(bins.telemetry.total_dropped())}")

    # --- stage 4: entry gather + flag folds
    @jax.jit
    def s_gather(table, bins):
        entries = table[bins.order].T
        entries = entries.at[5].multiply(bins.entry_splat)
        entries = entries.at[18].multiply(bins.entry_mesh)
        return entries

    entries, _ = _time(s_gather, (table, bins), n, "entry gather+flags")

    # --- stage 5: frame kernel
    @jax.jit
    def s_kernel(entries, bins):
        return _frame_call(
            entries, bins.active_id, bins.seg_start, bins.seg_count,
            bins.n_active, bins.num_tiles_x, bins.num_tiles_y, with_mesh=True,
        )

    _time(s_kernel, (entries, bins), n, "frame kernel")

    # --- stage 6: full fused path (render_frame_sorted incl. untile)
    @jax.jit
    def s_frame(table, bins):
        return render_frame_sorted(table, bins, cfg.img_size,
                                   shading0=jnp.float32(0.5), with_normal=False)

    _time(s_frame, (table, bins), n, "render_frame_sorted (full)")

    # --- ground truth: whole eval forward
    @jax.jit
    def s_full(params):
        rgb, mask, aux = gom_forward(
            params, statics, cfg, K, E, batch["cnl_gtfms"], batch["dst_Rs"],
            batch["dst_Ts"], dst_posevec=batch["dst_posevec"], i_iter=1e7,
            train=False,
        )
        return rgb, mask

    _, dt = _time(s_full, (params,), n, "FULL eval forward")
    print(f"{'':28s} = {1e3 / dt:.2f} FPS")


if __name__ == "__main__":
    main()
