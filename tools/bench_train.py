"""Training-step throughput benchmark on TPU.

Measures the full optimizer step (forward with all losses, backward through
both Pallas rasterizers, Adam) on the flagship model at 512x512 — with and
without the LPIPS term (the VGG conv stack dominates when enabled).

    python tools/bench_train.py [--band0 4] [--active_cap 512]

(--band0 enables two-band train binning; --active_cap enables the
compacted-tile kernel grids — the perf A/B knobs of GoMConfig.)
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import _mfu


def main():
    from __graft_entry__ import _flagship
    from gomavatar_tpu.optim import make_optimizer
    from gomavatar_tpu.trainer import make_train_step
    from gomavatar_tpu.models import lpips as lpips_lib

    ap = argparse.ArgumentParser()
    ap.add_argument("--band0", type=int, default=0, help="0 = single-band")
    ap.add_argument("--active_cap", type=int, default=0, help="0 = full raster")
    ap.add_argument("--mtg", type=int, default=0, help="0 = config default")
    ap.add_argument("--skip_lpips", action="store_true",
                    help="A/B mode: the VGG stack's cost is independent of "
                    "the binning/budget knobs and its compile dominates the "
                    "run — skip it when only the knob delta matters")
    flags = ap.parse_args()

    params, statics, gom_cfg, batch, cfg = _flagship()
    if flags.band0 or flags.active_cap or flags.mtg:
        gom_cfg = dataclasses.replace(
            gom_cfg,
            binning_band0_train=flags.band0 or None,
            train_active_tile_cap=flags.active_cap or None,
            max_tiles_per_gaussian=flags.mtg or gom_cfg.max_tiles_per_gaussian,
        )
        print(f"flags: band0={gom_cfg.binning_band0_train} "
              f"active_cap={gom_cfg.train_active_tile_cap} "
              f"mtg={gom_cfg.max_tiles_per_gaussian}", flush=True)
    tcfg = cfg["train"]
    loss_cfg = tcfg["losses"]
    loss_cfg["laplacian"]["coeff_observation"] = 10.0
    loss_cfg["normal"]["coeff_mask"] = 1.0
    loss_cfg["normal"]["mask_dilate"] = True
    loss_cfg["normal"]["coeff_consist"] = 0.1
    loss_cfg["color_consist"]["coeff"] = 0.05

    tx = make_optimizer(tcfg, params)
    opt_state = tx.init(params)

    cases = [(False, "no-LPIPS")] if flags.skip_lpips else [(False, "no-LPIPS"), (True, "with-LPIPS")]
    for use_lpips, label in cases:
        loss_cfg["lpips"]["coeff"] = 1.0 if use_lpips else 0.0
        lp = lpips_lib.load_lpips("vgg")[0] if use_lpips else None
        step = make_train_step(gom_cfg, loss_cfg, tx)
        p, o, total, _ = step(params, opt_state, statics, lp, batch, jnp.float32(0.0))
        jax.block_until_ready(p)
        n = 10
        t0 = time.perf_counter()
        for i in range(n):
            p, o, total, _ = step(p, o, statics, lp, batch, jnp.float32(i))
        jax.block_until_ready(p)
        dt = (time.perf_counter() - t0) / n
        print(f"train step ({label}): {dt * 1000:.2f} ms -> {1 / dt:.1f} it/s", flush=True)
        flops, nbytes = _mfu.compiled_cost(
            step, (p, o, statics, lp, batch, jnp.float32(0.0)))
        peaks = _mfu.device_peaks()
        if flops is not None:
            print("  " + _mfu.fmt_row(f"cost ({label})", dt * 1e3, flops,
                                      nbytes, *peaks), flush=True)


if __name__ == "__main__":
    main()
