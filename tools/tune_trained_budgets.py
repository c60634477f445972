"""Tune eval-path tile budgets against the TRAINED avatar.

The untrained flagship's uniform splats fit max_tiles_per_gaussian=16 /
band0=4 with zero drops, but the trained E2E avatar learns larger scales
(bench gate: 77 entries dropped).  This sweeps the budget knobs on the
trained scene and prints, per setting: every telemetry counter and the
timed full-forward ms — so the promoted default is the cheapest
zero-drop point, measured, not guessed.

    python tools/tune_trained_budgets.py
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_gomavatar")
)

import jax
import jax.numpy as jnp

def main():
    from gomavatar_tpu.models.gom import gom_forward
    from bench import _trained_scene  # loads artifacts/e2e_trained.npz

    params, statics, gom_cfg, fr, _it = _trained_scene()

    settings = [
        # (max_tiles_per_gaussian, band0, active_tile_cap)
        (16, 4, 512),   # current default (bench gate trips: 77 dropped)
        (24, 4, 512),
        (24, 6, 512),
        (32, 4, 512),
        (32, 8, 512),
    ]
    for mtg, band0, cap in settings:
        cfg = dataclasses.replace(
            gom_cfg,
            max_tiles_per_gaussian=mtg,
            binning_band0=band0,
            active_tile_cap=cap,
        )

        def forward(params, statics, K, E, cnl_gtfms, dst_Rs, dst_Ts, dst_posevec):
            rgb, mask, aux = gom_forward(
                params, statics, cfg, K, E, cnl_gtfms, dst_Rs, dst_Ts,
                dst_posevec=dst_posevec, i_iter=1e7, train=False,
            )
            tel = aux["binning"]
            return (rgb, mask, tel.dropped_budget, tel.dropped_buffer,
                    aux.get("tile_overflow", 0))

        fn = jax.jit(forward)
        args = (params, statics, fr["K"], fr["E"], fr["cnl_gtfms"],
                fr["dst_Rs"], fr["dst_Ts"], fr["dst_posevec"])
        out = jax.block_until_ready(fn(*args))
        d_budget, d_buffer, t_over = int(out[2]), int(out[3]), int(out[4])
        for _ in range(5):
            out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        n = 30
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / n * 1e3
        print(
            f"mtg={mtg:3d} band0={band0} cap={cap}: "
            f"dropped_budget={d_budget} dropped_buffer={d_buffer} "
            f"tile_overflow={t_over}  {ms:7.3f} ms  {1e3/ms:6.1f} FPS",
            flush=True,
        )


if __name__ == "__main__":
    main()
