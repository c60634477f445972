"""Benchmark: full novel-view render FPS at 512x512 on the flagship model.

Measures the COMPLETE forward (pose refine -> non-rigid -> FK/LBS -> Steiner
covariances -> Pallas splat -> vertex normals -> mesh raster -> shadow MLP ->
albedo x shading), i.e. everything a novel-view eval frame costs — not just
the splat pass.

Baseline: the GoMAvatar paper reports ~43 FPS on an RTX-3090-class GPU
(arXiv 2404.07991; the repo itself ships no timing — BASELINE.md).
Prints ONE JSON line for the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

# persistent compile cache: the 55k-face Pallas/XLA programs take minutes to
# build through the remote TPU compiler; repeat bench runs should not
jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_gomavatar")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_FPS = 43.0

TRAINED = os.path.join(os.path.dirname(__file__), "artifacts", "e2e_trained.npz")


def _trained_scene():
    """(params, statics, gom_cfg, frame, iter) from the TRAINED E2E avatar
    (tools/export_trained.py — flat npz, no pickle on a checked-in file):
    learned albedo/geometry/so3/scale + all MLPs, a real animation pose —
    representative splat scales and tile occupancy, unlike the uniform
    untrained flagship (VERDICT r2 weak #2)."""
    import json

    import numpy as np
    import jax.numpy as jnp

    from gomavatar_tpu.models.gom import init_gom, subdivide_gom
    from gomavatar_tpu.models.smpl import synthetic_body

    npz = np.load(TRAINED)
    meta = json.loads(str(npz["meta"]))
    info = synthetic_body(**meta["body"])
    params, statics, gom_cfg = init_gom(
        jax.random.PRNGKey(0), meta["model_cfg"], info
    )
    for _ in range(meta["phase"]):
        params, statics, gom_cfg = subdivide_gom(params, statics, gom_cfg)
    assert gom_cfg.num_faces == meta["num_faces"], (
        f"mesh generator drift: {gom_cfg.num_faces} vs {meta['num_faces']}"
    )
    from tools.export_trained import unflatten_params

    params = jax.tree_util.tree_map(jnp.asarray, unflatten_params(npz))
    fr = {
        k.split("/", 1)[1]: jnp.asarray(npz[k])
        for k in npz.files
        if k.startswith("frame/")
    }
    return params, statics, gom_cfg, fr, meta["iter"]


def _trained_entry():
    """(fn, args, n_faces, iter) — jittable full forward on the trained scene."""
    from gomavatar_tpu.models.gom import gom_forward

    params, statics, gom_cfg, fr, it = _trained_scene()

    def forward(params, statics, K, E, cnl_gtfms, dst_Rs, dst_Ts, dst_posevec):
        rgb, mask, aux = gom_forward(
            params, statics, gom_cfg, K, E, cnl_gtfms, dst_Rs, dst_Ts,
            dst_posevec=dst_posevec, i_iter=1e7, train=False,
        )
        tel = aux.get("binning")
        dropped = tel.total_dropped() + aux.get("tile_overflow", 0) if tel is not None else 0
        return rgb, mask, dropped

    args = (
        params, statics, fr["K"], fr["E"], fr["cnl_gtfms"],
        fr["dst_Rs"], fr["dst_Ts"], fr["dst_posevec"],
    )
    return forward, args, gom_cfg.num_faces, it


def _regression_gate():
    """Fused-eval vs unfused-kernel agreement on a small scene, run on the
    bench backend BEFORE timing — every driver bench re-verifies kernel
    correctness on hardware (the pytest suite pins CPU and exercises the
    Pallas paths only in interpreter mode)."""
    import numpy as np
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from gomavatar_tpu.models.gom import gom_forward

    # small scene: the gate compiles BOTH the fused eval kernel and the
    # custom-VJP train kernels — keep it small so the timed flagship run
    # dominates the bench wall-clock
    params, statics, cfg, batch, _ = _flagship(
        img_size=(64, 64), subdivide=False, rings=(16, 18)
    )
    args = (batch["K"], batch["E"], batch["cnl_gtfms"], batch["dst_Rs"], batch["dst_Ts"])
    rgb_f, mask_f, _ = gom_forward(
        params, statics, cfg, *args, dst_posevec=batch["dst_posevec"], i_iter=1e7, train=False
    )
    rgb_u, mask_u, aux = gom_forward(
        params, statics, cfg, *args, dst_posevec=batch["dst_posevec"], i_iter=1e7, train=True
    )
    # fraction-of-pixels criterion: reassociation near the T<1e-4
    # termination threshold can flip a borderline entry on isolated pixels
    # (a discrete ~1e-3 jump; see tools/verify_tpu.py)
    for nm, a, b in (("rgb", rgb_f, rgb_u), ("mask", mask_f, mask_u)):
        frac = float(jnp.mean((jnp.abs(a - b) <= 1e-4).astype(jnp.float32)))
        worst = float(jnp.max(jnp.abs(a - b)))
        assert frac > 0.9995 and worst < 5e-3, (
            f"fused/unfused kernels disagree on {nm}: {1-frac:.2e} px > 1e-4, worst {worst:.3g}"
        )
    assert int(aux["binning"].total_dropped()) == 0, "binning dropped entries"
    assert bool(np.isfinite(np.asarray(rgb_f)).all())


def main():
    from __graft_entry__ import entry

    _regression_gate()
    if os.path.exists(TRAINED):
        forward, args, n_faces, it = _trained_entry()
        print(f"bench scene: TRAINED e2e avatar (iter {it}, {n_faces} faces)", file=sys.stderr)
    else:
        forward, args = entry()
        print("bench scene: untrained synthetic flagship (no trained artifact)", file=sys.stderr)
    fn = jax.jit(forward)
    out = fn(*args)
    jax.block_until_ready(out)  # compile
    # loud budget gate on the TIMED scene (VERDICT r2: eval/bench must not
    # silently crop over-budget frames)
    assert int(out[2]) == 0, (
        f"binning dropped {int(out[2])} entries on the bench scene — "
        "raise model.max_tiles_per_gaussian / active_tile_cap"
    )

    # warm-up
    for _ in range(5):
        out = fn(*args)
    jax.block_until_ready(out)

    n_it = 50
    t0 = time.perf_counter()
    for _ in range(n_it):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_it
    fps = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": "novel_view_render_fps_512",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
