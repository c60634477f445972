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
import time

import jax

BASELINE_FPS = 43.0


def main():
    from __graft_entry__ import entry

    forward, args = entry()
    fn = jax.jit(forward)
    out = fn(*args)
    jax.block_until_ready(out)  # compile

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
