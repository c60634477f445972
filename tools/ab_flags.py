"""A/B the experiment env flags on hardware (VERDICT r3/r4: every surviving
experiment flag needs a recorded verdict — promote to default or delete).

The flags are module-level constants read at import, so every setting runs
in a fresh subprocess.  Eval flags time the fused 512^2 forward on the
subdivided flagship; the train flag times the no-LPIPS optimizer step.

    python tools/ab_flags.py              # full matrix -> markdown table
    python tools/ab_flags.py --worker eval  (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_gomavatar")
)


def worker_eval(iters: int) -> dict:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from gomavatar_tpu.models.gom import gom_forward

    params, statics, cfg, batch, _ = _flagship()

    @jax.jit
    def fwd(params):
        rgb, mask, aux = gom_forward(
            params, statics, cfg, batch["K"], batch["E"], batch["cnl_gtfms"],
            batch["dst_Rs"], batch["dst_Ts"], dst_posevec=batch["dst_posevec"],
            i_iter=1e7, train=False,
        )
        return rgb, mask

    rgb, mask = fwd(params)
    jax.block_until_ready(rgb)
    for _ in range(5):
        out = fwd(params)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    return {"ms": ms, "rgb_sum": float(jnp.sum(rgb)), "mask_sum": float(jnp.sum(mask))}


def worker_train(iters: int) -> dict:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from gomavatar_tpu.optim import make_optimizer
    from gomavatar_tpu.trainer import make_train_step

    params, statics, gom_cfg, batch, cfg = _flagship()
    tcfg = cfg["train"]
    loss_cfg = tcfg["losses"]
    loss_cfg["laplacian"]["coeff_observation"] = 10.0
    loss_cfg["normal"]["coeff_mask"] = 1.0
    loss_cfg["normal"]["mask_dilate"] = True
    loss_cfg["normal"]["coeff_consist"] = 0.1
    loss_cfg["color_consist"]["coeff"] = 0.05
    loss_cfg["lpips"]["coeff"] = 0.0

    tx = make_optimizer(tcfg, params)
    opt_state = tx.init(params)
    step = make_train_step(gom_cfg, loss_cfg, tx)
    p, o, total, _ = step(params, opt_state, statics, None, batch, jnp.float32(0.0))
    jax.block_until_ready(p)
    t0 = time.perf_counter()
    for i in range(iters):
        p, o, total, _ = step(p, o, statics, None, batch, jnp.float32(i))
    jax.block_until_ready(p)
    ms = (time.perf_counter() - t0) / iters * 1e3
    return {"ms": ms, "loss": float(total)}


MATRIX = [
    # (flag, values, worker, default).  FRAME_GROUP / EVAL_CUMSUM_TERMS /
    # WIDE_GATHER were adjudicated + REMOVED in round 5 (winners hardcoded
    # in ops/frame_render.py; tables in BENCH_NOTES) — only the surviving
    # flag remains sweepable here.  GOMAVATAR_LPIPS_CONV has its own sweep
    # (tools/profile_lpips.py).
    ("GOMAVATAR_SOFT_SAT_OFF", ["0", "1"], "train", "0"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", choices=["eval", "train"], default=None)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--only", default=None, help="substring filter on flag names")
    args = ap.parse_args()

    if args.worker:
        res = (worker_eval if args.worker == "eval" else worker_train)(args.iters)
        print("ABRESULT " + json.dumps(res), flush=True)
        return

    for flag, values, worker, default in MATRIX:
        if args.only and args.only not in flag:
            continue
        print(f"\n### {flag} (worker={worker}, default={default})")
        print("| value | ms | notes |")
        print("|---|---|---|")
        for v in values:
            env = dict(os.environ)
            env[flag] = v
            iters = str(args.iters if worker == "eval" else max(10, args.iters // 3))
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker", worker,
                 "--iters", iters],
                capture_output=True, text=True, env=env, timeout=3600,
            )
            line = next(
                (l for l in r.stdout.splitlines() if l.startswith("ABRESULT ")), None
            )
            if line is None:
                print(f"| {v} | FAILED | {r.stderr[-300:].strip()} |")
                continue
            d = json.loads(line[len("ABRESULT "):])
            notes = []
            if "rgb_sum" in d:
                notes.append(f"rgb_sum={d['rgb_sum']:.2f}")
            if "loss" in d:
                notes.append(f"loss={d['loss']:.4f}")
            star = " (default)" if v == default else ""
            print(f"| {v}{star} | {d['ms']:.2f} | {' '.join(notes)} |", flush=True)


if __name__ == "__main__":
    main()
