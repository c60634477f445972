"""Generate E2E.md from a finished end-to-end run (tools/run_e2e.sh).

Parses log/e2e_synthetic/{log.txt, log_pose.txt, log_eval_*.txt} into:
per-phase loss trajectory, periodic eval metric curves, subdivision/resume
events, binning-drop accounting, end-to-end it/s, final eval tables, and
the train_pose before/after comparison.
"""

from __future__ import annotations

import argparse
import ast
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_train_log(path):
    iters = []  # (iter, it/s, total, {term: val})
    events = []
    with open(path) as f:
        for line in f:
            m = re.search(
                r"iter (\d+) \(([\d.]+) it/s\) - loss: ([\d.]+) \((.*)\)", line
            )
            if m:
                terms = {}
                for kv in m.group(4).split(", "):
                    k, _, v = kv.partition(": ")
                    terms[k] = float(v)
                iters.append((int(m.group(1)), float(m.group(2)), float(m.group(3)), terms))
            m = re.search(r"subdividing at iter (\d+): (\d+) -> (\d+) faces", line)
            if m:
                events.append(("subdivide", int(m.group(1)), f"{m.group(2)} -> {m.group(3)} faces"))
            m = re.search(r"resumed from (\S+) \(iter (\d+), phase (\d+)\)", line)
            if m:
                events.append(("resume", int(m.group(2)), f"phase {m.group(3)}"))
            m = re.search(r"evaluate on (\S+): (\{.*\})", line)
            if m:
                events.append(("eval:" + m.group(1), iters[-1][0] if iters else 0,
                               ast.literal_eval(m.group(2))))
    return iters, events


def fmt_float(v):
    return f"{v:.4f}" if isinstance(v, float) else str(v)


def metric_table(rows, keys):
    out = ["| iter | " + " | ".join(keys) + " |",
           "|" + "---|" * (len(keys) + 1)]
    for it, d in rows:
        out.append("| " + str(it) + " | " + " | ".join(fmt_float(d.get(k, "-")) for k in keys) + " |")
    return "\n".join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log_dir", default="log/e2e_synthetic")
    ap.add_argument("--out", default="E2E.md")
    args = ap.parse_args()
    L = args.log_dir

    iters, events = parse_train_log(os.path.join(L, "log.txt"))
    assert iters, "no training iterations found"

    # loss trajectory at a readable cadence
    milestones = sorted({it for it, *_ in iters} & set(
        list(range(0, 10**7, 500))
    ) | {iters[0][0], iters[-1][0]})
    by_iter = {it: (rate, tot, terms) for it, rate, tot, terms in iters}
    traj = []
    for it in milestones:
        if it in by_iter:
            rate, tot, terms = by_iter[it]
            traj.append((it, {"it/s": rate, "total": tot,
                              "rgb": terms.get("rgb"), "mask": terms.get("mask"),
                              "lpips": terms.get("lpips"),
                              "drops": terms.get("bin_drop_budget", 0)
                              + terms.get("bin_drop_buffer", 0)
                              + terms.get("bin_drop_ncmax", 0)}))

    evals = {"test_on_train": [], "test": []}
    for kind, it, payload in events:
        if kind.startswith("eval:"):
            split = kind.split(":", 1)[1]
            evals.setdefault(split, []).append((it, payload))

    drops_total = sum(
        t.get("bin_drop_budget", 0)
        + t.get("bin_drop_buffer", 0)
        + t.get("bin_drop_ncmax", 0)
        for *_, t in iters
    )
    rates = [r for _, r, _, _ in iters[2:]]

    lines = []
    w = lines.append
    w("# E2E — full compressed training schedule on TPU (round 3)")
    w("")
    w("The complete ZJU recipe (subdivision, pose-refinement kick-in,")
    w("non-rigid Hann anneal, LPIPS loss, exponential lr decay) compressed")
    w("~50x and run END TO END through the real `cli/train.py` on the v5e,")
    w("against the 512^2 synthetic teacher capture")
    w("(`tools/make_e2e_data.py`; the ground truth is realizable by the")
    w("model class, so converged PSNR measures the training pipeline")
    w("itself).  Reference behavior being matched: train.py:309-386 +")
    w("eval.py:336-365.  Reproduce with `bash tools/run_e2e.sh`.")
    w("")
    w("## Schedule events")
    w("")
    for kind, it, info in events:
        if not kind.startswith("eval:"):
            w(f"* iter {it}: **{kind}** ({info})")
    w(f"* pose-refinement kick-in: iter 2500; non-rigid Hann anneal: 3000 -> 4000 (config)")
    w(f"* binning drops across ALL logged train steps: **{int(drops_total)}**")
    if rates:
        w(f"* steady-state end-to-end throughput (host+device): "
          f"median **{sorted(rates)[len(rates)//2]:.2f} it/s**, "
          f"phase-2 last-100 median "
          f"**{sorted(rates[-100:])[len(rates[-100:])//2]:.2f} it/s**")
    w("")
    w("## Loss / throughput trajectory (every 500 iters)")
    w("")
    w(metric_table(traj, ["it/s", "total", "rgb", "mask", "lpips", "drops"]))
    for split, rows in evals.items():
        if not rows:
            continue
        w("")
        w(f"## Periodic eval: {split}")
        w("")
        keys = sorted({k for _, d in rows for k in d})
        w(metric_table(rows, keys))
    w("")
    print("\n".join(lines))
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"\n(wrote {args.out}; final-eval + pose tables appended separately)")


if __name__ == "__main__":
    main()
