"""Generate E2E.md from a finished end-to-end run (tools/run_e2e.sh).

Parses log/e2e_synthetic/{log.txt, log_pose.txt, log_eval_*.txt} (and the
no-subdivision control run's logs next to them) into: per-phase loss
trajectory, periodic eval metric curves, subdivision/resume events,
binning-drop accounting, end-to-end it/s, final eval tables over all five
protocols, the coarse-to-fine crossover check, the subdivision ablation,
and the noisy-pose raw -> refined recovery table.
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


def parse_eval_log(path):
    """All driver invocations appended to one eval log -> list of non-empty
    run dicts (metrics / drops / refined-poses marker).  Empty runs (e.g. a
    watchdog attempt killed before any output) are filtered BEFORE the
    caller enumerates, so run indices stay contiguous (ADVICE r4)."""
    runs, cur = [], None
    for line in open(path):
        if "Platform 'axon'" in line or "Platform 'cpu'" in line:
            if cur:
                runs.append(cur)
            cur = {}
            continue
        if cur is None:
            cur = {}
        m = re.search(r"metrics: (\{.*\})", line)
        if m:
            cur["metrics"] = ast.literal_eval(m.group(1))
        m = re.search(r"render budget overflow on \d+ frames \((\d+) entries total\)", line)
        if m:
            cur["drops"] = int(m.group(1))
        if "zero dropped entries" in line:
            cur["drops"] = 0
        if "using refined poses" in line:
            cur["refined"] = True
    if cur:
        runs.append(cur)
    return [r for r in runs if r]


def fmt_float(v):
    return f"{v:.4f}" if isinstance(v, float) else str(v)


def metric_table(rows, keys, head="iter"):
    out = [f"| {head} | " + " | ".join(keys) + " |",
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
    subdiv_iters = [it for kind, it, _ in events if kind == "subdivide" and it > 0]

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
    w("# E2E — full compressed training schedule on TPU (round 5)")
    w("")
    w("The complete ZJU recipe (subdivision, pose-refinement kick-in,")
    w("non-rigid Hann anneal, LPIPS loss, exponential lr decay) compressed")
    w("50x at the reference's milestone RATIOS and run END TO END through")
    w("the real `cli/train.py` on the TPU, against the 512^2 synthetic")
    w("teacher capture (`tools/make_e2e_data.py`; the ground truth is")
    w("realizable by the model class, so converged PSNR measures the")
    w("training pipeline itself).  Reference behavior being matched:")
    w("train.py:309-386 + eval.py:183-365 + train_pose.py:217-288.")
    w("Reproduce with `bash tools/run_e2e.sh`.")
    w("")
    w("## Schedule events")
    w("")
    for kind, it, info in events:
        if not kind.startswith("eval:"):
            # the resume check replays subdivision at its own iter 0 before
            # restoring; label it so it doesn't read like a schedule event
            tag = " (resume-check replay)" if kind == "subdivide" and it == 0 else ""
            w(f"* iter {it}: **{kind}** ({info}){tag}")
    w("* pose-refinement kick-in: iter 2000; non-rigid Hann anneal: 3000 -> 4000 (config)")
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
        # flag the known in-train compositing mismatch if this run predates
        # the fix: under train.random_bgcolor each GT item carries its own
        # random background, but evaluate_on used to composite predictions
        # over the static eval background — scoring the background delta,
        # not the model (cli/train.py now composites over the item's own bg)
        if split == "test_on_train" and evals.get("test"):
            tr = max(d.get("psnr", 0) for _, d in rows)
            te = max(d.get("psnr", 0) for _, d in evals["test"])
            if te - tr > 8:
                w("")
                w("*This run predates the `evaluate_on` background fix —"
                  " the numbers above measure the background mismatch, not"
                  " the model.*")

    # ---- coarse-to-fine crossover (VERDICT r4 item 1) ----
    test_rows = evals.get("test", [])
    if test_rows and subdiv_iters:
        sub_at = subdiv_iters[0]
        pre = [(it, d["psnr"]) for it, d in test_rows if it <= sub_at and "psnr" in d]
        post = [(it, d["psnr"]) for it, d in test_rows if it > sub_at and "psnr" in d]
        if pre and post:
            pre_peak = max(pre, key=lambda x: x[1])
            post_peak = max(post, key=lambda x: x[1])
            gain = post_peak[1] - pre_peak[1]
            verdict = "EXCEEDS" if gain > 0 else "DOES NOT EXCEED"
            w("")
            w("## Coarse-to-fine crossover (held-out PSNR)")
            w("")
            w(f"* pre-subdivision peak: **{pre_peak[1]:.2f} dB** @ iter {pre_peak[0]}")
            w(f"* post-subdivision best: **{post_peak[1]:.2f} dB** @ iter {post_peak[0]}"
              f" (final: {post[-1][1]:.2f} @ {post[-1][0]})")
            w(f"* the post-subdivision phase **{verdict}** the pre-subdivision"
              f" peak ({gain:+.2f} dB)")

    # ---- final eval drivers (log_eval_{tag}.txt) ----
    final_rows = []
    for tag_name in ("view", "train", "freeview", "pose", "pose_mdm",
                     "view_noisy_raw", "view_noisy_refined"):
        path = os.path.join(L, f"log_eval_{tag_name}.txt")
        if not os.path.exists(path):
            continue
        # one appended log section per driver invocation, delimited by the
        # JAX platform banner each process prints at startup; within a run
        # the budget summary precedes the optional metrics line (freeview
        # and pose_mdm have no GT, hence no metrics)
        runs = parse_eval_log(path)
        for j, r in enumerate(runs):
            tag = tag_name if j == 0 else (
                f"{tag_name}+refined_poses" if r.get("refined") else f"{tag_name}#{j}")
            d = dict(r.get("metrics", {}))
            d["dropped_entries"] = r.get("drops", "?")
            final_rows.append((tag, d))
    if final_rows:
        w("")
        w("## Final eval (cli/evaluate.py, from the trained checkpoint — all five `--type` protocols)")
        w("")
        keys = sorted({k for _, d in final_rows for k in d})
        w(metric_table(final_rows, keys, head="type"))

    # ---- subdivision ablation: the control run with subdivision OFF ----
    ctrl_dir = L + "_nosubdiv"
    ctrl_view = os.path.join(ctrl_dir, "log_eval_view.txt")
    if os.path.exists(ctrl_view):
        runs = parse_eval_log(ctrl_view)
        ctrl = next((r["metrics"] for r in runs if "metrics" in r), None)
        main_view = dict(final_rows).get("view", {})
        if ctrl and "psnr" in main_view:
            diff = main_view["psnr"] - ctrl["psnr"]
            w("")
            w("## Subdivision ablation (control run: identical schedule, subdivision OFF)")
            w("")
            w(metric_table(
                [("with subdivision", main_view),
                 ("no subdivision (control)", ctrl)],
                sorted({k for k in list(ctrl) + list(main_view) if k != "dropped_entries"}),
                head="run"))
            w("")
            w(f"*Subdivision is worth **{diff:+.2f} dB** held-out PSNR on this"
              " capture (reference behavior: train.py:341-346 + the"
              " subdivide_iters milestone in every shipped exp yaml).*")

    # ---- test-time pose refinement (log_pose.txt) ----
    pose_path = os.path.join(L, "log_pose.txt")
    if os.path.exists(pose_path):
        # watchdog retries append to the same log; keep only the last
        # occurrence of each stage (the completed attempt)
        pose_by_stage = {}
        for line in open(pose_path):
            m = re.search(r"eval \[(\S+)\]: (\{.*\})", line)
            if m:
                pose_by_stage[m.group(1)] = ast.literal_eval(m.group(2))
        pose_rows = list(pose_by_stage.items())
        if pose_rows:
            w("")
            w("## Test-time pose refinement on the PERTURBED test split (cli/train_pose.py)")
            w("")
            w("The test split's recorded poses carry synthetic capture error")
            w("(`make_e2e_data.py --pose_noise`: sigma 0.03 rad/joint +")
            w("0.02 m root + 0.01 rad global); `raw` renders with those")
            w("inaccurate poses, `refined` after per-frame optimization —")
            w("the reference's recovery scenario (train_pose.py:217-288).")
            w("")
            keys = sorted({k for _, d in pose_rows for k in d})
            w(metric_table(pose_rows, keys, head="stage"))
            if "raw" in pose_by_stage and "refined" in pose_by_stage:
                rec = pose_by_stage["refined"].get("psnr", 0) - pose_by_stage["raw"].get("psnr", 0)
                w("")
                w(f"*Refinement recovers **{rec:+.2f} dB** over the raw perturbed poses.*")
    w("")
    print("\n".join(lines))
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"\n(wrote {args.out})")


if __name__ == "__main__":
    main()
