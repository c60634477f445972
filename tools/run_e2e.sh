#!/bin/bash
# End-to-end demonstration run (VERDICT r2 item 1): the full compressed
# training schedule + every eval driver on the TPU, against the synthetic
# teacher capture.  Produces log/e2e_synthetic/* and artifacts/e2e_trained.pkl;
# E2E.md summarizes the results.
#
#   bash tools/run_e2e.sh 2>&1 | tee /tmp/e2e_run.log
set -e
export JAX_COMPILATION_CACHE_DIR=~/.cache/jax_gomavatar
CFG=configs/exps/e2e_synthetic.yaml
CKPT=log/e2e_synthetic/checkpoints

[ -d data/e2e/train ] || python tools/make_e2e_data.py --out data/e2e

echo "=== train (6000 iters, subdivision @2001, kick-ins 2500/3000) ==="
python train.py --cfg $CFG

echo "=== resume check: replay subdivision, restore, +100 iters ==="
python train.py --cfg $CFG --resume --max_iters 6100

echo "=== eval: novel view (held-out 70deg camera, snapshot protocol) ==="
python eval.py --cfg $CFG --type view

echo "=== eval: train views (ZJU evaluator) ==="
python eval.py --cfg $CFG --type train

echo "=== eval: freeview orbit ==="
python eval.py --cfg $CFG --type freeview --n_frames 30

echo "=== test-time pose refinement (6 test frames) ==="
python train_pose.py --cfg $CFG --max_frames 6

echo "=== eval with refined poses chained in ==="
python eval.py --cfg $CFG --type view --pose_path $CKPT/pose.pkl

echo "=== export trained artifact for bench.py ==="
python tools/export_trained.py

echo "ALL E2E STAGES DONE"
