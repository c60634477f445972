#!/bin/bash
# End-to-end demonstration run (VERDICT r2 item 1): the full compressed
# training schedule + every eval driver on the TPU, against the synthetic
# teacher capture.  Produces log/e2e_synthetic/* and artifacts/e2e_trained.pkl;
# E2E.md summarizes the results.
#
# Every stage runs under tools/watchdog_run.py: the TPU tunnel occasionally
# wedges client processes forever, so a stage is killed and retried when its
# own log stops growing for --stall seconds (> the worst healthy gap, a
# 5-10 min remote AOT compile).  The train stage retries with --resume so it
# continues from the latest checkpoint.
#
#   bash tools/run_e2e.sh 2>&1 | tee /tmp/e2e_run.log
set -e
export JAX_COMPILATION_CACHE_DIR=~/.cache/jax_gomavatar
CFG=configs/exps/e2e_synthetic.yaml
DIR=log/e2e_synthetic
CKPT=$DIR/checkpoints
WD="python tools/watchdog_run.py --stall 1800 --retries 4"

[ -d data/e2e/train ] || python tools/make_e2e_data.py --out data/e2e

echo "=== train (6000 iters, subdivision @2001, kick-ins 2500/3000) ==="
$WD --log $DIR/log.txt --retry-arg=--resume -- python train.py --cfg $CFG

echo "=== resume check: replay subdivision, restore, +100 iters ==="
$WD --log $DIR/log.txt -- python train.py --cfg $CFG --resume --max_iters 6100

echo "=== eval: novel view (held-out 70deg camera, snapshot protocol) ==="
$WD --log $DIR/log_eval_view.txt -- python eval.py --cfg $CFG --type view

echo "=== eval: train views (ZJU evaluator) ==="
$WD --log $DIR/log_eval_train.txt -- python eval.py --cfg $CFG --type train

echo "=== eval: freeview orbit ==="
$WD --log $DIR/log_eval_freeview.txt -- python eval.py --cfg $CFG --type freeview --n_frames 30

echo "=== test-time pose refinement (6 test frames) ==="
$WD --log $DIR/log_pose.txt -- python train_pose.py --cfg $CFG --max_frames 6

echo "=== eval with refined poses chained in ==="
$WD --log $DIR/log_eval_view.txt -- python eval.py --cfg $CFG --type view --pose_path $CKPT/pose.pkl

echo "=== export trained artifact for bench.py ==="
: > /tmp/export_trained.log
$WD --log /tmp/export_trained.log -- bash -c "python tools/export_trained.py >> /tmp/export_trained.log 2>&1"
cat /tmp/export_trained.log

echo "ALL E2E STAGES DONE"
