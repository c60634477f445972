"""Export the trained E2E avatar into a small committed artifact that
bench.py can load (VERDICT r2 item 6: bench on a TRAINED checkpoint, not an
untrained uniform-albedo scene).

Reads the latest checkpoint of configs/exps/e2e_synthetic.yaml, converts
params to numpy and packs one representative animation frame (pose + camera)
so the benchmark needs neither the training data nor the checkpoint tree.

    python tools/export_trained.py [--cfg configs/exps/e2e_synthetic.yaml]
                                   [--out artifacts/e2e_trained.pkl]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="configs/exps/e2e_synthetic.yaml")
    ap.add_argument("--out", default="artifacts/e2e_trained.pkl")
    ap.add_argument("--frame", type=int, default=0)
    args = ap.parse_args()

    import jax

    from gomavatar_tpu.config import make_cfg
    from gomavatar_tpu.trainer import Trainer
    from gomavatar_tpu.data.dataset import TrainDataset

    cfg = make_cfg(args.cfg)
    dataset = TrainDataset(
        cfg["dataset"]["train"]["dataset_path"], bgcolor=cfg["bgcolor"],
        target_size=cfg["img_size"],
    )
    trainer = Trainer(cfg, dataset.get_canonical_info())
    it = trainer.load_for_eval(os.path.join(cfg["save_dir"], "checkpoints"))
    item = dataset[args.frame]

    to_np = lambda t: jax.tree_util.tree_map(np.asarray, t)
    blob = {
        "iter": it,
        "phase": trainer.phase,
        "model_cfg": dict(cfg["model"]),
        "params": to_np(trainer.params),
        # the mesh rebuilds from synthetic_body + subdivision replay; keep a
        # shape fingerprint to detect generator drift
        "num_faces": int(trainer.gom_cfg.num_faces),
        "frame": {
            k: np.asarray(item[k])
            for k in ("K", "E", "cnl_gtfms", "dst_Rs", "dst_Ts", "dst_posevec")
        },
        "body": {"n_rings": 144, "n_seg": 48},
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump(blob, f)
    mb = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out} ({mb:.1f} MB, iter {it}, {blob['num_faces']} faces)")


if __name__ == "__main__":
    main()
