"""Export the trained E2E avatar into a small committed artifact that
bench.py can load (VERDICT r2 item 6: bench on a TRAINED checkpoint, not an
untrained uniform-albedo scene).

Reads the latest checkpoint of configs/exps/e2e_synthetic.yaml, converts
params to numpy and packs one representative animation frame (pose + camera)
so the benchmark needs neither the training data nor the checkpoint tree.

Format: a flat ``.npz`` (ADVICE r4: no pickle.load on a checked-in file) —
``meta`` holds the JSON scalars/model-config, ``params/<path>`` the
flattened param pytree, ``frame/<key>`` the packed frame.

    python tools/export_trained.py [--cfg configs/exps/e2e_synthetic.yaml]
                                   [--out artifacts/e2e_trained.npz]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def flatten_params(params, prefix="params"):
    """Nested dicts/lists-of-arrays -> {"params/a/0/b": np.ndarray}.  The
    param pytree is nested dicts except the MLP modules' ``layers``, which
    are LISTS of per-layer dicts (models/modules.py) — list positions become
    integer path segments so nothing ends up an object array in the npz."""
    out = {}
    items = params.items() if isinstance(params, dict) else enumerate(params)
    for k, v in items:
        key = f"{prefix}/{k}"
        if isinstance(v, (dict, list, tuple)):
            out.update(flatten_params(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_params(npz) -> dict:
    params: dict = {}
    for key in npz.files:
        if not key.startswith("params/"):
            continue
        parts = key.split("/")[1:]
        d = params
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = npz[key]

    def listify(d):
        """All-integer-keyed dicts were lists before flattening."""
        if not isinstance(d, dict):
            return d
        if d and all(k.isdigit() for k in d):
            return [listify(d[k]) for k in sorted(d, key=int)]
        return {k: listify(v) for k, v in d.items()}

    return listify(params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="configs/exps/e2e_synthetic.yaml")
    ap.add_argument("--out", default="artifacts/e2e_trained.npz")
    ap.add_argument("--frame", type=int, default=0)
    args = ap.parse_args()

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

    meta = {
        "iter": int(it),
        "phase": int(trainer.phase),
        "model_cfg": dict(cfg["model"]),
        # the mesh rebuilds from synthetic_body + subdivision replay; keep a
        # shape fingerprint to detect generator drift
        "num_faces": int(trainer.gom_cfg.num_faces),
        "body": {"n_rings": 144, "n_seg": 48},
    }
    arrays = flatten_params(trainer.params)
    arrays.update(
        {
            f"frame/{k}": np.asarray(item[k])
            for k in ("K", "E", "cnl_gtfms", "dst_Rs", "dst_Ts", "dst_posevec")
        }
    )
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez(args.out, meta=json.dumps(meta), **arrays)
    mb = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out} ({mb:.1f} MB, iter {it}, {meta['num_faces']} faces)")


if __name__ == "__main__":
    main()
