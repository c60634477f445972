"""End-to-end CLI smoke tests over the synthetic dataset: train a few
iterations through the real driver, then evaluate from the checkpoint
(SURVEY.md §4: eval protocols as integration tests)."""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

from gomavatar_tpu.data.synthetic import write_synthetic_dataset


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    data_dir = write_synthetic_dataset(str(root / "data"), n_frames=3, img_hw=(48, 48))
    cfg = {
        "exp_name": "cli_smoke",
        "log_dir": str(root / "log"),
        "random_bgcolor": False,
        "bgcolor": [0.0, 0.0, 0.0],
        "img_size": [48, 48],
        "dataset": {
            "train": {"dataset_path": data_dir},
            "test_view": {"dataset_path": data_dir, "name": "snapshot", "skip": 1},
            "test_freeview": {"dataset_path": data_dir, "src_type": "zju_mocap"},
        },
        "model": {
            "img_size": [48, 48],
            "canonical_geometry": {"deform_so3": True, "deform_scale": True},
            "normal_renderer": {"name": "mesh"},
            "shadow_module": {"name": "basic"},
        },
        "pose": {"lr": 0.001, "decay": 5, "iters": 6},
        "train": {
            "total_iters": 4,
            "save_freq": 4,
            "eval_freq": 1000,
            "log_freq": 1,
            "tb_freq": 1000,
            "losses": {
                "lpips": {"coeff": 0.0},
                "laplacian": {"coeff_observation": 10.0},
                "normal": {"coeff_mask": 1.0, "mask_dilate": True, "coeff_consist": 0.1},
                "color_consist": {"coeff": 0.05},
            },
        },
    }
    cfg_path = str(root / "exp.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return {"root": root, "cfg_path": cfg_path, "data_dir": data_dir}


def run_cli(module, *args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GOMAVATAR_FORCE_CPU"] = "1"
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    return subprocess.run(
        [sys.executable, "-m", module, *args],
        capture_output=True,
        text=True,
        env=env,
        timeout=1800,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )


@pytest.fixture(scope="module")
def trained(workspace):
    """Run the train CLI once per module; every checkpoint-consuming test
    depends on this explicitly so any subset selection passes standalone."""
    r = run_cli("gomavatar_tpu.cli.train", "--cfg", workspace["cfg_path"])
    assert r.returncode == 0, r.stderr[-3000:]
    return r


def test_train_cli(workspace, trained):
    ckpts = os.listdir(str(workspace["root"] / "log" / "cli_smoke" / "checkpoints"))
    assert any(c.startswith("iter_") for c in ckpts)


def test_eval_cli_view(workspace, trained):
    r = run_cli("gomavatar_tpu.cli.evaluate", "--cfg", workspace["cfg_path"], "--type", "view")
    assert r.returncode == 0, r.stderr[-3000:]
    out = str(workspace["root"] / "log" / "cli_smoke" / "eval" / "view")
    assert len(os.listdir(out)) == 3  # one PNG per frame


def test_eval_cli_freeview(workspace, trained):
    r = run_cli(
        "gomavatar_tpu.cli.evaluate", "--cfg", workspace["cfg_path"],
        "--type", "freeview", "--n_frames", "2",
    )
    assert r.returncode == 0, r.stderr[-3000:]
    out = str(workspace["root"] / "log" / "cli_smoke" / "eval" / "freeview")
    assert len(os.listdir(out)) == 2


@pytest.fixture(scope="module")
def pose_protocol_workspace(workspace):
    """Fixtures for the two novel-pose protocols (VERDICT r4 item 3):
    a 5-frame preprocessed dir (so the MonoHuman last-1/5 split holds one
    frame), a raw-ZJU-format capture with one novel camera and flat-color
    2x-resolution JPGs (the driver smoke only needs finite metrics, not a
    teacher render), and an MDM-format pose npy."""
    from PIL import Image

    root = workspace["root"]
    pose_data = write_synthetic_dataset(str(root / "data_pose"), n_frames=5, img_hw=(48, 48))

    raw = root / "zju_raw"
    H = W = 96  # 2x the model size; ZJUTestDataset halves raw images
    focal = 0.9 * H
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1.0]])
    E_train = np.eye(4); E_train[2, 3] = 3.0
    E_novel = np.eye(4)
    E_novel[:3, :3] = np.array([[0.0, 0, 1], [0, 1, 0], [-1, 0, 0.0]])  # 90deg yaw
    E_novel[2, 3] = 3.0
    annots = {"cams": {
        "K": [K, K],
        "R": [E_train[:3, :3], E_novel[:3, :3]],
        "T": [E_train[:3, 3:4] * 1000.0, E_novel[:3, 3:4] * 1000.0],
        "D": [np.zeros((5, 1)), np.zeros((5, 1))],
    }}
    os.makedirs(str(raw), exist_ok=True)
    np.save(str(raw / "annots.npy"), annots)
    img = Image.fromarray(np.full((H, W, 3), 96, np.uint8))
    m = Image.fromarray(np.full((H, W), 255, np.uint8))
    for d in ("Camera_B2", "mask/Camera_B2", "mask_cihp/Camera_B2"):
        os.makedirs(str(raw / d), exist_ok=True)
    for i in range(5):
        img.save(str(raw / "Camera_B2" / f"{i:06d}.jpg"))
        m.save(str(raw / "mask" / "Camera_B2" / f"{i:06d}.png"))
        m.save(str(raw / "mask_cihp" / "Camera_B2" / f"{i:06d}.png"))

    mdm = str(root / "mdm_poses.npy")
    np.save(mdm, {
        "thetas_ori": np.zeros((24, 3, 2), np.float32),
        "root_translation": np.zeros((3, 2), np.float32),
    })

    with open(workspace["cfg_path"]) as f:
        cfg = yaml.safe_load(f)
    cfg["dataset"]["test_pose"] = {
        "dataset_path": pose_data, "raw_dataset_path": str(raw), "skip": 1,
    }
    cfg["dataset"]["test_pose_mdm"] = {
        "dataset_path": pose_data, "pose_path": mdm,
    }
    cfg_path = str(root / "exp_pose.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return {"cfg_path": cfg_path, "root": root}


def test_eval_cli_pose(workspace, trained, pose_protocol_workspace):
    """eval --type pose: MonoHuman last-1/5 split over the raw-ZJU capture
    (reference eval.py:239-255 + dataset/test.py:57-64)."""
    r = run_cli(
        "gomavatar_tpu.cli.evaluate", "--cfg", pose_protocol_workspace["cfg_path"],
        "--type", "pose",
    )
    assert r.returncode == 0, r.stderr[-3000:]
    log = (workspace["root"] / "log" / "cli_smoke" / "log_eval_pose.txt").read_text()
    assert "metrics:" in log
    m = np.load(
        str(workspace["root"] / "log" / "cli_smoke" / "eval" / "metric_pose.npy"),
        allow_pickle=True,
    ).item()
    assert np.isfinite(m["psnr"]), m


def test_eval_cli_pose_mdm(workspace, trained, pose_protocol_workspace):
    """eval --type pose_mdm: MDM-clip novel-pose animation (reference
    eval.py:256-299 + dataset/newpose.py:152-164; GT-free, so the smoke
    checks rendered frames + the budget summary, not metrics)."""
    r = run_cli(
        "gomavatar_tpu.cli.evaluate", "--cfg", pose_protocol_workspace["cfg_path"],
        "--type", "pose_mdm",
    )
    assert r.returncode == 0, r.stderr[-3000:]
    out = str(workspace["root"] / "log" / "cli_smoke" / "eval" / "pose_mdm")
    assert len(os.listdir(out)) == 2
    log = (workspace["root"] / "log" / "cli_smoke" / "log_eval_pose_mdm.txt").read_text()
    assert "render budgets" in log or "RENDER BUDGET" in log


def test_train_pose_cli(workspace, trained):
    r = run_cli(
        "gomavatar_tpu.cli.train_pose", "--cfg", workspace["cfg_path"], "--max_frames", "1"
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(
        str(workspace["root"] / "log" / "cli_smoke" / "checkpoints" / "pose.pkl")
    )


def test_animate_cli_synthetic(workspace):
    out = str(workspace["root"] / "anim")
    r = run_cli(
        "gomavatar_tpu.cli.animate", "--synthetic", "2", "--n_frames", "2",
        "--img", "32", "32", "--out", out,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert len(os.listdir(out)) == 2


def test_animate_cli_mdm(workspace):
    out = str(workspace["root"] / "anim_mdm")
    r = run_cli(
        "gomavatar_tpu.cli.animate", "--synthetic", "2", "--type", "mdm",
        "--n_frames", "2", "--img", "32", "32", "--out", out,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert len([f for f in os.listdir(out) if f.startswith("frame_")]) == 2


def test_animate_rejects_mixed_subdivision_phases():
    """Scenes at different face counts cannot share one compiled program;
    the CLI must fail with a clear message (round-1 VERDICT weak #8)."""
    import jax
    from gomavatar_tpu.cli.animate import check_homogeneous_scenes
    from gomavatar_tpu.config import default_cfg
    from gomavatar_tpu.models.gom import init_gom, subdivide_gom
    from gomavatar_tpu.models.smpl import synthetic_body

    m = default_cfg()["model"]
    m["img_size"] = [32, 32]
    info = synthetic_body(n_rings=6, n_seg=6)
    pack_a = init_gom(jax.random.PRNGKey(0), m, info)
    pack_b = subdivide_gom(*pack_a)  # one subdivision ahead
    assert check_homogeneous_scenes([pack_a, pack_a]) is pack_a[2]
    with pytest.raises(SystemExit, match="SAME subdivision phase"):
        check_homogeneous_scenes([pack_a, pack_b])


def test_train_cli_data_parallel(workspace, trained):
    r = run_cli(
        "gomavatar_tpu.cli.train", "--cfg", workspace["cfg_path"],
        "--data_parallel", "2", "--max_iters", "2",
    )
    assert r.returncode == 0, r.stderr[-3000:]


def test_pose_refine_to_eval_roundtrip(workspace, trained):
    """train_pose -> eval --pose_path chain (the reference's pose.pt
    re-consumption workflow, train_pose.py:290-296 + eval.py:31-77)."""
    r = run_cli(
        "gomavatar_tpu.cli.train_pose", "--cfg", workspace["cfg_path"], "--max_frames", "3"
    )
    assert r.returncode == 0, r.stderr[-3000:]
    pose_path = str(workspace["root"] / "log" / "cli_smoke" / "checkpoints" / "pose.pkl")
    r = run_cli(
        "gomavatar_tpu.cli.evaluate", "--cfg", workspace["cfg_path"],
        "--type", "view", "--pose_path", pose_path,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    log = (workspace["root"] / "log" / "cli_smoke" / "log_eval_view.txt").read_text()
    assert "using refined poses" in log
    assert "metrics:" in log
    # snapshot protocol + budget summary lines present
    assert "render budgets" in log or "RENDER BUDGET" in log


def test_evaluate_on_composites_over_item_bgcolor(monkeypatch):
    """Under train.random_bgcolor each GT item is composited over its own
    random background (data/dataset.py:274,317); evaluate_on must composite
    the prediction over the SAME per-item background or the metric scores
    the background mismatch instead of the model (the reference evaluates
    with the batch's bgcolor, train.py:53-55)."""
    import jax.numpy as jnp

    from gomavatar_tpu.cli import train as train_cli

    H = W = 8
    rng = np.random.default_rng(0)
    fg = rng.random((H, W, 3)).astype(np.float32)
    mask = np.zeros((H, W), np.float32)
    mask[2:6, 2:6] = 1.0
    item_bg = np.array([0.9, 0.1, 0.5], np.float32)
    target = fg * mask[..., None] + item_bg * (1.0 - mask[..., None])

    class DS:
        bgcolor = (0.0, 0.0, 0.0)  # static eval bg != the item's bg

        def __len__(self):
            return 1

        def __getitem__(self, i):
            return {"bgcolor": item_bg, "target_rgbs": target}

    class StubTrainer:
        lpips_params = None
        lpips_calibrated = False

        def forward(self, batch):
            return jnp.asarray(fg), jnp.asarray(mask), None

    captured = {}

    class CaptureEvaluator:
        def __init__(self, **kw):
            pass

        def evaluate(self, pred, gt):
            captured["pred"], captured["gt"] = pred, gt

        def summarize(self):
            return {}

    monkeypatch.setattr(train_cli, "Evaluator", CaptureEvaluator)

    class NullTB:
        def summ_scalar(self, *a, **k):
            pass

    train_cli.evaluate_on(StubTrainer(), DS(), NullTB(), "test_on_train", True)
    # prediction composited over the item's own background == GT exactly
    np.testing.assert_allclose(captured["pred"], captured["gt"], atol=1e-5)
