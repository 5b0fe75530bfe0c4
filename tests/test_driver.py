"""End-to-end CLI/driver integration: train 1 epoch + evaluate on a tiny
synthetic FlyingThings3D-style dataset written to disk."""

import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

from hplflownet_tpu.utils.config import parse_args_from_yaml
from hplflownet_tpu.train.driver import run

SFM5 = [[1.0, 1, 1, 1], [0.5, 1, 1, 1], [0.25, 1, 1, 1],
        [0.125, 1, 1, 1], [0.0625, 1, 1, 1]]


def make_fake_ft3d(root, n_train=6, n_val=4, points=400, seed=0):
    rng = np.random.RandomState(seed)
    base = osp.join(root, "FlyingThings3D_subset_processed_35m")
    for split, count in (("train", n_train), ("val", n_val)):
        for i in range(count):
            d = osp.join(base, split, f"{i:07d}")
            os.makedirs(d)
            pc1 = (rng.rand(points, 3).astype(np.float32) * 8 + 1)
            pc1[:, 2] += 3  # in front of the camera, well under 35 m
            flow = 0.05 * rng.randn(points, 3).astype(np.float32)
            pc2 = pc1 + flow
            # loader flips x and z signs; pre-flip so data round-trips
            for pc, name in ((pc1, "pc1"), (pc2, "pc2")):
                out = pc.copy()
                out[:, 0] *= -1
                out[:, 2] *= -1
                np.save(osp.join(d, f"{name}.npy"), out)


def base_config(tmp_path):
    return {
        "ckpt_dir": str(tmp_path / "ckpt"),
        "data_root": str(tmp_path / "data"),
        "resume": False,
        "arch": "HPLFlowNetShallow",
        "last_relu": False,
        "allow_less_points": True,
        "use_leaky": True,
        "bcn_use_bias": True,
        "bcn_use_norm": True,
        "custom_lr": True,
        "lr_switch_epochs": "0",
        "lrs": "0.001",
        "batch_size": 2,
        "epochs": 1,
        "scales_filter_map": SFM5,
        "dim": 3,
        "num_points": 128,
        "evaluate": False,
        "dataset": "FlyingThings3DSubset",
        "full": True,
        "data_process": {"DEPTH_THRESHOLD": 35.0, "NO_CORR": True},
        "aug_together": {"degree_range": 0.17, "shift_range": 0.5,
                         "scale_low": 0.95, "scale_high": 1.05,
                         "jitter_sigma": 0.01, "jitter_clip": 0.0},
        "aug_pc2": {"degree_range": 0.0, "shift_range": 0.1,
                    "jitter_sigma": 0.01, "jitter_clip": 0.0},
        "print_freq": 1,
        "workers": 2,
        "lattice_capacities": [512, 512, 384, 256, 128],
        "strict": False,
    }


@pytest.fixture(scope="module")
def fake_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("driver")
    make_fake_ft3d(str(root / "data"))
    return root


@pytest.mark.slow
def test_train_then_evaluate_roundtrip(fake_data, tmp_path):
    cfg = base_config(fake_data)
    cfg["ckpt_dir"] = str(tmp_path / "ckpt")
    cfg_path = tmp_path / "train.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    args = parse_args_from_yaml(str(cfg_path))
    result = run(args)
    assert np.isfinite(result["min_val_epe3d"])
    assert osp.isdir(osp.join(cfg["ckpt_dir"], "checkpoint"))
    assert osp.isdir(osp.join(cfg["ckpt_dir"], "model_best"))
    assert osp.exists(osp.join(cfg["ckpt_dir"], "log"))

    # evaluation from the saved checkpoint, with visu dumps
    eval_cfg = dict(cfg)
    eval_cfg["evaluate"] = True
    eval_cfg["resume"] = cfg["ckpt_dir"]
    eval_cfg["dump_visu"] = True
    eval_path = tmp_path / "eval.yaml"
    eval_path.write_text(yaml.safe_dump(eval_cfg))
    metrics = run(parse_args_from_yaml(str(eval_path)))

    for key in ("epe3d", "acc3ds", "acc3dr", "outliers", "epe2d", "acc2d"):
        assert np.isfinite(metrics[key]), key
    assert 0 <= metrics["acc3ds"] <= 1
    visu = [d for d in os.listdir(cfg["ckpt_dir"]) if d.startswith("visu_")]
    assert visu, "expected visu dumps"
    dumped = os.listdir(osp.join(cfg["ckpt_dir"], visu[0]))
    assert any(f.startswith("output_") for f in dumped)


@pytest.mark.slow
def test_real_cli_train_then_evaluate(fake_data, tmp_path):
    """Drive the actual ``python main.py <cfg>`` CLI in a subprocess —
    train -> checkpoint -> evaluate on the on-disk FT3D-format fixture
    (reference UX: main.py:289, README.md:54).  Catches path/layout/config
    drift the in-process tests can't."""
    cfg = base_config(fake_data)
    cfg["ckpt_dir"] = str(tmp_path / "ckpt_cli")
    cfg["platform"] = "cpu"  # subprocess can't use conftest's jax.config
    cfg_path = tmp_path / "train_cli.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, osp.join(REPO, "main.py"), str(cfg_path)],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-4000:]
    log = (tmp_path / "ckpt_cli" / "log").read_text()
    assert "Train EPE3D" in log and "Val EPE3D" in log
    assert osp.isdir(osp.join(cfg["ckpt_dir"], "model_best"))

    eval_cfg = dict(cfg)
    eval_cfg["evaluate"] = True
    eval_cfg["resume"] = cfg["ckpt_dir"]
    eval_path = tmp_path / "eval_cli.yaml"
    eval_path.write_text(yaml.safe_dump(eval_cfg))
    proc = subprocess.run(
        [sys.executable, osp.join(REPO, "main.py"), str(eval_path)],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-4000:]
    log = (tmp_path / "ckpt_cli" / "log").read_text()
    # the final metrics line must be present with finite values
    lines = [ln for ln in log.splitlines() if ln.startswith(" * EPE3D")]
    assert lines, log[-2000:]
    vals = [float(tok) for tok in lines[-1].replace("\t", " ").split()
            if tok.replace(".", "").replace("-", "").isdigit()]
    assert vals and all(np.isfinite(v) for v in vals), lines[-1]


@pytest.mark.slow
def test_resume_reset_lr_semantics(fake_data, tmp_path):
    """reset_lr rebases LR at resume but the schedule reasserts at the next
    epoch top (reference main.py:144-146 + :156); reset_lr_pin keeps args.lr
    for all remaining epochs (this repo's documented deviation)."""
    cfg = base_config(fake_data)
    cfg["lrs"] = "0.001,0.0005"
    cfg["lr_switch_epochs"] = "0,1"

    def lr_lines(ckpt_dir):
        log = (osp.join(ckpt_dir, "log"))
        with open(log) as fd:
            return [ln.strip() for ln in fd if ln.startswith("lr: ")]

    for pin, want in ((False, "lr: 0.0005"), (True, "lr: 0.001")):
        ckpt_dir = str(tmp_path / f"ckpt_pin{int(pin)}")
        c1 = dict(cfg, ckpt_dir=ckpt_dir, epochs=1)
        p1 = tmp_path / f"a{int(pin)}.yaml"
        p1.write_text(yaml.safe_dump(c1))
        run(parse_args_from_yaml(str(p1)))
        assert lr_lines(ckpt_dir) == ["lr: 0.001"]

        c2 = dict(cfg, ckpt_dir=ckpt_dir, epochs=2, resume=True,
                  reset_lr=True, reset_lr_pin=pin)
        p2 = tmp_path / f"b{int(pin)}.yaml"
        p2.write_text(yaml.safe_dump(c2))
        run(parse_args_from_yaml(str(p2)))
        log = (tmp_path / f"ckpt_pin{int(pin)}" / "log").read_text()
        assert "reset lr" in log
        # resumed epoch 1: schedule says 0.0005; pinned says args.lr=0.001
        assert lr_lines(ckpt_dir)[-1] == want, lr_lines(ckpt_dir)


def test_ckpt_dir_overwrite_guard(fake_data, tmp_path):
    """Existing ckpt_dir + non-tty stdin must abort unless force_overwrite
    (reference prompts interactively, main.py:36-41)."""
    cfg = base_config(fake_data)
    ckpt_dir = tmp_path / "existing"
    ckpt_dir.mkdir()
    (ckpt_dir / "log").write_text("previous run")
    cfg["ckpt_dir"] = str(ckpt_dir)
    cfg_path = tmp_path / "overwrite.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    with pytest.raises(RuntimeError, match="force_overwrite"):
        run(parse_args_from_yaml(str(cfg_path)))
    assert (ckpt_dir / "log").read_text() == "previous run"  # untouched
