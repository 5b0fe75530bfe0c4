"""End-to-end CLI/driver integration: train 1 epoch + evaluate on a tiny
synthetic FlyingThings3D-style dataset written to disk."""

import os
import os.path as osp

import numpy as np
import pytest
import yaml

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


def _patch_strict(monkeypatch):
    # the real dataset asserts 19640/3824 dirs; relax for the fixture
    from hplflownet_tpu.data import datasets

    orig = datasets.FlyingThings3DSubset.__init__

    def patched(self, *a, **kw):
        kw["strict"] = False
        return orig(self, *a, **kw)

    monkeypatch.setattr(datasets.FlyingThings3DSubset, "__init__", patched)


@pytest.mark.slow
def test_train_then_evaluate_roundtrip(fake_data, tmp_path, monkeypatch):
    _patch_strict(monkeypatch)
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


def test_ckpt_dir_overwrite_guard(fake_data, tmp_path, monkeypatch):
    """Existing ckpt_dir + non-tty stdin must abort unless force_overwrite
    (reference prompts interactively, main.py:36-41)."""
    _patch_strict(monkeypatch)
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
