"""Transforms, loader, config, metrics, 2D geometry tests."""

import os

import numpy as np
import pytest
import yaml

from hplflownet_tpu.data.transforms import ProcessData, Augmentation
from hplflownet_tpu.data.loader import BatchLoader
from hplflownet_tpu.train.metrics import evaluate_3d, evaluate_2d
from hplflownet_tpu.train.geometry2d import (
    project_3d_to_2d, get_batch_2d_flow, read_kitti_calib)
from hplflownet_tpu.utils.config import Config, postprocess

DP = {"DEPTH_THRESHOLD": 35.0, "NO_CORR": True}


def clouds(n=500, seed=0):
    rng = np.random.RandomState(seed)
    pc1 = rng.rand(n, 3).astype(np.float32) * 30 + 1
    pc2 = pc1 + 0.05 * rng.randn(n, 3).astype(np.float32)
    return pc1, pc2


def test_process_data_shapes_and_flow():
    pc1, pc2 = clouds()
    t = ProcessData(DP, num_points=128)
    item = t((pc1, pc2), rng=np.random.RandomState(1))
    assert item["pc1"].shape == (128, 3)
    assert item["valid1"].all()
    # NO_CORR samples pc1/pc2 independently, flow belongs to pc1 samples
    assert not np.allclose(item["sf"], item["pc2"] - item["pc1"])


def test_process_data_depth_threshold():
    pc1, pc2 = clouds()
    pc1[:, 2] = 50.0  # everything beyond threshold
    t = ProcessData(DP, num_points=64)
    assert t((pc1, pc2), rng=np.random.RandomState(0)) is None


def test_process_data_allow_less_points_pads():
    pc1, pc2 = clouds(n=50)
    t = ProcessData(DP, num_points=128, allow_less_points=True)
    item = t((pc1, pc2), rng=np.random.RandomState(0))
    assert item["pc1"].shape == (128, 3)
    assert item["valid1"].sum() == 50
    assert (item["pc1"][50:] == 0).all()
    t2 = ProcessData(DP, num_points=128, allow_less_points=False)
    assert t2((pc1, pc2), rng=np.random.RandomState(0)) is None


def test_augmentation_consistency():
    pc1, pc2 = clouds(seed=2)
    aug = Augmentation(
        dict(degree_range=0.17, shift_range=1.0, scale_low=0.95,
             scale_high=1.05, jitter_sigma=0.01, jitter_clip=0.0),
        dict(degree_range=0.0, shift_range=0.3, jitter_sigma=0.01,
             jitter_clip=0.0),
        DP, num_points=128)
    item = aug((pc1, pc2), rng=np.random.RandomState(3))
    assert item["pc1"].shape == (128, 3)
    # with NO_CORR, jitter_clip=0 kills pc2 jitter, so flow is exact on
    # matching indices only — just sanity-check magnitudes
    assert np.abs(item["sf"]).max() < 3.0


def test_batch_loader_orders_and_drops():
    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.full((2,), i, np.float32), "path": f"p{i}"}

    dl = BatchLoader(DS(), batch_size=4, shuffle=False, drop_last=False)
    batches = list(dl)
    assert len(batches) == 3
    np.testing.assert_array_equal(batches[0]["x"][:, 0], [0, 1, 2, 3])
    assert batches[0]["path"] == ["p0", "p1", "p2", "p3"]
    dl2 = BatchLoader(DS(), batch_size=4, shuffle=True, seed=1)
    assert len(list(dl2)) == 2  # drop_last defaults true when shuffling


def test_batch_loader_pads_trailing_batch():
    """pad_last keeps every batch at batch_size (one jit shape per epoch —
    VERDICT r2 #6): padded rows repeat the last sample with all-False valid
    masks, num_real records the genuine count, and masked metrics over the
    padded batch equal the unpadded ones."""
    class DS:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            return {"pc1": np.full((5, 3), i, np.float32),
                    "valid1": np.ones((5,), bool), "path": f"p{i}"}

    dl = BatchLoader(DS(), batch_size=4, shuffle=False, drop_last=False,
                     pad_last=True)
    batches = list(dl)
    assert len(batches) == 2
    assert "num_real" not in batches[0]
    last = batches[1]
    assert last["pc1"].shape == (4, 5, 3)
    assert last["num_real"] == 2
    assert last["path"] == ["p4", "p5", "p5", "p5"]
    np.testing.assert_array_equal(last["pc1"][2], last["pc1"][1])
    assert last["valid1"][:2].all() and not last["valid1"][2:].any()

    # masked metrics over the padded batch == metrics over the real rows
    from hplflownet_tpu.train.metrics import evaluate_3d
    rng = np.random.RandomState(0)
    gt = rng.randn(4, 5, 3)
    pred = gt + 0.05 * rng.randn(4, 5, 3)
    padded = evaluate_3d(pred, gt, last["valid1"])
    real = evaluate_3d(pred[:2], gt[:2], np.ones((2, 5), bool))
    np.testing.assert_allclose(padded, real)


def test_eval_compiles_once_with_padded_loader():
    """The padded eval epoch hits the jit cache: exactly one lowered shape
    even though the dataset size is not a batch multiple."""
    import jax
    import jax.numpy as jnp
    from hplflownet_tpu.models import HPLFlowNetShallow
    from hplflownet_tpu.pipeline import make_lattice_spec
    from hplflownet_tpu.lattice import build_pyramid
    from hplflownet_tpu.train.step import make_eval_step

    sfm = [[1.0, 1, 1, 1], [0.5, 1, 1, 1], [0.25, 1, 1, 1],
           [0.125, 1, 1, 1], [0.0625, 1, 1, 1]]
    spec = make_lattice_spec(sfm, capacities=[128] * 5)
    model = HPLFlowNetShallow(scales_filter_map=sfm)
    rng = np.random.RandomState(0)
    n = 24

    class DS:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            r = np.random.RandomState(i)
            pc1 = r.randn(n, 3).astype(np.float32)
            pc2 = pc1 + 0.05 * r.randn(n, 3).astype(np.float32)
            return {"pc1": pc1, "pc2": pc2, "sf": pc2 - pc1,
                    "valid1": np.ones((n,), bool),
                    "valid2": np.ones((n,), bool), "path": f"p{i}"}

    pc = jnp.asarray(DS()[0]["pc1"])
    params = model.init(jax.random.PRNGKey(0), pc, pc,
                        build_pyramid(spec, pc, pc))
    eval_step = make_eval_step(model, spec)
    dl = BatchLoader(DS(), batch_size=4, shuffle=False, drop_last=False,
                     pad_last=True)
    for batch in dl:
        db = {k: jnp.asarray(v) for k, v in batch.items()
              if k not in ("path", "num_real")}
        eval_step(params, db)
    assert eval_step.with_overflow._cache_size() == 1


def test_metrics_reference_values():
    gt = np.zeros((1, 4, 3))
    gt[..., 0] = 1.0
    pred = gt.copy()
    pred[0, 0, 0] = 1.04   # err .04 -> strict hit
    pred[0, 1, 0] = 1.08   # err .08 -> relax hit only
    pred[0, 2, 0] = 1.35   # err .35 -> outlier
    pred[0, 3, 0] = 1.0
    epe, strict, relax, outlier = evaluate_3d(pred, gt)
    np.testing.assert_allclose(epe, (0.04 + 0.08 + 0.35) / 4, atol=1e-6)
    assert strict == 0.5     # 0.04 and exact
    assert relax == 0.75
    assert outlier == 0.25   # only the .35 point exceeds the thresholds
    # 2D
    fgt = np.array([[[10.0, 0.0]]])
    fpr = np.array([[[12.0, 0.0]]])
    epe2, acc2 = evaluate_2d(fpr, fgt)
    np.testing.assert_allclose(epe2, 2.0)
    assert acc2 == 1.0


def test_projection_ft3d_and_kitti_calib(tmp_path):
    pc = np.array([[[1.0, 2.0, 10.0]]])
    x, y = project_3d_to_2d(pc)
    np.testing.assert_allclose(x, (1 * -1050.0 + 479.5 * 10) / 10)
    np.testing.assert_allclose(y, (2 * -1050.0 + 269.5 * 10) / 10)

    calib = tmp_path / "000000.txt"
    calib.write_text(
        "P_rect_02: 7.2e+02 0.0 6.0e+02 4.5e+01 0.0 7.2e+02 1.8e+02 "
        "-1.1e-01 0.0 0.0 1.0 3.0e-03\n")
    intr = read_kitti_calib(str(calib))
    np.testing.assert_allclose(intr["f"], -720.0)
    np.testing.assert_allclose(intr["cx"], 600.0)

    flow_pred, flow_gt = get_batch_2d_flow(
        pc, pc + 0.1, pc + 0.1, ["something/KITTI_processed_occ_final/000000"],
        calib_root=str(tmp_path))
    np.testing.assert_allclose(flow_pred, flow_gt)


def test_kitti_calib_files_shipped():
    import hplflownet_tpu.data as d
    calib_dir = os.path.join(os.path.dirname(d.__file__), "calib_cam_to_cam")
    assert len(os.listdir(calib_dir)) == 200
    intr = read_kitti_calib(os.path.join(calib_dir, "000000.txt"))
    assert intr["f"] < 0


def test_config_postprocess():
    raw = yaml.safe_load("""
arch: HPLFlowNet
dataset: FlyingThings3DSubset
data_root: /tmp/data
evaluate: False
custom_lr: True
lrs: "0.0001,7e-5,4.9e-5"
lr_switch_epochs: "0,110,220"
num_points: 8192
""")
    args = postprocess(Config(raw))
    assert args.lr == 1e-4
    assert args.lrs == [1e-4, 7e-5, 4.9e-5]
    assert args.lr_switch_epochs == [0, 110, 220]
    assert args.batch_size == 1
    assert args.dim == 3

    with pytest.raises(AssertionError):
        postprocess(Config(dict(raw, arch="NoSuchNet")))
    with pytest.raises(AssertionError):
        postprocess(Config(dict(raw, evaluate=True)))  # needs resume


def test_batch_loader_reproducible_augmentation():
    """Same seed => bitwise-identical batches across runs and thread
    schedules; different epochs draw different augmentations (the reference's
    per-worker global reseed, main.py:85-92, races under threads)."""
    from hplflownet_tpu.data.datasets import _SceneFlowDataset

    class DS(_SceneFlowDataset):
        def __init__(self, transform):
            super().__init__(transform, num_points=64)
            self.samples = [f"s{i}" for i in range(8)]
            rng = np.random.RandomState(0)
            self.clouds = [
                (rng.rand(300, 3).astype(np.float32) * 5 + [0, 0, 3],)
                * 2 for i in range(8)]

        def pc_loader(self, path):
            pc1, pc2 = self.clouds[int(path[1:])]
            return pc1.copy(), pc2.copy()

    aug = Augmentation(
        dict(degree_range=0.17, shift_range=1.0, scale_low=0.95,
             scale_high=1.05, jitter_sigma=0.01, jitter_clip=0.0),
        dict(degree_range=0.0, shift_range=0.3, jitter_sigma=0.01,
             jitter_clip=0.0),
        DP, num_points=64)

    def first_epoch(num_threads):
        dl = BatchLoader(DS(aug), batch_size=4, shuffle=True, seed=7,
                         num_threads=num_threads)
        return list(dl)

    a, b = first_epoch(1), first_epoch(4)
    assert len(a) == len(b) == 2
    for ba, bb in zip(a, b):
        assert ba["path"] == bb["path"]
        np.testing.assert_array_equal(ba["pc1"], bb["pc1"])
        np.testing.assert_array_equal(ba["sf"], bb["sf"])

    # second epoch of the same loader must differ (new augmentation draws)
    dl = BatchLoader(DS(aug), batch_size=4, shuffle=False, seed=7,
                     drop_last=False)
    e1, e2 = list(dl), list(dl)
    assert any((x["pc1"] != y["pc1"]).any() for x, y in zip(e1, e2))
