"""File-format IO roundtrips + torch-checkpoint porter structural test."""

import sys
import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hplflownet_tpu.data.io import (
    read_pfm, write_pfm, read_flo, write_flo)
from hplflownet_tpu.data.visualization import write_ply, export_scene

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools"))
from port_torch_weights import port_state_dict, convert_weight  # noqa: E402


def test_pfm_roundtrip(tmp_path):
    img = np.random.RandomState(0).rand(12, 17).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    write_pfm(p, img)
    np.testing.assert_array_equal(read_pfm(p), img)
    rgb = np.random.RandomState(1).rand(5, 7, 3).astype(np.float32)
    p2 = str(tmp_path / "y.pfm")
    write_pfm(p2, rgb)
    np.testing.assert_array_equal(read_pfm(p2), rgb)


def test_flo_roundtrip(tmp_path):
    flow = np.random.RandomState(0).randn(9, 13, 2).astype(np.float32)
    p = str(tmp_path / "x.flo")
    write_flo(p, flow)
    np.testing.assert_array_equal(read_flo(p), flow)


def test_ply_export(tmp_path):
    pts = np.random.RandomState(0).randn(50, 3).astype(np.float32)
    p = str(tmp_path / "c.ply")
    write_ply(p, pts, np.zeros((50, 3), np.uint8))
    data = open(p, "rb").read()
    assert data.startswith(b"ply")
    assert b"element vertex 50" in data

    export_scene(str(tmp_path / "scene"), 0, pts, pts * 0.01, pts * 0.02, pts)
    for tag in ("pc1", "gt", "pred", "pc2", "error"):
        assert (tmp_path / "scene" / f"0000_{tag}.ply").exists()
    assert (tmp_path / "scene" / "0000_scene.html").exists()


def test_interactive_html_embeds_scene(tmp_path):
    """The single-file viewer carries the exact clouds + worst-EPE segments
    (reference counterpart: the Mayavi interactive scene incl. gt-pred
    connecting lines, /root/reference/visualization.py:68-99)."""
    import base64
    from hplflownet_tpu.data.visualization import export_html

    rng = np.random.RandomState(3)
    pts = rng.randn(64, 3).astype(np.float32)
    sf = rng.randn(64, 3).astype(np.float32) * 0.1
    flow = sf + rng.randn(64, 3).astype(np.float32) * 0.02
    p = str(tmp_path / "scene.html")
    export_html(p, 7, pts, sf, flow, pts + 1.0, max_segments=16)
    html = open(p).read()
    assert html.startswith("<!DOCTYPE html>")
    # every layer present + embedded bit-exactly
    for name, cloud in (("pc1", pts), ("gt", pts + sf),
                        ("pred", pts + flow), ("pc2", pts + 1.0)):
        b64 = base64.b64encode(cloud.astype(np.float32).tobytes()).decode()
        assert f'"{name}"' in html and b64 in html, name
    # worst-EPE segments, capped, as (gt, pred) pairs
    epe = np.linalg.norm(flow - sf, axis=-1)
    worst = np.argsort(-epe)[:16]
    segs = np.concatenate([(pts + sf)[worst], (pts + flow)[worst]], axis=1)
    assert base64.b64encode(
        segs.astype(np.float32).tobytes()).decode() in html
    # interaction hooks exist (toggles, drag/zoom handlers)
    for marker in ("toggle('pc1'", "onmousedown", "onwheel", "segs"):
        assert marker in html, marker


def test_convert_weight_layouts():
    w1 = np.random.randn(8, 5, 1).astype(np.float32)         # Conv1d
    assert convert_weight(w1).shape == (5, 8)
    w2 = np.random.randn(8, 5, 15, 1).astype(np.float32)     # Conv2d (15,1)
    assert convert_weight(w2).shape == (15, 5, 8)
    w3 = np.random.randn(8, 5, 1, 1).astype(np.float32)      # Conv2d 1x1
    assert convert_weight(w3).shape == (5, 8)
    w4 = np.random.randn(8, 5, 1, 15, 1).astype(np.float32)  # Conv3d (1,15,1)
    assert convert_weight(w4).shape == (15, 5, 8)


def _fake_reference_state_dict():
    """Synthesize a torch-style state dict with the reference's module names
    and conv shapes for the *shallow* model (HPLFlowNet_shallow.py)."""
    rng = np.random.RandomState(0)
    sd = {}

    def w(shape, fan_in):
        # fan-in scaling keeps activations O(1) through the deep stack so
        # the output-fidelity comparison is meaningful (raw unit normals
        # blow up to ~1e30 by the head)
        return (rng.randn(*shape) / np.sqrt(fan_in)).astype(np.float32)

    def conv1d(name, cin, cout, relu=True):
        base = f"{name}.composed_module.0" if relu else name
        sd[f"{base}.weight"] = w((cout, cin, 1), cin)
        sd[f"{base}.bias"] = 0.1 * rng.randn(cout).astype(np.float32)

    def conv2d(name, cin, cout, k):
        sd[f"{name}.weight"] = w((cout, cin, k, 1), cin * k)
        sd[f"{name}.bias"] = 0.1 * rng.randn(cout).astype(np.float32)

    def conv3d(name, cin, cout, k):
        sd[f"{name}.weight"] = w((cout, cin, 1, k, 1), cin * k)
        sd[f"{name}.bias"] = 0.1 * rng.randn(cout).astype(np.float32)

    # conv1 point MLP 3->32->32->64
    conv1d("module.conv1.0", 3, 32)
    conv1d("module.conv1.1", 32, 32)
    conv1d("module.conv1.2", 32, 64)

    # encoder bcn1..5: in 68 -> [64] (single conv, last layer -> plain conv)
    for i in range(1, 6):
        conv2d(f"module.bcn{i}.blur_conv.0", 68, 64, 15)

    # decoder widths per HPLFlowNet_shallow.py
    dec_in = {"bcn5_": 128, "bcn4_": 196, "bcn3_": 196, "bcn2_": 132,
              "bcn1_": 132}
    dec_out = {"bcn5_": 64, "bcn4_": 64, "bcn3_": 64, "bcn2_": 64,
               "bcn1_": 128}
    for name in dec_in:
        conv2d(f"module.{name}.blur_conv.0", dec_in[name], dec_out[name], 15)
        sd[f"module.{name}.bias"] = rng.randn(dec_out[name]).astype(np.float32)

    # corr1..3: corr_conv [32] over 2*64+prev channels, blur_conv [32]
    for i, prev in zip(range(1, 4), (0, 64, 64)):
        conv3d(f"module.corr{i}.corr_conv.0.composed_module.0",
               128 + prev, 32, 15)
        conv2d(f"module.corr{i}.blur_conv.0", 32, 32, 15)
        for j, (cin, cout) in enumerate(
                [(32 + (4 if i < 3 else 0), 64), (64, 64), (64, 64)]):
            conv1d(f"module.corr{i}_refine.{j}", cin, cout)

    conv1d("module.conv2", 128, 1024)
    conv1d("module.conv3", 1024, 512)
    sd["module.conv4.weight"] = w((3, 512, 1), 512)
    sd["module.conv4.bias"] = 0.1 * rng.randn(3).astype(np.float32)
    return sd


def test_port_state_dict_matches_model_structure():
    from hplflownet_tpu.models import HPLFlowNetShallow
    from hplflownet_tpu.pipeline import make_lattice_spec
    from hplflownet_tpu.lattice import build_pyramid

    sfm5 = [[1.0, 1, 1, 1], [0.5, 1, 1, 1], [0.25, 1, 1, 1],
            [0.125, 1, 1, 1], [0.0625, 1, 1, 1]]
    spec = make_lattice_spec(sfm5, capacities=[256, 256, 256, 128, 128])
    model = HPLFlowNetShallow(scales_filter_map=sfm5)

    rng = np.random.RandomState(0)
    pc1 = jnp.asarray(rng.randn(48, 3).astype(np.float32))
    pc2 = jnp.asarray(rng.randn(48, 3).astype(np.float32))
    scales = build_pyramid(spec, pc1, pc2)
    params = model.init(jax.random.PRNGKey(0), pc1, pc2, scales)

    ported = port_state_dict(_fake_reference_state_dict())

    want = jax.tree_util.tree_map(lambda x: x.shape, params)
    got = jax.tree_util.tree_map(lambda x: x.shape, ported)
    assert jax.tree_util.tree_structure(want) == \
        jax.tree_util.tree_structure(got), (want, got)
    assert want == got

    # ported params actually run through the model
    out = model.apply(ported, pc1, pc2, scales)
    assert out.shape == (48, 3)
    assert np.isfinite(np.asarray(out)).all()
