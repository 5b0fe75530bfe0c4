"""End-to-end model tests: shapes, jit, vmap batching, gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hplflownet_tpu.models import HPLFlowNet, HPLFlowNetShallow, epe3d_loss
from hplflownet_tpu.pipeline import (
    make_lattice_spec,
    flow_forward,
    batched_flow_forward,
)
from hplflownet_tpu.lattice import build_pyramid

SFM5 = [[1.0, 1, 1, 1], [0.5, 1, 1, 1], [0.25, 1, 1, 1],
        [0.125, 1, 1, 1], [0.0625, 1, 1, 1]]
SFM7 = [[3.0, 1, -1, -1], [2.0, 1, -1, -1]] + SFM5


def clouds(n=96, seed=0):
    rng = np.random.RandomState(seed)
    pc1 = (rng.randn(n, 3).astype(np.float32) * 2.0)
    pc2 = pc1 + 0.1 * rng.randn(n, 3).astype(np.float32)
    return jnp.asarray(pc1), jnp.asarray(pc2)


def make_shallow(n=96):
    spec = make_lattice_spec(SFM5, capacities=[512, 512, 384, 256, 128])
    model = HPLFlowNetShallow(scales_filter_map=SFM5)
    return model, spec


def test_shallow_forward_shapes_and_jit():
    pc1, pc2 = clouds()
    model, spec = make_shallow()
    scales = build_pyramid(spec, pc1, pc2)
    params = model.init(jax.random.PRNGKey(0), pc1, pc2, scales)

    fwd = jax.jit(lambda p, a, b: flow_forward(model, p, spec, a, b))
    out = fwd(params, pc1, pc2)
    assert out.shape == (96, 3)
    assert np.isfinite(np.asarray(out)).all()

    # jit is shape-stable across different point clouds
    pc1b, pc2b = clouds(seed=5)
    out2 = fwd(params, pc1b, pc2b)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


@pytest.mark.slow
def test_full_model_forward():
    pc1, pc2 = clouds(n=64, seed=1)
    spec = make_lattice_spec(SFM7, capacities=[256, 384, 512, 512, 384, 256, 128])
    model = HPLFlowNet(scales_filter_map=SFM7)
    scales = build_pyramid(spec, pc1, pc2)
    params = model.init(jax.random.PRNGKey(0), pc1, pc2, scales)
    out = model.apply(params, pc1, pc2, scales)
    assert out.shape == (64, 3)
    assert np.isfinite(np.asarray(out)).all()

    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    # the reference full model is ~19M parameters
    assert 15e6 < n_params < 25e6, n_params


@pytest.mark.slow
def test_batched_forward_matches_single():
    model, spec = make_shallow()
    pc1a, pc2a = clouds(seed=2)
    pc1b, pc2b = clouds(seed=3)
    scales = build_pyramid(spec, pc1a, pc2a)
    params = model.init(jax.random.PRNGKey(1), pc1a, pc2a, scales)

    batch1 = jnp.stack([pc1a, pc1b])
    batch2 = jnp.stack([pc2a, pc2b])
    out_b = batched_flow_forward(model, params, spec, batch1, batch2)
    out_a = flow_forward(model, params, spec, pc1a, pc2a)
    out_bb = flow_forward(model, params, spec, pc1b, pc2b)
    # lax.map's scan body fuses differently than the standalone graph
    np.testing.assert_allclose(np.asarray(out_b[0]), np.asarray(out_a),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_b[1]), np.asarray(out_bb),
                               atol=2e-4)


@pytest.mark.slow
def test_gradients_flow_through_everything():
    model, spec = make_shallow()
    pc1, pc2 = clouds(seed=4)
    sf = pc2 - pc1
    scales = build_pyramid(spec, pc1, pc2)
    params = model.init(jax.random.PRNGKey(2), pc1, pc2, scales)

    def loss_fn(p):
        pred = flow_forward(model, p, spec, pc1, pc2)
        return epe3d_loss(pred, sf).mean()

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves, _ = jax.tree_util.tree_flatten(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # every parameter receives gradient signal
    nonzero = [float(jnp.abs(g).sum()) > 0 for g in leaves]
    assert sum(nonzero) >= 0.95 * len(nonzero), (
        f"{len(nonzero) - sum(nonzero)} of {len(nonzero)} grads are zero")


def test_epe3d_loss_masked():
    pred = jnp.zeros((4, 3))
    target = jnp.asarray(np.array([[3, 4, 0]] * 4, np.float32))
    per_point = epe3d_loss(pred, target)
    np.testing.assert_allclose(np.asarray(per_point), 5.0, atol=1e-6)
    valid = jnp.asarray([True, True, False, False])
    np.testing.assert_allclose(
        float(epe3d_loss(pred, target, valid)), 5.0, atol=1e-6)
