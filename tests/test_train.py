"""Training-loop machinery: loss decreases, LR schedule, checkpoint roundtrip."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hplflownet_tpu.models import HPLFlowNetShallow
from hplflownet_tpu.pipeline import make_lattice_spec
from hplflownet_tpu.lattice import build_pyramid
from hplflownet_tpu.train.step import (
    make_train_step, make_eval_step, set_learning_rate)
from hplflownet_tpu.train.schedule import lr_at_epoch
from hplflownet_tpu.train.checkpoint import CheckpointIO

SFM5 = [[1.0, 1, 1, 1], [0.5, 1, 1, 1], [0.25, 1, 1, 1],
        [0.125, 1, 1, 1], [0.0625, 1, 1, 1]]


def make_batch(b=2, n=64, seed=0):
    rng = np.random.RandomState(seed)
    pc1 = rng.randn(b, n, 3).astype(np.float32) * 2.0
    flow = np.tile(np.array([[0.3, -0.1, 0.2]], np.float32), (n, 1))
    pc2 = pc1 + flow[None]
    return {
        "pc1": jnp.asarray(pc1), "pc2": jnp.asarray(pc2),
        "sf": jnp.asarray(pc2 - pc1),
        "valid1": jnp.ones((b, n), bool), "valid2": jnp.ones((b, n), bool),
    }


def setup_model():
    spec = make_lattice_spec(SFM5, capacities=[384, 384, 320, 256, 128])
    model = HPLFlowNetShallow(scales_filter_map=SFM5)
    batch = make_batch()
    scales = build_pyramid(spec, batch["pc1"][0], batch["pc2"][0])
    params = model.init(jax.random.PRNGKey(0), batch["pc1"][0],
                        batch["pc2"][0], scales)
    return model, spec, params, batch


@pytest.mark.slow
def test_train_step_reduces_loss():
    model, spec, params, batch = setup_model()
    init_state, train_step = make_train_step(model, spec, learning_rate=1e-4)
    state = init_state(params)

    losses = []
    for _ in range(12):
        state, loss = train_step(state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert min(losses[6:]) < losses[0] * 0.9, losses
    assert int(state.step) == 12


def test_set_learning_rate_and_schedule():
    model, spec, params, batch = setup_model()
    init_state, train_step = make_train_step(model, spec, learning_rate=1e-4)
    state = init_state(params)
    state = set_learning_rate(state, 3e-5)
    assert np.isclose(float(state.opt_state.hyperparams["learning_rate"]), 3e-5)
    # step still runs after LR change without recompile errors
    state, loss = train_step(state, batch)
    assert np.isfinite(float(loss))

    # piecewise schedule semantics (ascending order)
    lrs = [1e-4, 7e-5, 4.9e-5]
    sw = [0, 110, 220]
    assert lr_at_epoch(0, custom_lr=True, lr=1e-4, lrs=lrs,
                       lr_switch_epochs=sw) == 1e-4
    assert lr_at_epoch(109, custom_lr=True, lr=1e-4, lrs=lrs,
                       lr_switch_epochs=sw) == 1e-4
    assert lr_at_epoch(110, custom_lr=True, lr=1e-4, lrs=lrs,
                       lr_switch_epochs=sw) == 7e-5
    assert lr_at_epoch(500, custom_lr=True, lr=1e-4, lrs=lrs,
                       lr_switch_epochs=sw) == 4.9e-5
    # exponential variant
    assert np.isclose(
        lr_at_epoch(20, custom_lr=False, lr=1e-3, lr_decay_rate=0.5,
                    lr_decay_epochs=10, lr_clip=1e-5), 2.5e-4)


def test_overflow_skip_discards_update():
    """on_overflow="skip": an overflowing batch must leave params, optimizer
    moments and the step count untouched (the Pallas adjoints don't match a
    degraded forward; reference-style continue, main.py:229-244)."""
    # capacities far below the ~250-vertex occupancy of a 64-pt cloud
    spec = make_lattice_spec(SFM5, capacities=[32, 32, 32, 32, 32])
    model = HPLFlowNetShallow(scales_filter_map=SFM5)
    batch = make_batch()
    scales = build_pyramid(spec, batch["pc1"][0], batch["pc2"][0])
    params_np = jax.device_get(model.init(
        jax.random.PRNGKey(0), batch["pc1"][0], batch["pc2"][0], scales))

    def fresh_params():
        # the train step donates its state; each init needs live buffers
        return jax.tree_util.tree_map(jnp.asarray, params_np)

    init_state, train_step = make_train_step(model, spec, learning_rate=1e-3,
                                             on_overflow="skip")
    state = init_state(fresh_params())
    before = [np.asarray(x).copy()
              for x in jax.tree_util.tree_leaves(state.params)]
    state, loss, overflow = train_step.with_overflow(state, batch)
    assert int(overflow) > 0, "fixture must actually overflow"
    assert np.isfinite(float(loss))
    after = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]
    for a, b in zip(before, after):
        np.testing.assert_array_equal(a, b)
    assert int(state.step) == 0

    # keep-mode applies the (inexact) update on the same batch
    init_state, train_step = make_train_step(model, spec, learning_rate=1e-3,
                                             on_overflow="keep")
    state = init_state(fresh_params())
    state, _, overflow = train_step.with_overflow(state, batch)
    assert int(overflow) > 0
    after = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]
    assert any(not np.array_equal(a, b) for a, b in zip(before, after))
    assert int(state.step) == 1


def test_overflow_skip_applies_clean_update():
    """A non-overflowing batch updates normally under on_overflow="skip"."""
    model, spec, params, batch = setup_model()
    init_state, train_step = make_train_step(model, spec, learning_rate=1e-3,
                                             on_overflow="skip")
    state = init_state(params)
    before = [np.asarray(x).copy()
              for x in jax.tree_util.tree_leaves(state.params)]
    state, loss, overflow = train_step.with_overflow(state, batch)
    assert int(overflow) == 0
    assert np.isfinite(float(loss))
    after = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]
    assert any(not np.array_equal(a, b) for a, b in zip(before, after))
    assert int(state.step) == 1


def test_checkpoint_roundtrip(tmp_path):
    model, spec, params, batch = setup_model()
    init_state, train_step = make_train_step(model, spec, learning_rate=1e-3)
    state = init_state(params)
    state, _ = train_step(state, batch)

    io = CheckpointIO(str(tmp_path / "ckpt"))
    io.save(state, epoch=1, min_loss=0.5, is_best=True)
    assert io.exists("checkpoint")
    assert io.exists("model_best")
    assert io.exists("checkpoint_1")

    # original params were donated into train_step; template from live state
    template = jax.tree_util.tree_map(np.zeros_like, jax.device_get(state))
    restored, epoch, min_loss = io.restore(template)
    assert epoch == 1 and np.isclose(min_loss, 0.5)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # restored state trains on
    eval_step = make_eval_step(model, spec)
    loss0, _ = eval_step(state.params, batch)
    loss1, _ = eval_step(restored.params, batch)
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-6)
