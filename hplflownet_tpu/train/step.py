"""Jitted train/eval steps: batched lattice build + forward + Adam update.

One ``jax.jit`` covers the whole step — lattice pyramid, model, loss,
backward, optimizer — unlike the reference where lattice construction runs
in DataLoader worker processes (SURVEY.md L2) and the GPU only sees index
tensors.  Batch size > 1 is a vmap axis (the reference is limited to 1).

The learning rate lives inside the optimizer state via
``optax.inject_hyperparams`` so the reference's per-epoch LR switching
(main.py:156) is a cheap state update, not a recompile.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..lattice import LatticeSpec, build_pyramid
from ..models.losses import epe3d_loss

__all__ = ["TrainState", "create_train_state", "make_train_step",
           "make_eval_step", "set_learning_rate"]


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(learning_rate: float = 1e-4) -> optax.GradientTransformation:
    """Adam, weight decay 0 (reference: main.py:138-140)."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate)


def create_train_state(params, learning_rate: float = 1e-4) -> TrainState:
    tx = make_optimizer(learning_rate)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Overwrite the LR hyperparameter inside the optimizer state."""
    opt_state = state.opt_state
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    opt_state = opt_state._replace(hyperparams=hp)
    return state._replace(opt_state=opt_state)


def _scales_overflow(scales) -> jax.Array:
    """Total dropped-work count across a pyramid: capacity + probe-window +
    stencil-window overflow.  Nonzero means the forward silently degraded
    (dropped vertices/taps) AND — for stencil overflow — that the Pallas
    blur/corr adjoints no longer match the degraded forward (see
    ops/bcl.blur_matmul); the driver warns on it."""
    total = jnp.zeros((), jnp.int32)
    for sp in scales:
        total = (total + sp.pc1_overflow + sp.pc2_overflow
                 + sp.probe_overflow + sp.stencil_overflow)
    return total


def _batched_loss(model, spec: LatticeSpec, params, batch,
                  adjoint_plans: bool = True):
    """batch: dict with pc1, pc2 (B, N, d), sf (B, N, d), valid1/2 (B, N)."""
    def single(pc1, pc2, valid1, valid2):
        scales = build_pyramid(spec, pc1, pc2, valid1, valid2,
                               adjoint_plans=adjoint_plans)
        return (model.apply(params, pc1, pc2, scales),
                _scales_overflow(scales))

    # lax.map, not vmap: batched sorts/gathers lower poorly on TPU (vmap
    # measured 2.5x slower per sample than the single-sample graph)
    pred, overflow = jax.lax.map(lambda t: single(*t),
                                 (batch["pc1"], batch["pc2"],
                                  batch["valid1"], batch["valid2"]))
    loss = epe3d_loss(pred, batch["sf"], batch["valid1"])
    return loss, pred, jax.lax.stop_gradient(jnp.sum(overflow))


def make_train_step(model, spec: LatticeSpec, learning_rate: float = 1e-4,
                    on_overflow: str = "keep"):
    """Returns (state_factory, step_fn); step_fn is donated + jitted.

    ``on_overflow="skip"`` discards the whole update (params, optimizer
    moments, step count all keep their old values) whenever the pyramid
    reports any capacity/probe/stencil overflow — on overflow the Pallas
    adjoints no longer match the degraded forward, so the gradient is
    inexact (the reference skips bad batches too: OOM catch-and-continue,
    main.py:229-244).  The select fuses into the Adam elementwise update,
    costing ~nothing.  "keep" applies the update regardless (bench/tests).
    """
    assert on_overflow in ("keep", "skip"), on_overflow
    tx = make_optimizer(learning_rate)

    def init_state(params) -> TrainState:
        return TrainState(params=params, opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32))

    def train_step(state: TrainState, batch):
        def loss_fn(p):
            loss, _, overflow = _batched_loss(model, spec, p, batch)
            return loss, overflow

        (loss, overflow), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        step = state.step + 1
        if on_overflow == "skip":
            keep = overflow == 0
            sel = lambda new, old: jnp.where(keep, new, old)  # noqa: E731
            params = jax.tree_util.tree_map(sel, params, state.params)
            opt_state = jax.tree_util.tree_map(sel, opt_state,
                                               state.opt_state)
            step = jnp.where(keep, step, state.step)
        return TrainState(params=params, opt_state=opt_state,
                          step=step), loss, overflow

    jitted = jax.jit(train_step, donate_argnums=0)

    def step2(state, batch):
        """(state, loss) API used by bench/tests; overflow dropped."""
        state, loss, _ = jitted(state, batch)
        return state, loss

    step2.with_overflow = jitted
    return init_state, step2


def make_eval_step(model, spec: LatticeSpec):
    """Jitted forward + per-batch loss (no update).

    The returned function also carries ``.exact`` — the same step traced
    under :func:`hplflownet_tpu.ops.dispatch.exact_mode`, with every
    windowed fast path replaced by its exact fallback.  The driver re-runs
    a batch through it when the fast step reports window overflow (compiled
    lazily, so the common all-exact-anyway case never pays for it).
    """

    def eval_step(params, batch):
        loss, pred, overflow = _batched_loss(model, spec, params, batch,
                                             adjoint_plans=False)
        return loss, pred, overflow

    jitted = jax.jit(eval_step)

    def eval_step_exact(params, batch):
        from ..ops.dispatch import exact_mode
        with exact_mode():
            return eval_step(params, batch)

    def step2(params, batch):
        loss, pred, _ = jitted(params, batch)
        return loss, pred

    step2.with_overflow = jitted
    step2.exact = jax.jit(eval_step_exact)
    return step2
