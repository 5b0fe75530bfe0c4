"""Data-parallel training: batch sharded over the ``data`` mesh axis.

Parameters/optimizer state are replicated; XLA inserts the gradient psum
over ICI automatically from the sharding annotations (pjit/GSPMD) — no
hand-written collectives, per the scaling-book recipe.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..lattice import LatticeSpec
from ..train.step import TrainState, make_optimizer, _batched_loss

__all__ = ["make_dp_train_step", "shard_batch"]


def _batch_sharding(mesh: Mesh, data_axis: str):
    return NamedSharding(mesh, P(data_axis))


def shard_batch(batch: dict, mesh: Mesh, data_axis: str = "data") -> dict:
    """Device-put batch arrays sharded on their leading (batch) axis.

    Single-process: plain sharded device_put.  Multi-process (after
    ``parallel.distributed.initialize``): each process passes only its OWN
    slice of the global batch (``process_local_batch_slice``) and the global
    array is assembled from the per-process shards without any cross-host
    data movement."""
    sh = _batch_sharding(mesh, data_axis)
    multiprocess = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        if k == "path":
            out[k] = v
        elif multiprocess:
            out[k] = jax.make_array_from_process_local_data(sh, np.asarray(v))
        else:
            out[k] = jax.device_put(np.asarray(v), sh)
    return out


def make_dp_train_step(model, spec: LatticeSpec, mesh: Mesh,
                       learning_rate: float = 1e-4, data_axis: str = "data"):
    """Returns (init_state, train_step) with pjit-sharded batch input.

    The per-device batch is ``batch_size // mesh.shape[data_axis]``; batch
    size must divide the data axis.
    """
    tx = make_optimizer(learning_rate)
    replicated = NamedSharding(mesh, P())
    batch_sh = _batch_sharding(mesh, data_axis)

    def init_state(params) -> TrainState:
        state = TrainState(params=params, opt_state=tx.init(params),
                           step=jax.numpy.zeros((), jax.numpy.int32))
        return jax.device_put(state, replicated)

    def train_step(state: TrainState, batch):
        def loss_fn(p):
            loss, _, _overflow = _batched_loss(model, spec, p, batch)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda a, u: a + u,
                                        state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), loss

    batch_shardings = dict(pc1=batch_sh, pc2=batch_sh, sf=batch_sh,
                           valid1=batch_sh, valid2=batch_sh)
    step = jax.jit(
        train_step,
        in_shardings=(replicated, batch_shardings),
        out_shardings=(replicated, replicated),
        donate_argnums=0,
    )
    return init_state, step
