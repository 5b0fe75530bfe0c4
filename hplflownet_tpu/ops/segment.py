"""Scatter-free segment reduction for lattice splatting.

XLA's TPU scatter emitter is pathological for duplicate-index scatter-adds
(measured here: ~4 minutes compile and ~45 ms runtime for ONE
32k->8k segment_sum) — and splat/slice adjoints are exactly such scatters.
This module replaces every scatter in the framework with sorted prefix-sum
reductions:

* A :class:`ReducePlan` is built once per index table (inside the jitted
  lattice build): sort the flat target ids, remember the permutation, and
  record each target's contiguous run [start, end) in sorted order.
* ``apply_reduce_plan`` gathers values into sorted order, takes a cumulative
  sum, and differences the run boundaries — gathers and a cumsum only.
* Its custom VJP is a pure gather: d(vals)[j] = g[ids[j]] (the same rule the
  reference implements in SparseSum.backward, bilateralNN.py:32-40).

Entries with id -1 (invalid points / overflowed vertices) sort past every
real run and contribute nothing.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ReducePlan", "make_reduce_plan", "apply_reduce_plan"]

_BIG = np.int32(np.iinfo(np.int32).max)


class ReducePlan(NamedTuple):
    """Static-shape plan to segment-sum M source entries into T targets."""

    ids: jax.Array    # (M,) i32 original target id per source entry; -1 drops
    perm: jax.Array   # (M,) i32 sorted position -> source index
    start: jax.Array  # (T,) i32 run starts in sorted order
    end: jax.Array    # (T,) i32 run ends


def _searchsorted(sorted_vals: jax.Array, queries: jax.Array,
                  side: str) -> jax.Array:
    """Branchless vectorized binary search (int32, static unrolled steps)."""
    m = sorted_vals.shape[0]
    pos = jnp.zeros(queries.shape, dtype=jnp.int32)
    step = 1 << max(0, (m - 1).bit_length())
    while step > 0:
        cand = pos + step
        v = sorted_vals[jnp.clip(cand - 1, 0, m - 1)]
        if side == "left":
            take = (cand <= m) & (v < queries)
        else:
            take = (cand <= m) & (v <= queries)
        pos = jnp.where(take, cand, pos)
        step >>= 1
    return pos


def _run_bounds(sorted_ids: jax.Array, num_targets: int):
    """[start, end) runs of each target id in a sorted id array.

    Implemented as a sort-merge join — one lax.sort with left/right query
    markers interleaved, a cumsum, and an unsorting lax.sort — because TPU
    sorts are ~100x cheaper than the random gathers a vectorized binary
    search needs (measured: 0.34 ms to sort 400k pairs vs 39 ms for the
    equivalent 15-step search).
    """
    m = sorted_ids.shape[0]
    t = num_targets
    assert max(m, t) < (1 << 28)
    targets = jnp.arange(t, dtype=jnp.int32)
    # tag ordering within equal values: left queries < ids < right queries;
    # (tag, position) share one int32 word so the sorts move 2 arrays each
    vals = jnp.concatenate([targets, sorted_ids, targets])
    word = jnp.concatenate([
        targets,
        jnp.arange(m, dtype=jnp.int32) + jnp.int32(1 << 28),
        targets + jnp.int32(2 << 28),
    ])
    _, sword = jax.lax.sort((vals, word), num_keys=2)
    is_id = (sword >= (1 << 28)) & (sword < (2 << 28))
    cnt = jnp.cumsum(is_id.astype(jnp.int32))
    # unsort by the unique word: left queries land first, right queries last
    _, counts = jax.lax.sort((sword, cnt), num_keys=1)
    start = counts[:t]              # ids strictly below target
    end = counts[m + t:]            # ids at or below target
    return start, end


def make_reduce_plan(ids: jax.Array, num_targets: int) -> ReducePlan:
    """Build the sort/run structure for a flat (M,) id array (jittable)."""
    flat = ids.reshape(-1).astype(jnp.int32)
    m = flat.shape[0]
    key = jnp.where(flat < 0, _BIG, flat)
    iota = jnp.arange(m, dtype=jnp.int32)
    sorted_ids, perm = jax.lax.sort((key, iota), num_keys=1)
    start, end = _run_bounds(sorted_ids, num_targets)
    return ReducePlan(ids=flat, perm=perm, start=start, end=end)


@jax.custom_vjp
def apply_reduce_plan(plan: ReducePlan, vals: jax.Array) -> jax.Array:
    """(M, C) source values -> (T, C) per-target sums, scatter-free."""
    return _forward(plan, vals)


_BLOCK = 256


def _forward(plan: ReducePlan, vals: jax.Array) -> jax.Array:
    """Two-level blocked prefix sums.

    A flat cumsum's rounding error scales with the norm of the whole stream
    (~sqrt(M)*eps), which the density normalization then amplifies.  With
    block-local prefixes plus an exclusive block-level prefix, any two
    boundary evaluations inside the same block share the identical
    block-prefix float, so it cancels exactly and only the short local
    cumsum's error survives.
    """
    gathered = vals[plan.perm].astype(jnp.float32)              # (M, C)
    m, c = gathered.shape
    pad = (-m) % _BLOCK
    if pad:
        gathered = jnp.concatenate(
            [gathered, jnp.zeros((pad, c), jnp.float32)], axis=0)
    nb = gathered.shape[0] // _BLOCK
    blocks = gathered.reshape(nb, _BLOCK, c)
    local = jnp.cumsum(blocks, axis=1)                          # (nb, B, C)
    totals = local[:, -1, :]                                    # (nb, C)
    block_prefix = jnp.concatenate(
        [jnp.zeros((1, c), jnp.float32), jnp.cumsum(totals, axis=0)], axis=0)
    local_flat = local.reshape(nb * _BLOCK, c)

    def prefix_at(pos):                                          # pos in [0, M]
        b = pos // _BLOCK
        r = pos % _BLOCK
        base = block_prefix[b]
        idx = jnp.clip(pos - 1, 0, nb * _BLOCK - 1)
        loc = jnp.where((r > 0)[:, None], local_flat[idx], 0.0)
        return base + loc

    return (prefix_at(plan.end) - prefix_at(plan.start)).astype(vals.dtype)


def _fwd(plan, vals):
    return _forward(plan, vals), plan


def _bwd(plan, g):
    # adjoint of segment-sum: each source entry receives its target's grad
    safe = jnp.clip(plan.ids, 0, g.shape[0] - 1)
    dvals = jnp.where((plan.ids >= 0)[:, None], g[safe], 0.0)
    return None, dvals


apply_reduce_plan.defvjp(_fwd, _bwd)
