"""Scatter-free segment reduction for lattice splatting.

XLA's TPU scatter emitter is pathological for duplicate-index scatter-adds
(measured here: ~4 minutes compile and ~45 ms runtime for ONE
32k->8k segment_sum) — and splat/slice adjoints are exactly such scatters.
This module replaces every scatter in the framework with sorted blocked
run sums:

* A :class:`ReducePlan` is built once per index table (inside the jitted
  lattice build): sort the flat target ids, remember the permutation, and
  record each target's contiguous run [start, end) in sorted order (plus
  block-local run ranks, and block-first ranks for rank-mode plans).
* ``apply_reduce_plan`` gathers values into sorted order and sums each
  run exactly via a local-rank one-hot MXU matmul per 128-entry block,
  combining head/tail partials with interior block totals — gathers and
  matmuls only, no scatter and no cross-run error.
* Its custom VJP is a pure gather: d(vals)[j] = g[ids[j]] (the same rule the
  reference implements in SparseSum.backward, bilateralNN.py:32-40).

Entries with id -1 (invalid points / overflowed vertices) sort past every
real run and contribute nothing.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ReducePlan", "make_reduce_plan", "apply_reduce_plan",
           "weighted_reduce", "rank_reduce_window", "rank_reduce_overflow"]

_BIG = np.int32(np.iinfo(np.int32).max)


class ReducePlan(NamedTuple):
    """Static-shape plan to segment-sum M source entries into T targets."""

    ids: jax.Array    # (M,) i32 original target id per source entry; -1 drops
    perm: jax.Array   # (M,) i32 sorted position -> source index
    start: jax.Array  # (T,) i32 run starts in sorted order
    end: jax.Array    # (T,) i32 run ends
    lrank: jax.Array  # (M,) i32 local run rank within each _BLOCK-sized block
                      # of the sorted stream (see local_ranks)
    # (M/_BLOCK,) i32 global run rank of each block's first entry, for plans
    # whose target ids ARE the dense ranks (the builder's splat plans);
    # size-1 dummy otherwise.  Enables the gather-free rank-mode reduction.
    #
    # RANK-MODE CONTRACT: sentinel (invalid) entries sort past every real
    # key but still inherit the last real rank (num_unique - 1) — they are
    # folded into that rank's interior/tail sums, so every rank-mode caller
    # MUST guarantee invalid entries carry exactly-zero values (the builder
    # enforces this via barycentric masking: invalid points have zero
    # barycentric weight).  Generic plans (r0 dummy) don't need this: their
    # sentinel ids map to no [start, end) run at all.
    r0: jax.Array


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


_BLOCK = 128


def local_ranks(same_as_prev: jax.Array) -> jax.Array:
    """Per-entry run rank local to each _BLOCK-sized block of a sorted stream.

    ``same_as_prev[j]`` says the j-th sorted key equals the (j-1)-th.  A new
    run starts on every key change and at every block boundary, so local
    ranks stay < _BLOCK by construction (ranks grow by at most 1 per entry).
    """
    m = same_as_prev.shape[0]
    pad = (-m) % _BLOCK
    sp = same_as_prev
    if pad:
        sp = jnp.concatenate([sp, jnp.zeros((pad,), bool)])
    mp = sp.shape[0]
    pos = jnp.arange(mp, dtype=jnp.int32)
    new = (~sp) | (pos % _BLOCK == 0)
    blocked = new.astype(jnp.int32).reshape(mp // _BLOCK, _BLOCK)
    lrank = jnp.cumsum(blocked, axis=1).reshape(-1) - 1
    return lrank[:m]


def make_reduce_plan(ids: jax.Array, num_targets: int) -> ReducePlan:
    """Build the sort/run structure for a flat (M,) id array (jittable)."""
    flat = ids.reshape(-1).astype(jnp.int32)
    m = flat.shape[0]
    key = jnp.where(flat < 0, _BIG, flat)
    iota = jnp.arange(m, dtype=jnp.int32)
    sorted_ids, perm = jax.lax.sort((key, iota), num_keys=1)
    start, end = _run_bounds(sorted_ids, num_targets)
    same = jnp.concatenate(
        [jnp.zeros((1,), bool), sorted_ids[1:] == sorted_ids[:-1]])
    return ReducePlan(ids=flat, perm=perm, start=start, end=end,
                      lrank=local_ranks(same),
                      r0=jnp.zeros((1,), jnp.int32))


@jax.custom_vjp
def apply_reduce_plan(plan: ReducePlan, vals: jax.Array) -> jax.Array:
    """(M, C) source values -> (T, C) per-target sums, scatter-free."""
    return _forward(plan, vals)


def _forward(plan: ReducePlan, vals: jax.Array) -> jax.Array:
    """Gather into sorted order, then blocked run sums (see _reduce_sorted)."""
    gathered = vals[plan.perm].astype(jnp.float32)              # (M, C)
    return _reduce_sorted(plan, gathered).astype(vals.dtype)


def _partial_blocks_xla(lrank: jax.Array, sorted_vals: jax.Array):
    """(M, C) sorted stream -> (ceil(M/128)*128, C) f32 block partials."""
    dt = sorted_vals.dtype
    m, c = sorted_vals.shape
    pad = (-m) % _BLOCK
    if pad:
        sorted_vals = jnp.concatenate(
            [sorted_vals, jnp.zeros((pad, c), dt)], axis=0)
        lrank = jnp.concatenate([lrank, jnp.zeros((pad,), jnp.int32)])
    mp = sorted_vals.shape[0]
    nb = mp // _BLOCK
    blocks = sorted_vals.reshape(nb, _BLOCK, c)
    onehot = (lrank.reshape(nb, _BLOCK)[:, :, None]
              == jnp.arange(_BLOCK, dtype=jnp.int32)).astype(dt)
    # f32 inputs need HIGHEST (bf16x6 passes) for exact products; bf16
    # inputs are exact at single-pass default precision
    prec = (jax.lax.Precision.DEFAULT if dt == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    partial = jax.lax.dot_general(
        onehot, blocks, (((1,), (1,)), ((0,), (0,))),
        precision=prec, preferred_element_type=jnp.float32)     # (nb, B, C)
    return partial.reshape(mp, c)


def rank_reduce_window(m: int, t: int) -> int:
    """Static stream window (rows) of the fused rank-mode reduction kernel;
    see pallas_stencil.rank_reduce_geometry (this is its window half)."""
    from .pallas_stencil import rank_reduce_geometry
    return rank_reduce_geometry(m, t)[0]


def rank_reduce_overflow(plan: ReducePlan) -> jax.Array:
    """() i32: rank super-blocks whose entries overflow the fused kernel
    window.

    Mirrors blocked_rank_reduce's exact coverage: super-block i streams
    rows [bs*W, bs*W + 2W) with bs = start[i * bo * 128] // W, so it
    covers every entry iff end[last] <= (bs + 2) * W.
    """
    from .pallas_stencil import rank_reduce_geometry
    t = plan.start.shape[0]
    m = plan.ids.shape[0]
    w, bo = rank_reduce_geometry(m, t)
    step = bo * _BLOCK
    tp = -(-t // step) * step
    start = plan.start
    end = plan.end
    if tp != t:
        start = jnp.concatenate(
            [start, jnp.full((tp - t,), m, jnp.int32)])
        end = jnp.concatenate([end, jnp.zeros((tp - t,), jnp.int32)])
    first = start[::step]
    last = jnp.max(end.reshape(-1, step), axis=1)
    n_w = (-(-m // w) + 1) * w
    bs = jnp.clip(first // w, 0, n_w // w - 2)
    return jnp.sum((last > (bs + 2) * w).astype(jnp.int32))


def _use_pallas_partial(dt) -> bool:
    # the Pallas pass is exact only where a single-pass MXU matmul is
    # (bf16 one-hot entries are exactly representable); f32 streams keep
    # the XLA HIGHEST-precision path
    return jax.default_backend() == "tpu" and dt == jnp.bfloat16


def _use_rank_fused() -> bool:
    # the single-pass fused rank reduction (_wr_rank_fused) vs the two-pass
    # blocked_rank_partial + _combine pipeline; off in exact mode (the fused
    # kernel's stream window degrades on sparse clouds) and A/B-gateable via
    # HPL_RANK_FUSED=0
    from .dispatch import rank_fused_enabled
    return rank_fused_enabled()


def _reduce_sorted(plan: ReducePlan, sorted_vals: jax.Array) -> jax.Array:
    """Exact blocked run sums via a local-rank one-hot MXU matmul.

    ``sorted_vals`` is the (M, C) value stream already permuted into the
    plan's sorted order.  Computation runs in ``sorted_vals.dtype`` (bf16
    halves the bandwidth of every intermediate) with f32 accumulation: the
    one-hot entries are exactly representable, so each partial is the exact
    f32 sum of the (possibly bf16-rounded) run entries.  Output is f32.

    Per _BLOCK-sized block of the sorted stream, ``partial[b, k]`` sums
    exactly the block's entries whose local run rank is ``k`` (a one-hot
    matmul — no prefix differencing, so a run contained in one block gets
    the exact sum of just its own entries, like the reference's
    scatter-add; a flat-cumsum scheme's cross-run error would be amplified
    by the 1/(density+1e-5) normalization on sparsely-hit vertices).  Runs
    crossing blocks add their head/tail partials plus whole interior-block
    totals.  Everything is gathers and matmuls: no scatter, and no
    O(BLOCK^2) reduce-window cumsum (measured 0.94 ms per big splat).
    On TPU with a bf16 stream the partial stage is one fused Pallas pass
    (pallas_stencil.blocked_rank_partial).
    """
    m, c = sorted_vals.shape
    if _use_pallas_partial(sorted_vals.dtype):
        from .pallas_stencil import blocked_rank_partial
        partial_flat = blocked_rank_partial(sorted_vals, plan.lrank, c, 0)
    else:
        partial_flat = _partial_blocks_xla(plan.lrank, sorted_vals)
    return _combine(plan, partial_flat, m)


def _combine(plan: ReducePlan, partial_flat: jax.Array, m: int) -> jax.Array:
    """Assemble per-target sums from the (M_pad, C) f32 block partials."""
    c = partial_flat.shape[1]
    nb = -(-m // _BLOCK)
    # both modes assemble a run's beyond-first-block share from the prefix
    # sums of each block's FIRST-rank row: a run crossing into block b owns
    # that block's local rank 0, so P[b*128] is precisely its share there
    csum0 = jnp.concatenate(
        [jnp.zeros((1, c), jnp.float32),
         jnp.cumsum(partial_flat[:nb * _BLOCK:_BLOCK], axis=0)], axis=0)

    t = plan.start.shape[0]
    if plan.r0.shape[0] > 1:
        # rank-mode (builder splat plans: target id == dense run rank).
        # A rank's rows live in the contiguous block range [b_lo, b_hi];
        # all of it derives from the block-first-rank array r0 with dense
        # compares — the generic path's lrank[start]/lrank[end-1] lookups
        # are elementwise int gathers costing ~0.2 ms each at 32k targets.
        r0 = plan.r0                                       # (nb,)
        big = jnp.int32(np.iinfo(np.int32).max)
        r0n = jnp.concatenate([r0[1:], jnp.full((1,), big, jnp.int32)])
        r = jnp.arange(t, dtype=jnp.int32)[:, None]        # (T, 1)
        # first/last block holding rank r: a block b holds it iff
        # r0[b] <= r <= r_last(b), and r_last(b) is r0[b+1] or r0[b+1]-1;
        # blocks with r0[b+1] < r end strictly below r.  The boundary case
        # r0[b+1] == r may include one leading block without rank-r rows —
        # its addressed P row is empty (zero) or out of range (masked).
        b_hi = jnp.sum((r0[None, :] <= r).astype(jnp.int32), axis=1) - 1
        b_lo = jnp.sum((r0n[None, :] < r).astype(jnp.int32), axis=1)
        # r0 at b_lo via a masked min over the same compare grid
        r0_lo = jnp.min(jnp.where(r0n[None, :] >= r, r0[None, :], big),
                        axis=1)
        exists = b_lo <= b_hi
        safe_lo = jnp.where(exists, b_lo, 0)
        safe_hi = jnp.where(exists, b_hi, 0)
        k_head = r[:, 0] - r0_lo
        head = jnp.where(
            (exists & (k_head < _BLOCK))[:, None],
            partial_flat[safe_lo * _BLOCK + jnp.clip(k_head, 0, _BLOCK - 1)],
            0.0)
        # every block b in (b_lo, b_hi] starts with this rank's run (ranks
        # are contiguous), so its rank-0 row P[b*128] sums exactly the
        # run's entries there — the continuation is one prefix difference
        # of the first-row column, csum0[b_hi+1] - csum0[b_lo+1]; the old
        # separate P[b_hi*128] gather is csum0[b_hi+1]'s last term and was
        # a second full (T, C) gather for nothing.  Single-block runs give
        # identical indices, hence an exact 0.0 — no multi mask needed.
        tail = csum0[safe_hi + 1] - csum0[safe_lo + 1]
        return jnp.where(exists[:, None], head + tail, 0.0)

    # generic plans: a run crossing into block b has its entries there at
    # local rank 0 (a new lrank starts at every block boundary), so block
    # b's contribution to the incoming run is exactly P[b*128] — the SAME
    # first-row prefix csum0 the rank mode uses.  head covers the run's
    # first block; csum0[b1+1] - csum0[b0+1] sums every later block's
    # share (0 exactly for single-block runs), replacing the old
    # P[b1*128 + lrank[e1]] (T, C) gather + whole-block-total cumsum
    # (a second full read of the partials).
    lrank = plan.lrank
    start, end = plan.start, plan.end
    empty = start >= end
    s = jnp.where(empty, 0, start)
    e1 = jnp.where(empty, 0, end - 1)
    b0 = s // _BLOCK
    b1 = e1 // _BLOCK
    head = partial_flat[b0 * _BLOCK + lrank[s]]
    tail = csum0[b1 + 1] - csum0[b0 + 1]
    return jnp.where(empty[:, None], 0.0, head + tail)


def _fwd(plan, vals):
    return _forward(plan, vals), plan


def _bwd(plan, g):
    # adjoint of segment-sum: each source entry receives its target's grad
    safe = jnp.clip(plan.ids, 0, g.shape[0] - 1)
    dvals = jnp.where((plan.ids >= 0)[:, None], g[safe], 0.0)
    return None, dvals


apply_reduce_plan.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# fused weighted reduction (the splat/slice-adjoint access pattern)
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0,))
def weighted_reduce(
    with_weights: bool,
    plan: ReducePlan,     # plan over M = N * R flat entries
    rows: jax.Array,      # (N, C)
    weights: jax.Array,   # (N, R) f32
) -> jax.Array:
    """Per-target sums of ``weights[n, r] * rows[n]`` — the splat pattern.

    Returns (T, C) f32, or (T, C + 1) with the weight sums (densities) as
    the last column when ``with_weights`` (the reference's density channel,
    bilateralNN.py:168-189).  Unlike ``apply_reduce_plan`` on materialized
    products, the (M, C) value stream is built directly in sorted order —
    one gather fusion instead of a materialize + regather round trip — and
    runs in ``rows.dtype`` (bf16 halves every intermediate's bandwidth).
    The adjoint is R row-gathers of the cotangent (the same rule as the
    reference's SparseSum.backward, bilateralNN.py:32-40), not a gather of
    the M-expanded stream.
    """
    return _wr_forward(with_weights, plan, rows, weights)


def _wr_rank_fused(plan, g, rid, c, r, with_weights, interpret=False):
    """Fused rank-mode reduction: see pallas_stencil.blocked_rank_reduce.

    Global rank per sorted entry is ``r0[j // 128] + lrank[j]`` (lrank
    resets at block boundaries AND counts each key change, so adding the
    block-first global rank recovers the dense rank; sentinel runs may
    land one rank past the last real one — they carry exactly-zero values
    by the rank-mode contract, so they add nothing wherever they land).
    """
    from .pallas_stencil import blocked_rank_reduce, rank_reduce_geometry
    m = g.shape[0]
    t = plan.start.shape[0]
    w2, bo = rank_reduce_geometry(m, t)
    grank = jnp.repeat(plan.r0, _BLOCK,
                       total_repeat_length=plan.r0.shape[0] * _BLOCK
                       )[:m] + plan.lrank
    meta = (grank << 2) | rid.astype(jnp.int32) if r else grank
    tp = -(-t // _BLOCK) * _BLOCK
    start = plan.start
    if tp != t:
        start = jnp.concatenate(
            [start, jnp.full((tp - t,), m, jnp.int32)])
    # window buffers: 2 specs x 2 pipeline buffers of (W, CR) + the acc
    cr_pad = -(-(c + r) // _BLOCK) * _BLOCK
    vmem = (4 * w2 * cr_pad * g.dtype.itemsize
            + 2 * bo * _BLOCK * (c + 1) * 4)
    limit = None if vmem <= 12 * 2**20 else 100 * 2**20
    out = blocked_rank_reduce(g, meta, start[::_BLOCK], c, r,
                              with_weights, window=w2, bo=bo,
                              interpret=interpret, vmem_limit_bytes=limit)
    return out[:t]


def _wr_forward(with_weights, plan, rows, weights):
    r = weights.shape[1]
    c = rows.shape[1]
    dt = rows.dtype
    pid = plan.perm // r
    rid = plan.perm % r
    # ONE row gather of (C + R)-wide rows: a separate 1-D gather of the
    # scalar weights runs at element granularity on TPU (~1 ms at M=127k,
    # measured) while widening the row gather by R lanes is ~free.  The
    # weight column is then selected with a one-hot over the R lanes.
    cat = jnp.concatenate([rows, weights.astype(dt)], axis=1)   # (N, C+R)
    g = cat[pid]                                                # (M, C+R)
    m = g.shape[0]
    if _use_pallas_partial(dt) and plan.r0.shape[0] > 1 and _use_rank_fused():
        # rank-mode plans (all splat plans): ONE fused Pallas pass does the
        # whole reduction — weight select, product, and a global-rank
        # one-hot matmul over a windowed stream slice per 128-rank block.
        # No (M, C) f32 partial planes and no (T, C) combine gathers ever
        # touch HBM (those dominated this path at decoder widths).
        return _wr_rank_fused(plan, g, rid, c, r, with_weights)
    if _use_pallas_partial(dt):
        # one Pallas pass fuses the weight-lane select, the product and
        # the one-hot rank matmul — HBM sees only the gathered stream in
        # and the f32 partials out
        from .pallas_stencil import blocked_rank_partial
        meta = plan.lrank | (rid << 16)
        partial_flat = blocked_rank_partial(g, meta, c, r, with_weights)
    else:
        w = jnp.sum(g[:, c:] * (rid[:, None]
                                == jnp.arange(r, dtype=jnp.int32))
                    .astype(dt), axis=1)
        sv = g[:, :c] * w[:, None]
        if with_weights:
            sv = jnp.concatenate([sv, w[:, None]], axis=1)
        partial_flat = _partial_blocks_xla(plan.lrank, sv)
    return _combine(plan, partial_flat, m)


def _wr_fwd(with_weights, plan, rows, weights):
    return _wr_forward(with_weights, plan, rows, weights), (plan, rows, weights)


def _wr_bwd(with_weights, res, g):
    plan, rows, weights = res
    n, c = rows.shape
    r = weights.shape[1]
    t = plan.start.shape[0]
    ids = plan.ids.reshape(n, r)
    d_rows = jnp.zeros((n, c), jnp.float32)
    d_w = []
    gf = g.astype(jnp.float32)
    for k in range(r):
        safe = jnp.clip(ids[:, k], 0, t - 1)
        grow = jnp.where((ids[:, k] >= 0)[:, None], gf[safe], 0.0)  # (N, C[+1])
        d_rows = d_rows + weights[:, k, None] * grow[:, :c]
        dwk = jnp.sum(rows.astype(jnp.float32) * grow[:, :c], axis=1)
        if with_weights:
            dwk = dwk + grow[:, c]
        d_w.append(dwk)
    return None, d_rows.astype(rows.dtype), jnp.stack(d_w, axis=1)


weighted_reduce.defvjp(_wr_fwd, _wr_bwd)
