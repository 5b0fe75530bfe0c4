"""Pallas TPU kernel: fused multi-tap stencil gather + matmul on the lattice.

The BCL blur and the correlation ops all share one access pattern: for each
lattice vertex ``v`` and stencil tap ``f``, read row ``neighbors[f, v]`` of a
vertex-feature table and contract with a per-tap kernel:

    out[v] = sum_f table[neighbors[f, v]] @ kernel[f]        (-1 taps skipped)

XLA lowers the gather to random row loads running at 74-90 GB/s for narrow
rows (64-68 channels — most of this model) and materializes the (F, H, C)
spread in HBM.  This kernel exploits the builder's structural guarantee that
every tap's index run is *monotone* (the vertex table is key-sorted, so the
table position of ``key + delta`` increases with the position of ``key``):
for a block of B consecutive output vertices, each tap's sources live in a
narrow contiguous window of the table (measured aligned span p100: 261 for
the 15-tap blur, 428 for the 65-offset correlation, at B=128 on FT3D-like
clouds).  The table lives wholly in VMEM (narrow layers only: H*128*2 bytes
<= ~9 MB at this model's capacities), so per (block, tap) the kernel

  1. reads the W-row window with one dynamic vector load (no DMA),
  2. materializes the gather as a one-hot (B, W) matrix — rows of absent
     (-1) taps are all-zero — and multiplies on the MXU:
         g = onehot @ window            (B, C_in)
         acc += g @ kernel[f]           (B, C_out)

No (F, H, C) spread ever touches HBM.  (TPU's native ``dynamic_gather``
can't replace the one-hot: Mosaic restricts it to a single source vreg —
8 sublanes — far below these window sizes.)  Out-of-window taps contribute
zero — the exact same degrade-to-absent contract as the builder's windowed
probe (a dropped stencil neighbor, never a wrong value); the builder counts
affected (tap, block) pairs in ``ScalePair.stencil_overflow`` (zero on
realistic clouds — the windows cover the measured span p100 with margin).
A ``lax.cond`` fallback was measured at ~0.05 ms per call site just in
branch overhead, so the degrade contract is also the faster design.

Reference counterpart being replaced: the chunked blur gather loop
(/root/reference/models/bilateralNN.py:199-221) and the displaced-patch
gather (/root/reference/models/bnn_flow.py:189-197).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["stencil_gather_matmul", "stencil_overflow_count",
           "window_starts"]

_BLOCK = 128        # output vertices per program
_LANES = 128
_ALIGN = 16         # sublane alignment for dynamic vector loads (bf16 tile)


def _kernel(starts_ref,            # (F, nb) SMEM scalar prefetch
            neighbors_ref,         # (F, B) VMEM block
            kernel_ref,            # (F, C_in, C_out) VMEM (full)
            table_ref,             # (H, C_in) VMEM (full)
            out_ref,               # (B, C_out) VMEM block
            acc_ref,               # (B, C_out) f32 scratch
            *, num_taps, window):
    i = pl.program_id(0)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, window), 1)

    def tap(f, _):
        # window starts are 16-aligned (window_starts) so the dynamic load
        # satisfies Mosaic's sublane-tiling divisibility requirement.
        # NB: no @pl.when skip of empty (tap, block) pairs here — predicating
        # the tap body measured 3x slower (0.34 -> 1.04 ms on the narrow
        # blur): the conditional blocks Mosaic's load pipelining, costing far
        # more than the ~10% of skippable pairs.
        s0 = pl.multiple_of(starts_ref[f, i], _ALIGN)
        win = table_ref[pl.ds(s0, window), :]            # (W, C_in)
        # absent taps (nb == -1) give lidx < 0 which never matches the
        # iota, so the one-hot row is all-zero without an explicit mask
        nb = neighbors_ref[f, :]                         # (B,) int32
        lidx = nb - starts_ref[f, i]
        onehot = lidx[:, None] == iota_w
        g = jax.lax.dot_general(
            onehot.astype(win.dtype), win,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (B, C_in)
        acc_ref[:, :] += jax.lax.dot_general(
            g.astype(kernel_ref.dtype), kernel_ref[f],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (B, C_out)
        return 0

    acc_ref[:, :] = jnp.zeros_like(acc_ref)
    jax.lax.fori_loop(0, num_taps, tap, 0, unroll=True)
    out_ref[:, :] = acc_ref[:, :]


def _pallas_impl(table, neighbors, kernel, starts, window, *,
                 interpret=False, vmem_limit_bytes=None):
    f, hout = neighbors.shape
    h, c_in = table.shape
    c_out = kernel.shape[-1]
    nb = starts.shape[1]
    assert h >= window, (h, window)
    assert nb * _BLOCK >= hout

    pad = nb * _BLOCK - hout
    if pad:
        neighbors = jnp.concatenate(
            [neighbors, jnp.full((f, pad), -1, jnp.int32)], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((f, _BLOCK), lambda i, *_: (0, i)),
            pl.BlockSpec((f, c_in, c_out), lambda i, *_: (0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK, c_out), lambda i, *_: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((_BLOCK, c_out), jnp.float32),
        ],
    )
    kwargs = {}
    if vmem_limit_bytes is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_bytes))
    out = pl.pallas_call(
        functools.partial(_kernel, num_taps=f, window=window),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * _BLOCK, c_out), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(starts, neighbors, kernel, table)
    return out[:hout]


def window_starts(neighbors: jax.Array, h: int, window: int):
    """Per-(tap, block) window starts + a does-it-fit predicate.

    ``starts[f, i]`` is the smallest valid index in block ``i`` of tap ``f``
    aligned down to 16 (Mosaic sublane tiling) and clamped so the window
    stays inside the table (0 for all-absent pairs — their one-hot rows are
    all-zero anyway); ``fits`` is True iff every block's largest valid index
    falls inside its window.
    """
    f, hout = neighbors.shape
    nb = -(-hout // _BLOCK)
    pad = nb * _BLOCK - hout
    nbr = neighbors
    if pad:
        nbr = jnp.concatenate(
            [nbr, jnp.full((f, pad), -1, jnp.int32)], axis=1)
    blk = nbr.reshape(f, nb, _BLOCK)
    valid = blk >= 0
    lo = jnp.min(jnp.where(valid, blk, h), axis=2)       # (f, nb)
    hi = jnp.max(jnp.where(valid, blk, -1), axis=2)
    # the clip bound must itself be _ALIGN-aligned or the pl.multiple_of
    # promise inside the kernel breaks: stencil_gather_matmul pads the table
    # height so h - window is aligned; demand that here rather than aligning
    # the bound down (which would make the table tail unreachable)
    bound = max(h - window, 0)
    assert bound % _ALIGN == 0, (
        "table height must make h - window 16-aligned "
        "(stencil_gather_matmul pads it)", h, window)
    starts = jnp.clip(jnp.where(lo >= h, 0, lo) & ~(_ALIGN - 1), 0, bound)
    fits = jnp.all(hi - starts < window)
    return starts, fits


def stencil_overflow_count(neighbors: jax.Array, h: int,
                           window: int) -> jax.Array:
    """Number of (tap, block) pairs whose span exceeds the kernel window.

    Such taps contribute zero in :func:`stencil_gather_matmul` (the
    degrade-to-absent contract); the builder surfaces this count in
    ``ScalePair.stencil_overflow`` so it is monitored exactly like probe
    and capacity overflow.
    """
    f, hout = neighbors.shape
    nb = -(-hout // _BLOCK)
    pad = nb * _BLOCK - hout
    nbr = neighbors
    if pad:
        nbr = jnp.concatenate(
            [nbr, jnp.full((f, pad), -1, jnp.int32)], axis=1)
    blk = nbr.reshape(f, nb, _BLOCK)
    valid = blk >= 0
    lo = jnp.min(jnp.where(valid, blk, h), axis=2)
    hi = jnp.max(jnp.where(valid, blk, -1), axis=2)
    # mirror the kernel's effective windows: stencil_gather_matmul pads the
    # table height to _ALIGN (and to >= window), so the clip bound is
    # h_eff - window, which is 16-aligned by construction
    h_eff = max(-(-h // _ALIGN) * _ALIGN, window)
    starts = jnp.clip(jnp.where(lo >= h, 0, lo) & ~(_ALIGN - 1),
                      0, h_eff - window)
    return jnp.sum((hi - starts >= window).astype(jnp.int32))


def stencil_gather_matmul(table: jax.Array,       # (H, C_in), NO sentinel row
                          neighbors: jax.Array,   # (F, H_out) int32, -1 absent
                          kernel: jax.Array,      # (F, C_in, C_out)
                          window: int = 384,
                          *, interpret: bool = False,
                          vmem_limit_bytes: int | None = None) -> jax.Array:
    """sum_f table[neighbors[f]] @ kernel[f] -> (H_out, C_out) f32.

    Absent (-1) taps contribute zero, and so does any tap whose block's
    span exceeds ``window`` (its one-hot row has no hit) — the counted
    degrade-to-absent contract; see :func:`stencil_overflow_count`.
    ``window``: 384 covers the radius-1 blur stencil, 512 the 65-offset
    correlation stencil (measured span p100 261/428 at 128-entry blocks).
    """
    h, c_in = table.shape
    assert window % _ALIGN == 0, window
    # pad the height so h_pad - window is _ALIGN-aligned: dynamic window
    # starts carry a pl.multiple_of(16) promise, and the clip bound must
    # respect it WITHOUT cutting off the table tail (zero rows are inert —
    # no real neighbor index points past h)
    h_pad = max(-(-h // _ALIGN) * _ALIGN, window)
    if h_pad != h:
        table = jnp.concatenate(
            [table, jnp.zeros((h_pad - h, c_in), table.dtype)], axis=0)
    starts, _ = window_starts(neighbors, h_pad, window)

    # Mosaic requires 128-aligned lane extents: zero-pad channels
    # (padded lanes contribute zero to the matmul)
    cpad = (-c_in) % _LANES
    if cpad:
        table = jnp.concatenate(
            [table, jnp.zeros((table.shape[0], cpad), table.dtype)], axis=1)
        kernel = jnp.concatenate(
            [kernel, jnp.zeros((kernel.shape[0], cpad, kernel.shape[2]),
                               kernel.dtype)], axis=1)
    return _pallas_impl(table, neighbors, kernel, starts, window,
                        interpret=interpret,
                        vmem_limit_bytes=vmem_limit_bytes)
