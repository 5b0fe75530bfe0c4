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

__all__ = ["stencil_gather_matmul", "stencil_dkernel",
           "stencil_tap_tables_sum", "tap_tables_layout",
           "stencil_overflow_count", "window_starts",
           "blocked_rank_reduce",
           "BLUR_WINDOW", "CORR_WINDOW"]

_BLOCK = 128        # output vertices per program
_LANES = 128
_ALIGN = 16         # sublane alignment for dynamic vector loads (bf16 tile)

# Default kernel windows per stencil family, sized to the measured
# 16-aligned span p100 at 128-entry blocks on FT3D-like clouds (261 for the
# radius-1 blur stencil, 428 for the 65-offset correlation stencil) plus
# margin.  Larger spans degrade to absent and are counted by the builder
# (ScalePair.stencil_overflow); the one-hot gather cost scales linearly
# with the window, so these are deliberately tight.
BLUR_WINDOW = 288
CORR_WINDOW = 448
# the inverse-table gather-sum kernel processes 2 x 128 output rows per
# program (overhead amortization), so its window covers 2-block spans
# (measured span p100 at 256-entry blocks: 630 over 8 seeds)
CORR_INV_BLOCK = 256
CORR_INV_WINDOW = 672


def _apply_epilogue(x, bias, act_slope, out_dtype):
    """bias add + (leaky-)ReLU + cast, in f32 — shared by TPU and XLA paths.

    ``act_slope`` None = linear; 0.0 = ReLU (grad 0 at exactly 0, matching
    jax.nn.relu); otherwise LeakyReLU with that negative slope (grad 1 at 0,
    matching jax.nn.leaky_relu).
    """
    if bias is not None:
        x = x + bias.astype(jnp.float32)
    if act_slope is not None:
        if act_slope == 0.0:
            x = jnp.maximum(x, 0.0)
        else:
            x = jnp.where(x >= 0.0, x, jnp.float32(act_slope) * x)
    return x.astype(out_dtype)


def _kernel(starts_ref,            # (F, nb) SMEM scalar prefetch
            neighbors_ref,         # (F, B) VMEM block
            kernel_ref,            # (F, C_in, C_out) VMEM (full)
            bias_ref,              # (1, C_out) VMEM
            table_ref,             # (H, C_in) VMEM (full)
            out_ref,               # (B, C_out) VMEM block
            acc_ref,               # (B, C_out) f32 scratch
            *, num_taps, window, act_slope):
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
    # fused epilogue: bias + activation + cast happen before the only HBM
    # write, so wide layers never round-trip an f32 pre-activation
    out_ref[:, :] = _apply_epilogue(acc_ref[:, :], bias_ref[0, :],
                                    act_slope, out_ref.dtype)


def _pallas_impl(table, neighbors, kernel, bias, starts, window, *,
                 act_slope=None, out_dtype=jnp.float32,
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
            pl.BlockSpec((1, c_out), lambda i, *_: (0, 0)),
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
        functools.partial(_kernel, num_taps=f, window=window,
                          act_slope=act_slope),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * _BLOCK, c_out), out_dtype),
        interpret=interpret,
        **kwargs,
    )(starts, neighbors, kernel, bias.reshape(1, c_out), table)
    return out[:hout]


def window_starts(neighbors: jax.Array, h: int, window: int,
                  block: int = _BLOCK):
    """Per-(tap, block) window starts + a does-it-fit predicate.

    ``starts[f, i]`` is the smallest valid index in block ``i`` of tap ``f``
    aligned down to 16 (Mosaic sublane tiling) and clamped so the window
    stays inside the table (0 for all-absent pairs — their one-hot rows are
    all-zero anyway); ``fits`` is True iff every block's largest valid index
    falls inside its window.  ``block`` is the output rows per kernel
    program (kernels processing several 128-row tiles per program use a
    proportionally wider window).
    """
    f, hout = neighbors.shape
    nb = -(-hout // block)
    pad = nb * block - hout
    nbr = neighbors
    if pad:
        nbr = jnp.concatenate(
            [nbr, jnp.full((f, pad), -1, jnp.int32)], axis=1)
    blk = nbr.reshape(f, nb, block)
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
                           window: int, block: int = _BLOCK) -> jax.Array:
    """Number of (tap, block) pairs whose span exceeds the kernel window.

    Such taps contribute zero in :func:`stencil_gather_matmul` (the
    degrade-to-absent contract); the builder surfaces this count in
    ``ScalePair.stencil_overflow`` so it is monitored exactly like probe
    and capacity overflow.
    """
    f, hout = neighbors.shape
    nb = -(-hout // block)
    pad = nb * block - hout
    nbr = neighbors
    if pad:
        nbr = jnp.concatenate(
            [nbr, jnp.full((f, pad), -1, jnp.int32)], axis=1)
    blk = nbr.reshape(f, nb, block)
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


def _pad_table_and_kernel(table, kernel, window):
    """Shared padding: 16-align the table height, 128-align the lane dim."""
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
    # Mosaic requires 128-aligned lane extents: zero-pad channels
    # (padded lanes contribute zero to the matmul)
    cpad = (-c_in) % _LANES
    if cpad:
        table = jnp.concatenate(
            [table, jnp.zeros((table.shape[0], cpad), table.dtype)], axis=1)
        if kernel is not None:
            kernel = jnp.concatenate(
                [kernel, jnp.zeros((kernel.shape[0], cpad, kernel.shape[2]),
                                   kernel.dtype)], axis=1)
    return table, kernel, h_pad


def stencil_gather_matmul(table: jax.Array,       # (H, C_in), NO sentinel row
                          neighbors: jax.Array,   # (F, H_out) int32, -1 absent
                          kernel: jax.Array,      # (F, C_in, C_out)
                          window: int = BLUR_WINDOW,
                          *, bias: jax.Array | None = None,
                          act_slope: float | None = None,
                          out_dtype=jnp.float32,
                          interpret: bool = False,
                          vmem_limit_bytes: int | None = None) -> jax.Array:
    """act(sum_f table[neighbors[f]] @ kernel[f] + bias) -> (H_out, C_out).

    Absent (-1) taps contribute zero, and so does any tap whose block's
    span exceeds ``window`` (its one-hot row has no hit) — the counted
    degrade-to-absent contract; see :func:`stencil_overflow_count`.
    ``window``: BLUR_WINDOW covers the radius-1 blur stencil, CORR_WINDOW
    the 65-offset correlation stencil.  ``bias``/``act_slope``/``out_dtype``
    form the fused epilogue (see :func:`_apply_epilogue`): applied in f32
    before the single HBM write.
    """
    c_out = kernel.shape[-1]
    table, kernel, h_pad = _pad_table_and_kernel(table, kernel, window)
    starts, _ = window_starts(neighbors, h_pad, window)
    if bias is None:
        bias = jnp.zeros((c_out,), jnp.float32)
    return _pallas_impl(table, neighbors, kernel, bias, starts, window,
                        act_slope=act_slope, out_dtype=out_dtype,
                        interpret=interpret,
                        vmem_limit_bytes=vmem_limit_bytes)


# ---------------------------------------------------------------------------
# weight-gradient kernel: dW[f] = sum_v table[neighbors[f, v]]^T g[v]
# ---------------------------------------------------------------------------

def _dk_kernel(starts_ref,         # (F_pad, nb) SMEM scalar prefetch
               neighbors_ref,      # (F_pad, B) VMEM block at (0, i)
               g_ref,              # (H_out_pad, C_out) VMEM (full)
               table_ref,          # (H, C_in) VMEM (full)
               out_ref,            # (G, C_in, C_out) VMEM block per tap group
               *, window, gsize):
    fi = pl.program_id(0)
    i = pl.program_id(1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, window), 1)

    @pl.when(i == 0)
    def _():
        out_ref[:, :, :] = jnp.zeros_like(out_ref)

    gb = g_ref[pl.ds(i * _BLOCK, _BLOCK), :]             # (B, C_out)
    # taps grouped per program: the (tap, block) grid alone would spend
    # more in per-program overhead than in compute for narrow layers
    # (measured 1.9 ms vs 0.6 at 15x250 programs); G taps amortize it
    for k in range(gsize):                               # static unroll
        f = fi * gsize + k
        s = starts_ref[f, i]
        s0 = pl.multiple_of(s, _ALIGN)
        win = table_ref[pl.ds(s0, window), :]            # (W, C_in)
        nb = neighbors_ref[f, :]                         # (B,)
        lidx = nb - s
        onehot = lidx[:, None] == iota_w                 # (B, W)
        gt = jax.lax.dot_general(
            onehot.astype(win.dtype), win,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (B, C_in)
        out_ref[k, :, :] += jax.lax.dot_general(
            gt.astype(gb.dtype), gb,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (C_in, C_out)


def stencil_dkernel(table: jax.Array,       # (H, C_in), NO sentinel row
                    neighbors: jax.Array,   # (F, H_out) int32, -1 absent
                    g: jax.Array,           # (H_out, C_out) cotangent
                    window: int = BLUR_WINDOW,
                    *, acc_budget_bytes: int = 8 * 2**20,
                    interpret: bool = False,
                    vmem_limit_bytes: int | None = None) -> jax.Array:
    """dW[f] = sum_v table[neighbors[f, v]]^T (x) g[v] -> (F, C_in, C_out).

    The stencil convolution's weight gradient without the (F, H, C_in)
    spread the XLA form materializes (hundreds of MB for the wide decoder
    blurs): per (tap, block) the source rows are re-gathered through the
    same one-hot window as the forward kernel and contracted against the
    cotangent block on the MXU, accumulating one (C_in, C_out) tap slab
    held in VMEM.  Same degrade-to-absent contract as the forward — when
    ``stencil_overflow == 0`` this matches the spread form exactly.
    ``C_in``/``C_out`` lane padding is stripped before returning.
    """
    f, hout = neighbors.shape
    c_in = table.shape[1]
    c_out = g.shape[1]
    table, _, h_pad = _pad_table_and_kernel(table, None, window)

    nb = -(-hout // _BLOCK)
    pad = nb * _BLOCK - hout
    if pad:
        neighbors = jnp.concatenate(
            [neighbors, jnp.full((f, pad), -1, jnp.int32)], axis=1)
        g = jnp.concatenate(
            [g, jnp.zeros((pad, c_out), g.dtype)], axis=0)
    copad = (-c_out) % _LANES
    if copad:
        g = jnp.concatenate(
            [g, jnp.zeros((g.shape[0], copad), g.dtype)], axis=1)
    c_in_pad = table.shape[1]
    c_out_pad = g.shape[1]

    # group taps so each program does enough MXU work to bury its overhead;
    # the (G, C_in, C_out) f32 accumulator stays under the caller's budget.
    # Balanced: ceil(f / n_groups) instead of the raw budget bound, which
    # could pad the tap axis by up to 48% of pure waste (65 -> 96 taps)
    group = max(1, min(f, acc_budget_bytes // (c_in_pad * c_out_pad * 4)))
    group = -(-f // (-(-f // group)))
    fpad = (-f) % group
    if fpad:
        neighbors = jnp.concatenate(
            [neighbors, jnp.full((fpad, neighbors.shape[1]), -1,
                                 jnp.int32)], axis=0)
    f_pad = f + fpad
    starts, _ = window_starts(neighbors, h_pad, window)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(f_pad // group, nb),
        in_specs=[
            pl.BlockSpec((f_pad, _BLOCK), lambda fi, i, *_: (0, i)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, c_in_pad, c_out_pad),
                               lambda fi, i, *_: (fi, 0, 0)),
    )
    kwargs = {}
    if vmem_limit_bytes is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_bytes))
    out = pl.pallas_call(
        functools.partial(_dk_kernel, window=window, gsize=group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((f_pad, c_in_pad, c_out_pad),
                                       jnp.float32),
        interpret=interpret,
        **kwargs,
    )(starts, neighbors, g, table)
    return out[:f, :c_in, :c_out]


# ---------------------------------------------------------------------------
# per-tap-table gather-sum: out[v] = sum_f tables[f, neighbors[f, v]]
# ---------------------------------------------------------------------------

def _tts_kernel(starts_ref,        # (F_pad, nb) SMEM scalar prefetch
                neighbors_ref,     # (F_pad, BO) VMEM block at (0, i)
                tables_ref,        # (H, G*C) VMEM block at (0, gi)
                out_ref,           # (1, BO, C) VMEM block at (gi, i)
                *, window, gsize, c_p, block):
    gi = pl.program_id(0)
    i = pl.program_id(1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (block, window), 1)

    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
    for k in range(gsize):                       # static unroll over the group
        s = starts_ref[gi * gsize + k, i]
        s0 = pl.multiple_of(s, _ALIGN)
        win = tables_ref[pl.ds(s0, window), k * c_p:(k + 1) * c_p]  # (W, C)
        nb = neighbors_ref[gi * gsize + k, :]
        lidx = nb - s
        onehot = lidx[:, None] == iota_w
        acc += jax.lax.dot_general(
            onehot.astype(win.dtype), win,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (BO, C)
    out_ref[0, :, :] = acc.astype(out_ref.dtype)


def tap_tables_layout(f: int, h: int, *, group: int = 4,
                      window: int = CORR_INV_WINDOW):
    """(h_pad, f_pad, group) that :func:`stencil_tap_tables_sum` will use.

    Producers of the (H, F*C) tables array can emit it directly at the
    padded shape (h_pad, f_pad*C) — a kernel-side zero-pad of the producing
    matmul's operands — so the kernel wrapper never has to concatenate the
    full tables array in HBM (measured 0.64 ms / 215 MB per train step for
    the 65-tap corr adjoint whose group of 3 doesn't divide 65).
    """
    group = -(-f // (-(-f // min(group, f))))
    f_pad = f + (-f) % group
    h_pad = max(-(-h // _ALIGN) * _ALIGN, window)
    return h_pad, f_pad, group


def stencil_tap_tables_sum(tables: jax.Array,     # (H, F*C) tap-major columns
                           c: int,                # per-tap column width (C)
                           neighbors: jax.Array,  # (F, H_out) int32, -1 absent
                           window: int = CORR_INV_WINDOW,
                           *, group: int = 4,
                           block: int = CORR_INV_BLOCK,
                           interpret: bool = False,
                           vmem_limit_bytes: int | None = None) -> jax.Array:
    """out[v] = sum_f tables[neighbors[f, v], f*C:(f+1)*C] -> (H_out, C) f32.

    The gather-only stencil: each tap reads from its OWN pre-transformed
    table, laid out as tap-major column groups of one (H, F*C) array so the
    producing matmul needs no transpose (used by the correlation adjoint,
    where contracting the kernel into per-tap tables first shrinks the
    gathered row width 4x; see ops/corr._corr_cross_bwd).  ``c`` must be a
    multiple of 128 so the column slices stay lane-tile-aligned.  Tap groups
    of ``group`` columns stream through VMEM; each group emits a partial-sum
    plane (Pallas output blocks may only accumulate across CONSECUTIVE grid
    steps, and the slab streaming wants blocks-fastest order), and the
    F/group partials are summed by one cheap XLA reduce outside.
    Same degrade-to-absent window contract as the main kernel.

    The F/group partial planes are written in ``tables.dtype`` (bf16 on the
    hot path — the planes are pure HBM round-trip traffic, measured 147 MB
    f32 for the 65-tap corr adjoint) and the outer reduce accumulates them
    in f32; the returned array is f32 either way.
    """
    f, hout = neighbors.shape
    h = tables.shape[0]
    assert c % _LANES == 0, c
    assert window % _ALIGN == 0, window
    assert block % _BLOCK == 0, block
    h_pad, f_pad, group = tap_tables_layout(f, h, group=group, window=window)
    fpad = f_pad - f
    # accept tables already emitted at the padded layout (tap_tables_layout)
    # — the pad columns/rows must be zero (inert); otherwise pad here (a
    # full-array HBM copy — producers on the hot path should pre-pad)
    assert tables.shape[1] in (f * c, f_pad * c), (tables.shape, f, c, f_pad)
    if h_pad != h:
        tables = jnp.concatenate(
            [tables, jnp.zeros((h_pad - h, tables.shape[1]), tables.dtype)],
            axis=0)
    if fpad and tables.shape[1] == f * c:
        tables = jnp.concatenate(
            [tables, jnp.zeros((h_pad, fpad * c), tables.dtype)], axis=1)
    if fpad:
        neighbors = jnp.concatenate(
            [neighbors, jnp.full((fpad, hout), -1, jnp.int32)], axis=0)

    starts, _ = window_starts(neighbors, h_pad, window, block=block)
    nb = starts.shape[1]
    pad = nb * block - hout
    if pad:
        neighbors = jnp.concatenate(
            [neighbors, jnp.full((f_pad, pad), -1, jnp.int32)], axis=1)

    n_groups = f_pad // group
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups, nb),
        in_specs=[
            pl.BlockSpec((f_pad, block), lambda gi, i, *_: (0, i)),
            pl.BlockSpec((h_pad, group * c), lambda gi, i, *_: (0, gi)),
        ],
        out_specs=pl.BlockSpec((1, block, c), lambda gi, i, *_: (gi, i, 0)),
    )
    kwargs = {}
    if vmem_limit_bytes is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_bytes))
    out = pl.pallas_call(
        functools.partial(_tts_kernel, window=window, gsize=group, c_p=c,
                          block=block),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_groups, nb * block, c),
                                       tables.dtype),
        interpret=interpret,
        **kwargs,
    )(starts, neighbors, tables)
    return jnp.sum(out, axis=0, dtype=jnp.float32)[:hout]


# ---------------------------------------------------------------------------
# blocked rank-partial reduction (the splat/slice-adjoint partial stage)
# ---------------------------------------------------------------------------

def _rank_partial_kernel(meta_ref,   # (nb, B) VMEM (full): lrank | rid<<16
                         g_ref,      # (BO*B, CR) VMEM block at (i, 0)
                         out_ref,    # (BO*B, C_out) VMEM block at (i, 0)
                         *, c, r, with_weights, bo):
    i = pl.program_id(0)
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, _BLOCK), 1)
    meta_all = meta_ref[pl.ds(i * bo, bo), :].reshape(bo * _BLOCK)
    if r:
        # elementwise pre-pass over the WHOLE program block at once: the
        # per-128-row form serialized VPU select/mult against the MXU dots
        # (measured 0.51 -> 0.32 ms at M=128k, C=68, R=4).  Weight-lane
        # select as a masked sum over the R weight lanes: scalar-indexed
        # single-column extracts (gb[:, c + q]) lower to per-row lane
        # shuffles in Mosaic and measured 2.4x slower for the whole kernel
        # (1.22 -> 0.51 ms at M=127k, C=68, R=4)
        rid_all = meta_all >> 16
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (bo * _BLOCK, r), 1)
        sel = (rid_all[:, None] == iota_r).astype(g_ref.dtype)
        w_all = jnp.sum(g_ref[:, c:c + r] * sel, axis=1)     # (BO*B,)
        sv_all = g_ref[:, :c] * w_all[:, None]
        if with_weights:
            sv_all = jnp.concatenate([sv_all, w_all[:, None]], axis=1)
    else:
        sv_all = g_ref[:, :c]
    for k in range(bo):                              # static unroll
        lrank = meta_all[k * _BLOCK:(k + 1) * _BLOCK] & 0xFFFF
        sv = sv_all[k * _BLOCK:(k + 1) * _BLOCK, :]
        onehot = (lrank[:, None] == iota_b).astype(sv.dtype)   # (B, B)
        out_ref[k * _BLOCK:(k + 1) * _BLOCK, :] = jax.lax.dot_general(
            onehot, sv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (B, C_out)


def _rank_reduce_kernel(bs_ref,       # (n_sb,) SMEM: stream window block idx
                        cfr_ref,      # (n_w/128,) SMEM: chunk first ranks
                        meta0_ref,    # (1, W/128, 128) VMEM block at bs[i]
                        meta1_ref,    # (1, W/128, 128) VMEM block at bs[i]+1
                        g0_ref,       # (W, CR) VMEM window block at bs[i]
                        g1_ref,       # (W, CR) VMEM window block at bs[i]+1
                        out_ref,      # (BO*128, C_out) VMEM block at (i, 0)
                        acc_ref,      # (BO*128, C_out) f32 scratch
                        *, c, r, with_weights, window, bo):
    i = pl.program_id(0)
    base = i * bo * _BLOCK
    osz = 2 * _BLOCK if bo >= 2 else _BLOCK
    iota_o = jax.lax.broadcasted_iota(jnp.int32, (osz, _BLOCK), 0)
    ncc = window // _BLOCK
    acc_ref[:, :] = jnp.zeros_like(acc_ref)
    # chunk-centric: each 128-entry stream chunk spans <= 128 consecutive
    # ranks, so it lands entirely inside TWO aligned 128-rank output rows
    # starting at its (prefetched) first rank's block — one (256, 128) x
    # (128, C) one-hot dot per chunk, accumulated at a dynamic 128-aligned
    # scratch offset.  Chunks owned by neighboring super-blocks clamp into
    # range and their one-hot simply misses (adds zero).
    for h, (m_ref, g_ref) in enumerate(((meta0_ref, g0_ref),
                                        (meta1_ref, g1_ref))):
        for cc in range(ncc):                            # static unroll
            k0 = jnp.clip((cfr_ref[(bs_ref[i] + h) * ncc + cc] - base)
                          >> 7, 0, max(bo - 2, 0))
            meta = m_ref[0, cc, :]                       # (128,)
            gw = g_ref[pl.ds(cc * _BLOCK, _BLOCK), :]    # (128, CR)
            if r:
                grank = meta >> 2
                rid = meta & 3
                iota_r = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, r), 1)
                sel = (rid[:, None] == iota_r).astype(gw.dtype)
                w = jnp.sum(gw[:, c:c + r] * sel, axis=1)    # (128,)
                sv = gw[:, :c] * w[:, None]
                if with_weights:
                    sv = jnp.concatenate([sv, w[:, None]], axis=1)
            else:
                grank = meta
                sv = gw[:, :c]
            onehot = (grank[None, :] - (base + k0 * _BLOCK)
                      == iota_o).astype(sv.dtype)
            acc_ref[pl.ds(k0 * _BLOCK, osz), :] += jax.lax.dot_general(
                onehot, sv, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (osz, C_out)
    out_ref[:, :] = acc_ref[:, :]


RANK_REDUCE_BO = 8   # 128-rank output blocks per program


def rank_reduce_geometry(m: int, t: int):
    """(window, bo): static stream window + output blocks per program.

    One program reduces ``bo`` 128-rank output blocks; the stream entries
    feeding them span ~bo * 128 * (M / T) sorted rows (measured span p100
    over seeded FT3D-like clouds tracks 128 * ratio per rank block with
    <= 621 rows of slack at ratio 16), sized with a 1.35x ratio margin +
    384.  The kernel fetches TWO window blocks from ``start // window``,
    so total coverage is 2 * window from a window-aligned floor.  Must
    stay in lockstep with :func:`..segment.rank_reduce_overflow`.
    """
    bo = max(1, min(RANK_REDUCE_BO, t // _BLOCK))
    w = int(bo * _BLOCK * (m / t) * 1.35) + 384
    w = -(-w // _BLOCK) * _BLOCK
    return min(w, -(-m // _BLOCK) * _BLOCK), bo


def blocked_rank_reduce(g: jax.Array,        # (M, C + R) sorted value stream
                        meta: jax.Array,     # (M,) i32: grank << 2 | rid (r>0)
                                             #          or plain grank (r==0)
                        start_rows: jax.Array,  # (T/128,) i32: stream position
                                             # of each rank block's first run
                        c: int,              # row width (C)
                        r: int,              # weight lanes; 0 = plain rows
                        with_weights: bool = False,
                        *, window: int, bo: int = RANK_REDUCE_BO,
                        interpret: bool = False,
                        vmem_limit_bytes: int | None = None) -> jax.Array:
    """Fused weighted segment reduction for rank-mode plans.

    out[t] = sum over stream entries j with global rank t of w_j * g[j, :c]
    — the whole splat / slice-adjoint reduction in ONE pass: no (M, C) f32
    partial-plane round trip and no (T, C) head/tail combine gathers
    (together the bulk of ops/segment's HBM traffic at decoder widths).
    Ranks are monotone in the sorted stream, so the entries feeding one
    ``bo * 128``-rank super-block live in a contiguous stream range; each
    program streams TWO ``window``-row blocks starting at
    ``start_rows[i * bo] // window`` and folds every 128-entry chunk with
    one (256, 128) x (128, C) one-hot MXU dot at a dynamic 128-aligned
    scratch offset (a chunk's <= 128 distinct monotone ranks always fit two
    aligned output rows).  Entries beyond the two fetched blocks are
    dropped — the same counted degrade contract as the stencil windows
    (the builder counts affected super-blocks via
    :func:`hplflownet_tpu.ops.segment.rank_reduce_overflow`; zero on
    realistic clouds, and impossible when ``window`` covers the padded
    stream).  Returns (T_pad, C_out) f32, C_out = c + 1 if ``with_weights``
    else c; rank rows with no entries are exact zeros.
    """
    m, cr = g.shape
    assert cr == c + r, (g.shape, c, r)
    assert r <= 4, r
    assert window % _BLOCK == 0, window
    nt_blocks = start_rows.shape[0]
    n_sb = -(-nt_blocks // bo)
    if n_sb * bo != nt_blocks:
        start_rows = jnp.concatenate(
            [start_rows, jnp.full((n_sb * bo - nt_blocks,), m, jnp.int32)])
    # pad the stream to whole window blocks PLUS one spare so block bs+1
    # always exists; pad meta with a huge rank that matches no output row
    n_w = (-(-m // window) + 1) * window
    pad_rank = jnp.int32(1 << 28)
    g = jnp.concatenate([g, jnp.zeros((n_w - m, cr), g.dtype)], axis=0)
    meta = jnp.concatenate(
        [meta, jnp.full((n_w - m,), pad_rank << 2 if r else pad_rank,
                        jnp.int32)], axis=0)
    bs = jnp.clip(start_rows[::bo] // window, 0, n_w // window - 2)
    # per-chunk first ranks for the dynamic accumulate offsets
    grank = (meta >> 2) if r else meta
    cfr = grank[::_BLOCK]                                # (n_w/128,)

    c_out = c + 1 if with_weights else c
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_sb,),
        in_specs=[
            pl.BlockSpec((1, window // _BLOCK, _BLOCK),
                         lambda i, bs, cfr: (bs[i], 0, 0)),
            pl.BlockSpec((1, window // _BLOCK, _BLOCK),
                         lambda i, bs, cfr: (bs[i] + 1, 0, 0)),
            pl.BlockSpec((window, cr), lambda i, bs, cfr: (bs[i], 0)),
            pl.BlockSpec((window, cr), lambda i, bs, cfr: (bs[i] + 1, 0)),
        ],
        out_specs=pl.BlockSpec((bo * _BLOCK, c_out),
                               lambda i, bs, cfr: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((bo * _BLOCK, c_out), jnp.float32),
        ],
    )
    meta2 = meta.reshape(n_w // window, window // _BLOCK, _BLOCK)
    kwargs = {}
    if vmem_limit_bytes is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_bytes))
    return pl.pallas_call(
        functools.partial(_rank_reduce_kernel, c=c, r=r,
                          with_weights=with_weights, window=window, bo=bo),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_sb * bo * _BLOCK, c_out),
                                       jnp.float32),
        interpret=interpret,
        **kwargs,
    )(bs, cfr, meta2, meta2, g, g)


def blocked_rank_partial(g: jax.Array,       # (M, C + R) sorted value stream
                         meta: jax.Array,    # (M,) i32: lrank | rid << 16
                         c: int,             # row width (C)
                         r: int,             # weight lanes; 0 = plain rows
                         with_weights: bool = False,
                         *, interpret: bool = False) -> jax.Array:
    """Per-128-block local-rank run sums of the sorted splat stream.

    Fuses the weight-lane select, the weighted product, and the one-hot
    rank matmul of ops/segment._reduce_sorted into one pass: the only HBM
    traffic is the gathered stream in and the f32 partial out (the XLA form
    materializes the one-hot blocks and the weighted stream separately).
    Returns (M_pad, C_out) f32 with M_pad = ceil(M/128)*128 and
    C_out = c + 1 if ``with_weights`` else c; rows beyond M are the padded
    blocks' rank-0 sums of zero entries.
    """
    m, cr = g.shape
    assert cr == c + r, (g.shape, c, r)
    bo = 8                                   # 128-row blocks per program
    step = bo * _BLOCK
    mp = -(-m // step) * step
    if mp != m:
        g = jnp.concatenate([g, jnp.zeros((mp - m, cr), g.dtype)], axis=0)
        meta = jnp.concatenate(
            [meta, jnp.zeros((mp - m,), jnp.int32)], axis=0)
    c_out = c + 1 if with_weights else c
    nb = mp // _BLOCK

    out = pl.pallas_call(
        functools.partial(_rank_partial_kernel, c=c, r=r,
                          with_weights=with_weights, bo=bo),
        grid=(mp // step,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((step, cr), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((step, c_out), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((mp, c_out), jnp.float32),
        interpret=interpret,
    )(meta.reshape(nb, _BLOCK), g)
    return out
