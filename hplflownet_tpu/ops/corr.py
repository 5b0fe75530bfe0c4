"""Correlation BCL: cross-cloud patch correlation on the lattice.

Semantics of the reference ``BilateralCorrelationFlex``
(/root/reference/models/bnn_flow.py:10-210), restructured for TPU:

The reference materializes ``spread_out2`` of shape (B, C, F, Cc, H1) and
runs a Conv3d with kernel (1, Cc, 1) (bnn_flow.py:189-205) — a huge gather
buffer it has to chunk.  Because that first conv is linear before its
activation, it splits into a *self* term (same for every displacement f) and
a *cross* term:

    y[f] = act(spread1 @ W_self + spread2[f] @ W_cross + b)

so the self matmul happens once, and the 225 displaced patches collapse
onto the unique combined offsets.  Both gather stages carry custom VJPs
whose adjoints are gathers through inverse index tables (the stencils are
closed under negation, and the vertex-id maps are injective) — no XLA
scatters anywhere, and no value reordering in backward.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .bcl import (splat, _activation, _dense_init, _first_tap_init,
                  _constrain_vertices, _stencil, _dkernel,
                  _PALLAS_VMEM_BUDGET, _PALLAS_WIDE_LIMIT)
from .pallas_stencil import (CORR_INV_WINDOW, CORR_WINDOW,
                             stencil_tap_tables_sum, tap_tables_layout)
from .segment import ReducePlan, apply_reduce_plan

__all__ = ["BilateralCorrelation", "gather_rows", "corr_self",
           "corr_cross"]


# ---------------------------------------------------------------------------
# gather with plan-based adjoint
# ---------------------------------------------------------------------------

@jax.custom_vjp
def gather_rows(table_pad: jax.Array,   # (T+1, C), row 0 zero sentinel
                indices: jax.Array,     # (...,) int32, -1 = absent
                plan: ReducePlan        # over indices.reshape(-1) -> T
                ) -> jax.Array:
    """table_pad[indices + 1]; adjoint is a segment reduction, not a scatter."""
    return table_pad[indices + 1]


def _gather_fwd(table_pad, indices, plan):
    dtype_marker = jnp.zeros((0,), table_pad.dtype)
    return table_pad[indices + 1], (indices, plan, dtype_marker)


def _gather_bwd(res, g):
    indices, plan, dtype_marker = res
    c = g.shape[-1]
    d_rows = apply_reduce_plan(plan, g.reshape(-1, c))      # (T, C)
    d_table = jnp.concatenate(
        [jnp.zeros((1, c), d_rows.dtype), d_rows], axis=0)
    return d_table.astype(dtype_marker.dtype), None, None


gather_rows.defvjp(_gather_fwd, _gather_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def corr_self(tap_negation: tuple,    # static: index of -offset per tap
              table_pad: jax.Array,   # (H1+1, C), row 0 zero sentinel
              indices: jax.Array,     # (Cc, H1) int32, -1 = absent
              k_self: jax.Array,      # (Cc, C, W)
              bias: jax.Array,        # (W,) fused into the kernel epilogue
              ) -> jax.Array:
    """sum_k table_pad[indices[k] + 1] @ k_self[k] + bias -> (H1, W).

    The patch-correlation self term as one fused stencil contraction (the
    Pallas kernel on TPU).  Its adjoint exploits the corr stencil's closure
    under negation: whoever reads vertex r via offset c is r's neighbor
    via -c, so ``d_table[r] = sum_c dvals[c, indices[neg(c), r]]`` — a
    gather through the SAME index table with permuted rows, no plan
    reduction and no scatter.

    Overflow asymmetry: the Pallas forward drops (tap, block) pairs whose
    window span overflows (degrade-to-absent); the adjoint's windows are
    computed from its own index rows, so when
    ``ScalePair.stencil_overflow > 0`` the gradient may not match the
    degraded forward exactly.  Zero on realistic clouds; the driver warns
    when the counters are nonzero (train/driver.py overflow check).
    """
    return _stencil(table_pad, indices, k_self, bias=bias)


def _corr_self_fwd(tap_negation, table_pad, indices, k_self, bias):
    return (_stencil(table_pad, indices, k_self, bias=bias),
            (table_pad, indices, k_self))


def _corr_self_bwd(tap_negation, res, g):                    # g: (H1, W)
    table_pad, indices, k_self = res
    d_bias = g.astype(jnp.float32).sum(axis=0)
    c = table_pad.shape[1]
    gc = g.astype(table_pad.dtype)
    neg = jnp.asarray(tap_negation, dtype=jnp.int32)

    # d_table[r] = sum_k g[indices[neg(k), r]] @ k_self[k]^T — the identical
    # stencil pattern as the forward with the cotangent as the table and
    # negation-permuted index rows, so it runs through the fused Pallas
    # kernel.  (The previous einsum-to-(Cc, H1, C)-then-random-row-gather
    # form measured ~5 ms per train step at the finest corr scale.)
    g_pad = jnp.concatenate(
        [jnp.zeros((1, gc.shape[1]), gc.dtype), gc], axis=0)
    k_t = jnp.transpose(k_self, (0, 2, 1)).astype(gc.dtype)   # (Cc, W, C)
    # the kernel casts to the compute dtype at its single HBM write (f32
    # accumulation inside) — no f32 d_table round-trip
    d_rows = _stencil(g_pad, indices[neg], k_t,
                      out_dtype=table_pad.dtype)              # (H1, C)
    d_table = jnp.concatenate(
        [jnp.zeros((1, c), d_rows.dtype), d_rows], axis=0)
    # d_k_self via the windowed dW kernel (no (Cc, H1, C) spread on TPU);
    # returns (Cc, C, W) = k_self's layout directly
    d_k = _dkernel(table_pad, indices, gc)
    return (d_table, None, d_k.astype(k_self.dtype), d_bias)


corr_self.defvjp(_corr_self_fwd, _corr_self_bwd)


# ---------------------------------------------------------------------------
# displacement-scan of the cross term, plan-based adjoint
# ---------------------------------------------------------------------------

@jax.custom_vjp
def corr_cross(pad2: jax.Array,       # (H2+1, C)
               uniq_idx: jax.Array,   # (U, H1) unique-offset index rows
               k2: jax.Array,         # (U, C, F, W) inverse-folded kernel
               uniq_inv: jax.Array    # (U, H2) adjoint index map, -1 absent
               ) -> jax.Array:
    """cross[h, f, w] = sum_u pad2[uniq_idx[u, h] + 1] @ k2[u] -> (H1, F, W).

    The F x Cc displaced patches of the reference (bnn_flow.py:195-197)
    collapse onto U distinct combined offsets (225 -> 65 at radius 1), so
    the gather moves a (U, H1, C) spread instead of (F, Cc, H1, C) — 3.5x
    less HBM traffic — and the static (f, c) -> u map is pre-folded into
    ``k2`` (see BilateralCorrelation).  Vertex-major (H1, F, W) output: the
    fused stencil kernel emits it directly with no transpose.

    Overflow asymmetry: like :func:`corr_self`/``blur_matmul``, the Pallas
    forward degrades overflowing (tap, block) windows to absent while the
    adjoint does not — gradients are exact only while
    ``ScalePair.stencil_overflow == 0`` (monitored by the driver).
    """
    return _corr_cross_impl(pad2, uniq_idx, k2)


def _corr_cross_impl(pad2, uniq_idx, k2):
    u, c, f, w = k2.shape
    flat = _stencil(pad2, uniq_idx, k2.reshape(u, c, f * w),
                    window=CORR_WINDOW)                     # (H1, F*W)
    return flat.reshape(flat.shape[0], f, w)


def _corr_cross_fwd(pad2, uniq_idx, k2, uniq_inv):
    return _corr_cross_impl(pad2, uniq_idx, k2), (pad2, uniq_idx, k2,
                                                  uniq_inv)


def _corr_cross_bwd(res, g):                                 # g: (H1, F, W)
    pad2, uniq_idx, k2, uniq_inv = res
    c = pad2.shape[1]
    u, h1 = uniq_idx.shape
    f, w = k2.shape[2], k2.shape[3]
    gc = g.astype(pad2.dtype)
    fw = f * w
    g_flat = gc.reshape(h1, fw)
    k_t = jnp.transpose(k2.reshape(u, c, fw), (0, 2, 1)).astype(gc.dtype)

    # The vertex-id maps are injective, so the adjoint of the uniq_idx
    # gather reads through the inverse table:
    #   d_pad2[r] = sum_u g[uniq_inv[u, r]] @ k2[u]^T   (over the (f, w) axes)
    # On TPU the kernel contraction happens BEFORE the gather: the cotangent
    # is F*W (~512) lanes wide but d_pad2 only C (~128), so pre-transforming
    # per-tap tables z[u] = g @ k2[u]^T (one batched MXU matmul) and then
    # running the gather-only tap-tables kernel moves 4x narrower windows
    # than gathering the raw cotangent (measured 3.0 -> ~1.5 ms at the
    # finest scale).  CPU fallback: the plain stencil over the cotangent.
    from .dispatch import exact_mode_active
    if jax.default_backend() == "tpu" and not exact_mode_active():
        c_p = -(-c // 128) * 128
        # one transpose-free matmul produces every tap's table as column
        # group u of (H1, U*C): z[:, u*C:(u+1)*C] = g @ k2[u]^T
        k2m = jnp.transpose(k_t, (1, 0, 2))                  # (FW, U, C)
        if c_p != c:
            k2m = jnp.concatenate(
                [k2m, jnp.zeros((fw, u, c_p - c), k2m.dtype)], axis=2)
        # slab group sized to ~12 MB of VMEM (double-buffered by Pallas);
        # emit z straight at the kernel's padded layout — padding the
        # kernel-sized matmul operands is free, padding z itself is a
        # full-array HBM copy (was 0.64 ms / 215 MB per train step)
        slab = (max(-(-h1 // 16) * 16, CORR_INV_WINDOW)
                * c_p * gc.dtype.itemsize)
        h_pad, u_pad, group = tap_tables_layout(
            u, h1, group=max(1, min(8, (12 * 2**20) // slab)))
        if u_pad != u:
            k2m = jnp.concatenate(
                [k2m, jnp.zeros((fw, u_pad - u, c_p), k2m.dtype)], axis=1)
        g_rows = g_flat
        if h_pad != h1:
            g_rows = jnp.concatenate(
                [g_rows, jnp.zeros((h_pad - h1, fw), g_rows.dtype)], axis=0)
        z = jax.lax.dot_general(
            g_rows, k2m.reshape(fw, u_pad * c_p),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(gc.dtype)
        d_rows = stencil_tap_tables_sum(
            z, c_p, uniq_inv, group=group,
            vmem_limit_bytes=_PALLAS_WIDE_LIMIT)[:, :c]      # (H2, C) f32
    else:
        g_pad = jnp.concatenate(
            [jnp.zeros((1, fw), gc.dtype), g_flat], axis=0)
        d_rows = _stencil(g_pad, uniq_inv, k_t,
                          window=CORR_WINDOW)                # (H2, C) f32
    d_pad2 = jnp.concatenate([jnp.zeros((1, c), jnp.float32), d_rows],
                             axis=0).astype(pad2.dtype)

    # d_k2 via the windowed dW kernel: (U, C, F*W), no (U, H1, C) spread
    d_k2 = _dkernel(pad2, uniq_idx, g_flat, window=CORR_WINDOW)
    return d_pad2, None, d_k2.reshape(u, c, f, w).astype(k2.dtype), None


corr_cross.defvjp(_corr_cross_fwd, _corr_cross_bwd)


# ---------------------------------------------------------------------------
# module
# ---------------------------------------------------------------------------

class BilateralCorrelation(nn.Module):
    """Patch correlation (corr_widths) + displacement filtering (widths).

    corr stage: first kernel contracts the (corr tap x channel) patch, the
    rest are pointwise; all corr layers carry activations (reference builds
    every corr layer as Conv3dReLU, bnn_flow.py:59-69).
    blur stage: first kernel contracts the displacement axis; the last layer
    is activated only when ``last_relu`` (reference :71-91).
    """

    corr_widths: Sequence[int]
    widths: Sequence[int]
    corr_size: int
    filter_size: int
    corr_tap_negation: tuple = ()
    prev_corr_dim: int = 0
    use_norm: bool = True
    use_leaky: bool = True
    last_relu: bool = False
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(
        self,
        feat1: jax.Array,                     # (H1, C) cloud-1 vertex features
        feat2: jax.Array,                     # (H2, C) cloud-2 vertex features
        prev_corr_feat: jax.Array | None,     # (N_in, prev) finer-scale output
        barycentric1: jax.Array | None,       # (N_in, d1)
        splat_plan1: ReducePlan | None,       # cloud-1 splat plan (prev splat)
        pc1_corr_indices: jax.Array,          # (Cc, H1)
        pc2_corr_uniq: jax.Array,             # (U, H1)
        pc2_corr_inverse: jax.Array,          # (F, Cc) -> u

        pc2_corr_uniq_inv: jax.Array | None = None,
    ) -> jax.Array:
        # the default () works in forward but breaks the corr_self adjoint
        # (indices[()] degenerates to a (0, H1) table): demand the real
        # negation permutation up front
        assert len(self.corr_tap_negation) == self.corr_size, (
            "corr_tap_negation must be the corr stencil's negation "
            "permutation (lattice.offsets.tap_negation), one entry per tap",
            len(self.corr_tap_negation), self.corr_size)
        h1, num_input = feat1.shape
        act = _activation(self.use_leaky)
        self_dim = num_input + self.prev_corr_dim
        dt = jnp.dtype(self.compute_dtype)

        pad1 = jnp.concatenate(
            [jnp.zeros((1, num_input), feat1.dtype), feat1], axis=0)
        if self.prev_corr_dim:
            # splat the finer-scale correlation output onto this scale's
            # cloud-1 lattice (reference :119-168)
            prev_pad = splat(prev_corr_feat.astype(dt), barycentric1,
                             splat_plan1, normalize=self.use_norm)
            combined1 = jnp.concatenate([prev_pad, pad1], axis=-1)
        else:
            combined1 = pad1
        pad2 = jnp.concatenate(
            [jnp.zeros((1, num_input), feat2.dtype), feat2], axis=0)
        combined1 = combined1.astype(dt)
        pad2 = pad2.astype(dt)

        # ---- patch-correlation stage ----
        wc0 = self.corr_widths[0]
        corr_kernel = self.param(
            "corr0_kernel", _first_tap_init,
            (self.corr_size, self_dim + num_input, wc0), jnp.float32)
        corr_bias = self.param("corr0_bias", nn.initializers.zeros,
                               (wc0,), jnp.float32)
        # channel order matches the reference concat (prev+self | cross)
        k_self = corr_kernel[:, :self_dim, :].astype(dt)
        k_cross = corr_kernel[:, self_dim:, :].astype(dt)

        a_self = corr_self(self.corr_tap_negation, combined1,
                           pc1_corr_indices, k_self, corr_bias)

        # fold the static (f, c) -> u inverse map into the cross kernel:
        # k2[u, :, f] = sum_{c : inverse[f, c] == u} k_cross[c]
        n_uniq = pc2_corr_uniq.shape[0]
        onehot = jax.nn.one_hot(pc2_corr_inverse, n_uniq, dtype=dt)
        k2 = jnp.einsum("fku,kcw->ucfw", onehot, k_cross,
                        preferred_element_type=jnp.float32).astype(dt)
        cross = corr_cross(pad2, pc2_corr_uniq, k2, pc2_corr_uniq_inv)
        y = act(a_self[:, None, :] + cross)                  # (H1, F, wc0)

        for i, w in enumerate(self.corr_widths[1:], start=1):
            k = self.param(f"corr{i}_kernel", _dense_init,
                           (self.corr_widths[i - 1], w), jnp.float32)
            b = self.param(f"corr{i}_bias", nn.initializers.zeros,
                           (w,), jnp.float32)
            y = act(jnp.einsum("hfc,cw->hfw", y.astype(dt), k.astype(dt),
                               preferred_element_type=jnp.float32) + b)

        # ---- displacement-filtering stage ----
        w0 = self.widths[0]
        blur_kernel = self.param(
            "blur0_kernel", _first_tap_init,
            (self.filter_size, self.corr_widths[-1], w0), jnp.float32)
        blur_bias = self.param("blur0_bias", nn.initializers.zeros,
                               (w0,), jnp.float32)
        x = jnp.einsum("hfw,fwo->ho", y.astype(dt), blur_kernel.astype(dt),
                       preferred_element_type=jnp.float32) + blur_bias
        if len(self.widths) > 1 or self.last_relu:
            x = act(x)
        # activations stored in the compute dtype (see BilateralConv)
        x = x.astype(dt)

        for i, w in enumerate(self.widths[1:], start=1):
            k = self.param(f"blur{i}_kernel", _dense_init,
                           (x.shape[-1], w), jnp.float32)
            b = self.param(f"blur{i}_bias", nn.initializers.zeros,
                           (w,), jnp.float32)
            x = jnp.dot(x, k.astype(dt),
                        preferred_element_type=jnp.float32) + b
            if i < len(self.widths) - 1 or self.last_relu:
                x = act(x)
            x = x.astype(dt)
        return _constrain_vertices(x)
