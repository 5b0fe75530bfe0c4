"""Bilateral Convolution Layer (BCL): splat -> blur -> slice, TPU-first.

Functional primitives plus a flax module with the semantics of the
reference's ``BilateralConvFlex`` (/root/reference/models/bilateralNN.py:46-238),
re-mapped onto XLA-friendly ops.  The whole layer — forward AND backward — is
scatter-free (XLA's TPU scatter path costs minutes of compile and ~45 ms per
op here; see ops/segment.py):

* splat: sorted prefix-sum segment reduction through the builder's
  :class:`~hplflownet_tpu.ops.segment.ReducePlan`, with the reference's
  ``1/(density + 1e-5)`` normalization (bilateralNN.py:168-189).  Its adjoint
  is a gather (same rule as the reference's SparseSum.backward, :32-40).
* blur: the fused Pallas stencil kernel (ops/pallas_stencil.py) for
  layers whose table fits the VMEM budget, a tap-major gather + one MXU
  contraction on XLA otherwise.  Its adjoint uses the stencil's closure
  under negation — for every offset ``o`` the stencil contains ``-o`` — so
  the transpose convolution is the same gather pattern with permuted taps
  and transposed kernels (a custom VJP; ``tap_negation`` from
  lattice/offsets.py).
* slice: gather the d+1 enclosing vertices per point + barycentric
  contraction (:223-238); adjoint = unnormalized splat via the same plan.

Everything is single-sample (no batch dim); batch via ``jax.vmap``.
Index conventions match the builder: vertex id ``-1`` = absent; all gathers
go through a zero-padded row 0 (ids shifted by +1), mirroring the
reference's index-0 sentinel trick (:158-164, :192-196).
"""

from __future__ import annotations

import contextlib
import contextvars
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .pallas_stencil import (BLUR_WINDOW, _apply_epilogue,
                             stencil_dkernel, stencil_gather_matmul)
from .segment import ReducePlan, weighted_reduce

__all__ = ["splat", "blur_matmul", "slice_to_points", "BilateralConv",
           "LEAKY_RATE", "vertex_constraint"]

# Trace-time hook for sharding the vertex axis (see parallel/lattice_parallel):
# when set, every vertex-major intermediate is passed through it, typically a
# jax.lax.with_sharding_constraint over the 'lattice' mesh axis.
_VERTEX_CONSTRAINT: contextvars.ContextVar = contextvars.ContextVar(
    "vertex_constraint", default=None)


@contextlib.contextmanager
def vertex_constraint(fn):
    """Install a vertex-axis annotation hook for the duration of a trace."""
    token = _VERTEX_CONSTRAINT.set(fn)
    try:
        yield
    finally:
        _VERTEX_CONSTRAINT.reset(token)


def _constrain_vertices(x: jax.Array) -> jax.Array:
    fn = _VERTEX_CONSTRAINT.get()
    return fn(x) if fn is not None else x


LEAKY_RATE = 0.1  # reference: models/module_utils.py:6
NORM_EPS = 1e-5   # reference: models/bilateralNN.py:185

# torch-equivalent xavier_normal: the stencil axis counts into both fans
_first_tap_init = nn.initializers.glorot_normal(in_axis=-2, out_axis=-1)
_dense_init = nn.initializers.glorot_normal(in_axis=-2, out_axis=-1)


def _activation(use_leaky: bool):
    if use_leaky:
        return lambda x: jax.nn.leaky_relu(x, negative_slope=LEAKY_RATE)
    return jax.nn.relu


# ---------------------------------------------------------------------------
# splat
# ---------------------------------------------------------------------------

def splat(
    features: jax.Array,      # (N, C)
    barycentric: jax.Array,   # (N, d1)
    plan: ReducePlan,         # builder's splat plan for this cloud/scale
    normalize: bool = True,
) -> jax.Array:
    """Barycentric-weighted reduction of point features onto lattice vertices.

    Returns ``(H + 1, C)`` with row 0 the all-zero sentinel row (invalid
    points carry zero barycentric weight, so they are inert).
    """
    num_input = features.shape[-1]
    # density shares the fused reduction pass as an extra channel
    out = weighted_reduce(normalize, plan, features, barycentric)  # (H, C[+1])
    if normalize:
        out = out[:, :num_input] * (1.0 / (out[:, num_input] + NORM_EPS))[:, None]
    return jnp.concatenate(
        [jnp.zeros((1, num_input), out.dtype), out], axis=0)


# ---------------------------------------------------------------------------
# blur (custom VJP via the negated-tap stencil)
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def blur_matmul(
    tap_negation: tuple,       # static: index of -offset per tap (adjoint)
    act_slope,                 # static: None linear / 0.0 ReLU / leaky slope
    out_dtype: str,            # static: output storage dtype
    splatted_pad: jax.Array,   # (H+1, C_in), row 0 = zero sentinel
    neighbors: jax.Array,      # (F, H) int32, -1 = absent
    kernel: jax.Array,         # (F, C_in, C_out)
    bias: jax.Array,           # (C_out,)
) -> jax.Array:
    """act(stencil conv + bias) over the lattice, epilogue fused in-kernel.

    The bias add, activation and output cast happen inside the Pallas
    kernel's single HBM write (pallas_stencil._apply_epilogue), so wide
    decoder layers never round-trip an f32 pre-activation.  The activation
    gradient is recovered from the saved OUTPUT (monotone activations:
    y >= 0 iff pre-activation >= 0), so no pre-activation residual exists.

    Overflow asymmetry: the Pallas forward degrades (tap, block) pairs
    whose index span overflows the kernel window to absent; the adjoint's
    windows (negated-tap stencil, windowed dW kernel) are computed from
    their own index rows, so when ``ScalePair.stencil_overflow > 0`` the
    gradient may not match the degraded forward exactly.  Zero on realistic
    clouds; surfaced by the driver.
    """
    return _blur_fwd_impl(act_slope, out_dtype, splatted_pad, neighbors,
                          kernel, bias)


# Blurs whose table + tap kernel fit in VMEM go through the fused Pallas
# kernel — measured faster than XLA's gather+matmul at every such shape
# (2-2.7x for narrow 64-68 ch layers; 1.2-1.3x for the wide decoder blurs).
# Two tiers: small layers use the default Mosaic scoped-VMEM budget (16 MB,
# known-good pipelining); wide layers (the big decoder blurs, the
# 512-1024-ch backward g-tables) raise ``vmem_limit_bytes`` — v5e has
# 128 MB of physical VMEM, and 100 MB measured faster than both the 64 MB
# setting and the XLA path (3.32 vs 3.93 ms for the 580->1024 blur at 26k
# vertices; pure-matmul floor 2.47 ms).  Beyond the wide budget XLA takes
# over.  CPU (tests) always takes the XLA path; the kernel itself is
# covered by interpret-mode unit tests.
_PALLAS_VMEM_BUDGET = 14 * 2**20
_PALLAS_WIDE_BUDGET = 80 * 2**20
_PALLAS_WIDE_LIMIT = 100 * 2**20
# the dW kernel holds table + cotangent + a tap-group of (C_in, C_out)
# accumulator slabs; its only per-block buffers are tiny, so it can run
# closer to the physical limit
_DKERNEL_BUDGET = 96 * 2**20


def _pallas_tier(h: int, c_in: int, kernel_bytes: int):
    """None = XLA; otherwise the vmem_limit_bytes to pass (0 = default)."""
    from .dispatch import exact_mode_active
    if jax.default_backend() != "tpu" or exact_mode_active():
        return None
    c_pad = -(-c_in // 128) * 128
    total = h * c_pad * 2 + kernel_bytes
    if total <= _PALLAS_VMEM_BUDGET:
        return 0
    if total <= _PALLAS_WIDE_BUDGET:
        return _PALLAS_WIDE_LIMIT
    return None


def _stencil_xla(splatted_pad, neighbors, kernel):
    # tap-major (F, H, C) row-gather + one dot_general contracting (f, c):
    # each tap's index run is monotone (the vertex table is key-sorted, so
    # table position of key+delta is increasing in position of key), which
    # the TPU gather emitter exploits — measured 4.3 ms vs 6.1 ms for the
    # h-major gather+reshape at the (26624, 580->1024) decoder shape
    spread = splatted_pad[neighbors + 1]                   # (F, H, C_in)
    return jax.lax.dot_general(spread, kernel, (((0, 2), (0, 1)), ((), ())),
                               preferred_element_type=jnp.float32)


def _stencil(splatted_pad, neighbors, kernel, window=BLUR_WINDOW,
             bias=None, act_slope=None, out_dtype=jnp.float32):
    f, c_in, c_out = kernel.shape
    kb = f * (-(-c_in // 128) * 128) * c_out * kernel.dtype.itemsize
    tier = _pallas_tier(splatted_pad.shape[0] - 1, c_in, kb)
    if tier is not None:
        return stencil_gather_matmul(splatted_pad[1:], neighbors, kernel,
                                     window=window, bias=bias,
                                     act_slope=act_slope,
                                     out_dtype=out_dtype,
                                     vmem_limit_bytes=tier or None)
    out = _stencil_xla(splatted_pad, neighbors, kernel)
    return _apply_epilogue(out, bias, act_slope, out_dtype)


def _dkernel(splatted_pad, neighbors, gc, window=BLUR_WINDOW):
    """dW[f] = sum_v table[nb[f, v]]^T g[v] — Pallas windowed kernel on TPU
    (no (F, H, C_in) spread), XLA spread+dot fallback elsewhere."""
    h1, c_in = splatted_pad.shape
    c_out = gc.shape[1]
    from .dispatch import exact_mode_active
    if jax.default_backend() == "tpu" and not exact_mode_active():
        c_in_p = -(-c_in // 128) * 128
        c_out_p = -(-c_out // 128) * 128
        slab = c_in_p * c_out_p * 4
        tables = ((h1 - 1) * c_in_p * splatted_pad.dtype.itemsize
                  + gc.shape[0] * c_out_p * gc.dtype.itemsize)
        headroom = _DKERNEL_BUDGET - tables
        if headroom >= slab:
            acc_budget = min(8 * 2**20, headroom)
            total = tables + min(acc_budget, neighbors.shape[0] * slab)
            limit = None if total <= _PALLAS_VMEM_BUDGET else _PALLAS_WIDE_LIMIT
            return stencil_dkernel(splatted_pad[1:], neighbors, gc,
                                   window=window,
                                   acc_budget_bytes=acc_budget,
                                   vmem_limit_bytes=limit)
    spread = splatted_pad[neighbors + 1]                   # (F, H, C_in)
    return jax.lax.dot_general(spread, gc, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _act_grad(act_slope, y, g):
    """Cotangent through act from the saved OUTPUT (monotone activations)."""
    if act_slope is None:
        return g
    if act_slope == 0.0:
        # ReLU: y == 0 covers pre <= 0; grad 0 there matches jax.nn.relu
        return jnp.where(y > 0, g, 0)
    # leaky: y >= 0 iff pre >= 0 (slope > 0); grad 1 at 0 matches
    # jax.nn.leaky_relu
    return jnp.where(y >= 0, g, jnp.asarray(act_slope, g.dtype) * g)


def _blur_fwd_impl(act_slope, out_dtype, splatted_pad, neighbors, kernel,
                   bias):
    out = _stencil(splatted_pad, neighbors, kernel, bias=bias,
                   act_slope=act_slope, out_dtype=jnp.dtype(out_dtype))
    return _constrain_vertices(out)


def _blur_fwd(tap_negation, act_slope, out_dtype, splatted_pad, neighbors,
              kernel, bias):
    y = _blur_fwd_impl(act_slope, out_dtype, splatted_pad, neighbors,
                       kernel, bias)
    return y, (splatted_pad, neighbors, kernel, y)


def _blur_bwd(tap_negation, act_slope, out_dtype, res, g):
    """Transpose stencil conv: whoever reads vertex v via offset o is v's
    neighbor via -o, so d_splat[v] = sum_f g[nb[neg(f), v]] @ W_f^T.

    Row 0 of splatted_pad is the constant zero sentinel; its cotangent is
    dropped by the concat adjoint upstream, so we return zeros there.
    """
    splatted_pad, neighbors, kernel, y = res
    c_in = splatted_pad.shape[1]
    neg = jnp.asarray(tap_negation, dtype=jnp.int32)
    gp = _act_grad(act_slope, y, g)
    gc = gp.astype(splatted_pad.dtype)         # mixed-precision backward
    g_pad = jnp.concatenate([jnp.zeros((1, gc.shape[1]), gc.dtype), gc],
                            axis=0)

    # dW through the windowed Pallas kernel — no (F, H, C_in) spread
    d_kernel = _dkernel(splatted_pad, neighbors, gc)

    # d_splat via the negated-tap gather: same tap-major structure (and the
    # same fused Pallas kernel on TPU).  The kernel casts to the compute
    # dtype at its single HBM write (f32 accumulation inside), so the wide
    # decoder dX never round-trips f32 through HBM.
    k_t = jnp.transpose(kernel, (0, 2, 1))                 # (F, C_out, C_in)
    d_sp = _stencil(g_pad, neighbors[neg], k_t,
                    out_dtype=splatted_pad.dtype)
    d_splatted_pad = jnp.concatenate(
        [jnp.zeros((1, c_in), splatted_pad.dtype), d_sp], axis=0)
    d_bias = gp.astype(jnp.float32).sum(axis=0)
    return d_splatted_pad, None, d_kernel.astype(kernel.dtype), d_bias


blur_matmul.defvjp(_blur_fwd, _blur_bwd)


# ---------------------------------------------------------------------------
# slice (custom VJP: adjoint = unnormalized splat via the same plan)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def slice_to_points(
    blurred: jax.Array,             # (H, C)
    out_barycentric: jax.Array,     # (N, d1)
    out_lattice_offset: jax.Array,  # (N, d1) int32, -1 rows have zero bary
    plan: ReducePlan,               # same cloud/scale splat plan
) -> jax.Array:
    """Gather each point's d+1 vertices and take the barycentric combination."""
    return _slice_impl(blurred, out_barycentric, out_lattice_offset)


def _slice_impl(blurred, out_barycentric, out_lattice_offset):
    # offset -1 marks an absent vertex: an invalid point (zero barycentric)
    # OR a valid point whose vertex overflowed capacity (nonzero barycentric,
    # lattice/build.py).  The clamp would alias the latter onto row 0 — a
    # real vertex — so zero those weights explicitly.
    # One gather + weighted add per enclosing vertex: XLA fuses the multiply
    # into the gather consumer, so no (N, d1, C) intermediate (the einsum
    # form materialized + re-laid-out one, ~1.5 ms at the 8192x1024 decoder).
    h = blurred.shape[0]
    bary = jnp.where(out_lattice_offset >= 0, out_barycentric, 0.0)
    out = None
    for r in range(out_lattice_offset.shape[1]):
        safe = jnp.clip(out_lattice_offset[:, r], 0, h - 1)
        term = bary[:, r, None] * blurred[safe]
        out = term if out is None else out + term
    return out


def _slice_fwd(blurred, out_barycentric, out_lattice_offset, plan):
    out = _slice_impl(blurred, out_barycentric, out_lattice_offset)
    return out, (blurred, out_barycentric, out_lattice_offset, plan)


def _slice_bwd(res, g):
    blurred, bary, offsets, plan = res
    c = blurred.shape[1]
    # d_blurred[v] = sum over (n, r) with offset=v of bary[n,r] * g[n]:
    # the fused weighted reduction, no VJP needed inside a custom bwd
    from .segment import _wr_forward
    d_blurred = _wr_forward(False, plan, g.astype(blurred.dtype),
                            bary).astype(blurred.dtype)
    h = blurred.shape[0]
    d_bary = jnp.stack(
        [jnp.sum(g * blurred[jnp.clip(offsets[:, r], 0, h - 1)], axis=1)
         for r in range(offsets.shape[1])], axis=1)
    d_bary = jnp.where(offsets >= 0, d_bary, 0.0)
    return d_blurred, d_bary, None, None


slice_to_points.defvjp(_slice_fwd, _slice_bwd)


# ---------------------------------------------------------------------------
# module
# ---------------------------------------------------------------------------

class BilateralConv(nn.Module):
    """BCL with optional splat front-end and slice back-end.

    widths: conv channel widths; the first conv contracts the stencil axis
    (kernel ``(filter_size, C_in, widths[0])``), the rest are pointwise.
    Parameter names ``conv0, conv1, ..., slice_bias`` line up 1:1 with the
    reference's ``blur_conv`` stack + ``bias`` for weight porting.
    ``tap_negation`` is the stencil's negation permutation
    (lattice.offsets.tap_negation) used by the blur adjoint.
    """

    widths: Sequence[int]
    filter_size: int
    do_splat: bool
    do_slice: bool
    tap_negation: tuple
    use_norm: bool = True
    use_bias: bool = True
    use_leaky: bool = True
    last_relu: bool = False
    compute_dtype: str = "float32"   # matmul/gather dtype; f32 accumulation

    @nn.compact
    def __call__(
        self,
        features: jax.Array,               # (N_in, C) if do_splat else (H, C)
        in_barycentric: jax.Array | None = None,
        splat_plan: ReducePlan | None = None,
        blur_neighbors: jax.Array | None = None,   # (F, H)
        out_barycentric: jax.Array | None = None,
        out_lattice_offset: jax.Array | None = None,
        out_splat_plan: ReducePlan | None = None,
    ) -> jax.Array:
        act = _activation(self.use_leaky)
        num_input = features.shape[-1]
        dt = jnp.dtype(self.compute_dtype)

        if self.do_splat:
            # cast BEFORE the splat: under bf16 compute the fused splat
            # gathers then move half the bytes (accumulation stays f32)
            splatted_pad = splat(features.astype(dt), in_barycentric,
                                 splat_plan, normalize=self.use_norm)
        else:
            splatted_pad = jnp.concatenate(
                [jnp.zeros((1, num_input), features.dtype), features], axis=0)
        # params stay f32; compute (gathers + MXU inputs) can run bf16
        splatted_pad = splatted_pad.astype(dt)

        kernel = self.param(
            "conv0_kernel", _first_tap_init,
            (self.filter_size, num_input, self.widths[0]), jnp.float32)
        bias = self.param("conv0_bias", nn.initializers.zeros,
                          (self.widths[0],), jnp.float32)
        # bias + activation + compute-dtype cast are fused into the blur
        # kernel's epilogue (single HBM write, no f32 pre-activation
        # round-trip); slope None = linear, 0.0 = ReLU, else leaky
        if len(self.widths) > 1 or self.last_relu:
            slope = LEAKY_RATE if self.use_leaky else 0.0
        else:
            slope = None
        x = blur_matmul(self.tap_negation, slope, self.compute_dtype,
                        splatted_pad, blur_neighbors, kernel.astype(dt), bias)

        for i, w in enumerate(self.widths[1:], start=1):
            k = self.param(f"conv{i}_kernel", _dense_init,
                           (x.shape[-1], w), jnp.float32)
            b = self.param(f"conv{i}_bias", nn.initializers.zeros,
                           (w,), jnp.float32)
            x = jnp.dot(x, k.astype(dt),
                        preferred_element_type=jnp.float32) + b
            if i < len(self.widths) - 1 or self.last_relu:
                x = act(x)
            x = x.astype(dt)

        if not self.do_slice:
            return x

        sliced = slice_to_points(x, out_barycentric, out_lattice_offset,
                                 out_splat_plan)
        if self.use_bias:
            sb = self.param("slice_bias", nn.initializers.zeros,
                            (self.widths[-1],), jnp.float32)
            sliced = sliced + sb
        return sliced.astype(dt)
