"""Bilateral Convolution Layer (BCL): splat -> blur -> slice, TPU-first.

Functional primitives plus a flax module with the semantics of the
reference's ``BilateralConvFlex`` (/root/reference/models/bilateralNN.py:46-238),
re-mapped onto XLA-friendly ops:

* splat: ``jax.ops.segment_sum`` scatter-add over lattice vertices with the
  reference's ``1/(density + 1e-5)`` normalization (bilateralNN.py:168-189);
  replaces the torch sparse-tensor densification (``SparseSum``, :9-43).
* blur: a scan over the stencil taps, each step a gather + one MXU matmul —
  ``acc += splatted[neighbors[:, f]] @ W[f]``.  This keeps peak memory at
  one (H, C) gather instead of the reference's (B, C, F, H) chunked
  fancy-indexing (:199-221) and feeds the MXU large (H, C)x(C, O) matmuls.
* slice: gather the d+1 enclosing vertices per point + barycentric
  contraction (:223-238).

Everything is single-sample (no batch dim); batch via ``jax.vmap``.
Index conventions match the builder: vertex id ``-1`` = absent; all gathers
go through a zero-padded row 0 (ids shifted by +1), mirroring the
reference's index-0 sentinel trick (:158-164, :192-196).
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

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


def splat(
    features: jax.Array,        # (N, C)
    barycentric: jax.Array,     # (N, d1)
    lattice_offset: jax.Array,  # (N, d1) int32, -1 = absent/invalid
    capacity: int,
    normalize: bool = True,
) -> jax.Array:
    """Barycentric scatter-add of point features onto lattice vertices.

    Returns ``(capacity + 1, C)`` with row 0 the all-zero sentinel row
    (invalid points carry zero barycentric weight, so they are inert).
    """
    num_input = features.shape[-1]
    ids = (lattice_offset + 1).reshape(-1)                        # (N*d1,)
    vals = (features[:, None, :] * barycentric[:, :, None]).reshape(-1, num_input)
    out = jax.ops.segment_sum(vals, ids, num_segments=capacity + 1)
    if normalize:
        density = jax.ops.segment_sum(
            barycentric.reshape(-1), ids, num_segments=capacity + 1)
        out = out * (1.0 / (density + NORM_EPS))[:, None]
    return out


def blur_matmul(
    splatted_pad: jax.Array,   # (H+1, C_in), row 0 = zero sentinel
    neighbors: jax.Array,      # (F, H) int32, -1 = absent
    kernel: jax.Array,         # (F, C_in, C_out)
    bias: jax.Array,           # (C_out,)
) -> jax.Array:
    """Stencil convolution over the lattice as F gather+matmul steps."""
    capacity = neighbors.shape[1]
    out_dim = kernel.shape[-1]

    def step(acc, inputs):
        nb_f, k_f = inputs                                # (H,), (C_in, C_out)
        gathered = splatted_pad[nb_f + 1]                 # (H, C_in)
        return acc + jnp.dot(gathered, k_f,
                             preferred_element_type=jnp.float32), None

    acc0 = jnp.broadcast_to(bias.astype(jnp.float32), (capacity, out_dim))
    acc, _ = jax.lax.scan(step, acc0, (neighbors, kernel))
    return _constrain_vertices(acc)


def slice_to_points(
    blurred: jax.Array,             # (H, C)
    out_barycentric: jax.Array,     # (N, d1)
    out_lattice_offset: jax.Array,  # (N, d1) int32, -1 rows masked by zero bary
) -> jax.Array:
    """Gather each point's d+1 vertices and take the barycentric combination."""
    safe = jnp.clip(out_lattice_offset, 0, blurred.shape[0] - 1)
    gathered = blurred[safe]                               # (N, d1, C)
    return jnp.einsum("nr,nrc->nc", out_barycentric, gathered)


class BilateralConv(nn.Module):
    """BCL with optional splat front-end and slice back-end.

    widths: conv channel widths; the first conv contracts the stencil axis
    (kernel ``(filter_size, C_in, widths[0])``), the rest are pointwise.
    Parameter names ``conv0, conv1, ..., slice_bias`` line up 1:1 with the
    reference's ``blur_conv`` stack + ``bias`` for weight porting.
    """

    widths: Sequence[int]
    filter_size: int
    do_splat: bool
    do_slice: bool
    use_norm: bool = True
    use_bias: bool = True
    use_leaky: bool = True
    last_relu: bool = False

    @nn.compact
    def __call__(
        self,
        features: jax.Array,               # (N_in, C) if do_splat else (H, C)
        in_barycentric: jax.Array | None = None,
        in_lattice_offset: jax.Array | None = None,
        blur_neighbors: jax.Array | None = None,   # (F, H)
        out_barycentric: jax.Array | None = None,
        out_lattice_offset: jax.Array | None = None,
    ) -> jax.Array:
        capacity = blur_neighbors.shape[1]
        act = _activation(self.use_leaky)
        num_input = features.shape[-1]

        if self.do_splat:
            splatted_pad = splat(features, in_barycentric, in_lattice_offset,
                                 capacity, normalize=self.use_norm)
        else:
            splatted_pad = jnp.concatenate(
                [jnp.zeros((1, num_input), features.dtype), features], axis=0)

        kernel = self.param(
            "conv0_kernel", _first_tap_init,
            (self.filter_size, num_input, self.widths[0]), jnp.float32)
        bias = self.param("conv0_bias", nn.initializers.zeros,
                          (self.widths[0],), jnp.float32)
        x = blur_matmul(splatted_pad, blur_neighbors, kernel, bias)
        if len(self.widths) > 1 or self.last_relu:
            x = act(x)

        for i, w in enumerate(self.widths[1:], start=1):
            k = self.param(f"conv{i}_kernel", _dense_init,
                           (x.shape[-1], w), jnp.float32)
            b = self.param(f"conv{i}_bias", nn.initializers.zeros,
                           (w,), jnp.float32)
            x = jnp.dot(x, k, preferred_element_type=jnp.float32) + b
            if i < len(self.widths) - 1 or self.last_relu:
                x = act(x)

        if not self.do_slice:
            return x

        sliced = slice_to_points(x, out_barycentric, out_lattice_offset)
        if self.use_bias:
            sb = self.param("slice_bias", nn.initializers.zeros,
                            (self.widths[-1],), jnp.float32)
            sliced = sliced + sb
        return sliced
