"""Correlation BCL: cross-cloud patch correlation on the lattice.

Semantics of the reference ``BilateralCorrelationFlex``
(/root/reference/models/bnn_flow.py:10-210), restructured for TPU:

The reference materializes ``spread_out2`` of shape (B, C, F, Cc, H1) and
runs a Conv3d with kernel (1, Cc, 1) (bnn_flow.py:189-205) — a huge gather
buffer it has to chunk.  Because that first conv is linear before its
activation, it splits into a *self* term (same for every displacement f) and
a *cross* term:

    y[f] = act(spread1 @ W_self + spread2[f] @ W_cross + b)

so we compute the self matmul once and scan over the 15 displacement taps,
keeping peak memory at one (H1, Cc, C) gather while every step is an MXU
matmul.  The displacement-filtering stage is the same stencil contraction as
the BCL blur.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .bcl import (splat, _activation, _dense_init, _first_tap_init,
                  _constrain_vertices)

__all__ = ["BilateralCorrelation"]


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
    prev_corr_dim: int = 0
    use_norm: bool = True
    use_leaky: bool = True
    last_relu: bool = False

    @nn.compact
    def __call__(
        self,
        feat1: jax.Array,                     # (H1, C) cloud-1 vertex features
        feat2: jax.Array,                     # (H2, C) cloud-2 vertex features
        prev_corr_feat: jax.Array | None,     # (N_in, prev) finer-scale output
        barycentric1: jax.Array | None,       # (N_in, d1)
        lattice_offset1: jax.Array | None,    # (N_in, d1)
        pc1_corr_indices: jax.Array,          # (Cc, H1)
        pc2_corr_indices: jax.Array,          # (F, Cc, H1)
    ) -> jax.Array:
        h1, num_input = feat1.shape
        act = _activation(self.use_leaky)
        self_dim = num_input + self.prev_corr_dim

        pad1 = jnp.concatenate(
            [jnp.zeros((1, num_input), feat1.dtype), feat1], axis=0)
        if self.prev_corr_dim:
            # splat the finer-scale correlation output onto this scale's
            # cloud-1 lattice (reference :119-168)
            prev_pad = splat(prev_corr_feat, barycentric1, lattice_offset1,
                             h1, normalize=self.use_norm)
            combined1 = jnp.concatenate([prev_pad, pad1], axis=-1)
        else:
            combined1 = pad1
        pad2 = jnp.concatenate(
            [jnp.zeros((1, num_input), feat2.dtype), feat2], axis=0)

        # ---- patch-correlation stage ----
        wc0 = self.corr_widths[0]
        corr_kernel = self.param(
            "corr0_kernel", _first_tap_init,
            (self.corr_size, self_dim + num_input, wc0), jnp.float32)
        corr_bias = self.param("corr0_bias", nn.initializers.zeros,
                               (wc0,), jnp.float32)
        # channel order matches the reference concat (prev+self | cross)
        k_self = corr_kernel[:, :self_dim, :]
        k_cross = corr_kernel[:, self_dim:, :]

        spread1 = combined1[pc1_corr_indices + 1]          # (Cc, H1, self_dim)
        a_self = jnp.einsum("khc,kco->ho", spread1, k_self,
                            preferred_element_type=jnp.float32) + corr_bias

        extra = []
        for i, w in enumerate(self.corr_widths[1:], start=1):
            k = self.param(f"corr{i}_kernel", _dense_init,
                           (self.corr_widths[i - 1], w), jnp.float32)
            b = self.param(f"corr{i}_bias", nn.initializers.zeros,
                           (w,), jnp.float32)
            extra.append((k, b))

        def per_displacement(_, idx_f):
            sp2 = pad2[idx_f + 1]                          # (Cc, H1, C)
            y = act(a_self + jnp.einsum("khc,kco->ho", sp2, k_cross,
                                        preferred_element_type=jnp.float32))
            for k, b in extra:
                y = act(jnp.dot(y, k, preferred_element_type=jnp.float32) + b)
            return None, y

        _, correlated = jax.lax.scan(per_displacement, None, pc2_corr_indices)
        # correlated: (F, H1, corr_widths[-1])

        # ---- displacement-filtering stage ----
        w0 = self.widths[0]
        blur_kernel = self.param(
            "blur0_kernel", _first_tap_init,
            (self.filter_size, self.corr_widths[-1], w0), jnp.float32)
        blur_bias = self.param("blur0_bias", nn.initializers.zeros,
                               (w0,), jnp.float32)
        x = jnp.einsum("fhw,fwo->ho", correlated, blur_kernel,
                       preferred_element_type=jnp.float32) + blur_bias
        if len(self.widths) > 1 or self.last_relu:
            x = act(x)

        for i, w in enumerate(self.widths[1:], start=1):
            k = self.param(f"blur{i}_kernel", _dense_init,
                           (x.shape[-1], w), jnp.float32)
            b = self.param(f"blur{i}_bias", nn.initializers.zeros,
                           (w,), jnp.float32)
            x = jnp.dot(x, k, preferred_element_type=jnp.float32) + b
            if i < len(self.widths) - 1 or self.last_relu:
                x = act(x)
        return _constrain_vertices(x)
