"""Small shared layers: pointwise MLPs (the reference's Conv1dReLU stacks)."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.bcl import _activation, _dense_init

__all__ = ["PointMLP"]


class PointMLP(nn.Module):
    """Stack of pointwise dense+activation layers over (N, C) features.

    Equivalent to the reference's chains of ``Conv1dReLU`` (kernel 1)
    (/root/reference/models/module_utils.py:9-24); pointwise convs are plain
    channel matmuls in channels-last layout.  ``last_act=False`` leaves the
    final layer linear (used by the prediction head's conv4).
    """

    widths: Sequence[int]
    use_leaky: bool = True
    last_act: bool = True
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        act = _activation(self.use_leaky)
        dt = jnp.dtype(self.compute_dtype)
        for i, w in enumerate(self.widths):
            k = self.param(f"dense{i}_kernel", _dense_init,
                           (x.shape[-1], w), jnp.float32)
            b = self.param(f"dense{i}_bias", nn.initializers.zeros,
                           (w,), jnp.float32)
            x = jnp.dot(x.astype(dt), k.astype(dt),
                        preferred_element_type=jnp.float32) + b
            if i < len(self.widths) - 1 or self.last_act:
                # intermediate activations stored in the compute dtype; the
                # final (possibly linear) output stays f32 — conv4 is the
                # flow prediction head
                x = act(x).astype(dt)
        return x
