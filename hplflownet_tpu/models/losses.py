"""Losses (reference: models/epe3d_loss.py:5-10)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["epe3d_loss"]


def epe3d_loss(pred: jax.Array, target: jax.Array,
               valid: jax.Array | None = None) -> jax.Array:
    """Per-point end-point error ||pred - target||_2 over the channel axis.

    pred/target: (..., N, 3).  With ``valid`` (..., N) the mean is taken over
    valid points only (padding support); otherwise returns the per-point map
    like the reference (callers take .mean()).
    """
    err = jnp.linalg.norm(pred - target, axis=-1)
    if valid is None:
        return err
    w = valid.astype(err.dtype)
    return jnp.sum(err * w) / jnp.maximum(jnp.sum(w), 1.0)
