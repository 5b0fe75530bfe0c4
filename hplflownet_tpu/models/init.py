"""Configurable weight initialization (reference: main_utils.py:33-50).

The reference applies ``init_weights_multi`` post-hoc over every Conv/Linear
module (``main.py:100-101``), dispatching on ``args.init``:

* ``normal``     — N(0, gain)         (torch ``init.normal_(w, 0.0, gain)``)
* ``xavier``     — xavier_normal with ``gain``
* ``kaiming``    — kaiming_normal, a=0, mode=fan_in (gain ignored, like torch)
* ``orthogonal`` — orthogonal rows scaled by ``gain``

and zeroes every bias.  We mirror that shape exactly: models are built with
their burned-in default (glorot_normal == xavier @ gain 1, ops/bcl.py:73-74)
and :func:`reinit_params` re-draws the parameter pytree afterwards.  Kernel
leaves are identified by their ``*_kernel`` names and treated with
``in_axis=-2, out_axis=-1`` (leading axes are receptive field — matching the
torch Conv fan computation where weight is (C_out, C_in, F, 1)); ``*_bias``
leaves are zeroed.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["reinit_params", "INIT_SCHEMES"]

INIT_SCHEMES = ("normal", "xavier", "kaiming", "orthogonal")


def _fans(shape):
    """(fan_in, fan_out) with in_axis=-2, out_axis=-1, leading = receptive."""
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    return shape[-2] * receptive, shape[-1] * receptive


def _draw_kernel(key, shape, dtype, scheme: str, gain: float):
    fan_in, fan_out = _fans(shape)
    if scheme == "normal":
        return gain * jax.random.normal(key, shape, dtype)
    if scheme == "xavier":
        std = gain * np.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(key, shape, dtype)
    if scheme == "kaiming":
        # torch kaiming_normal_(a=0, mode='fan_in'): std = sqrt(2 / fan_in)
        std = np.sqrt(2.0 / fan_in)
        return std * jax.random.normal(key, shape, dtype)
    if scheme == "orthogonal":
        # torch orthogonal_ flattens all but the out axis; ours is columns
        flat = (int(np.prod(shape[:-1])), shape[-1])
        w = jax.nn.initializers.orthogonal(scale=gain, column_axis=-1)(
            key, flat, dtype)
        return w.reshape(shape)
    raise NotImplementedError(
        f"initialization method [{scheme}] is not implemented")


def reinit_params(rng: jax.Array, params, scheme: str = "xavier",
                  gain: float = 1.0):
    """Re-draw every ``*_kernel`` leaf per ``scheme`` and zero every
    ``*_bias`` leaf, like the reference's ``model.apply(init_weights_multi)``.

    Raises ``NotImplementedError`` on unknown schemes (reference
    main_utils.py:44-45), so a typo'd config fails loudly instead of
    silently training with the default init.
    """
    if scheme not in INIT_SCHEMES:
        raise NotImplementedError(
            f"initialization method [{scheme}] is not implemented")
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(rng, max(len(leaves), 1))
    out = []
    for (path, leaf), key in zip(leaves, keys):
        name = str(path[-1].key if hasattr(path[-1], "key") else path[-1])
        if name.endswith("kernel"):
            out.append(_draw_kernel(key, leaf.shape, leaf.dtype, scheme,
                                    float(gain)))
        elif name.endswith("bias"):
            out.append(jnp.zeros_like(leaf))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)
