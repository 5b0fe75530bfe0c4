"""Device mesh construction."""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(axis_sizes: Sequence[int] | None = None,
              axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """Create a Mesh over the available devices.

    ``axis_sizes=None`` puts all devices on the first axis.  For TPU pods,
    jax's device order already follows the physical torus, so a simple
    reshape keeps collectives on ICI neighbors.
    """
    devices = devices if devices is not None else jax.devices()
    if axis_sizes is None:
        axis_sizes = (len(devices),) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(axis_sizes)) == len(devices), (
        f"mesh {axis_sizes} != {len(devices)} devices")
    dev_array = np.asarray(devices).reshape(tuple(axis_sizes))
    return Mesh(dev_array, axis_names=tuple(axis_names))
