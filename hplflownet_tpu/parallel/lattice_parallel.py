"""Lattice-axis (vertex) sharding — the SP/CP analog for point clouds.

For 32k-100k point clouds a single sample's lattice work dominates; this
shards the vertex axis of every BCL/correlation intermediate across the
``lattice`` mesh axis through GSPMD sharding constraints installed via the
ops' trace-time hook (:func:`hplflownet_tpu.ops.bcl.vertex_constraint`).
XLA then partitions the gather+matmul stencil work per shard and inserts the
necessary collectives (the splatted table is small and replicated; outputs
stay sharded).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..lattice import LatticeSpec, build_pyramid
from ..ops.bcl import vertex_constraint

__all__ = ["lattice_sharded_forward"]


def lattice_sharded_forward(model, spec: LatticeSpec, mesh: Mesh,
                            lattice_axis: str = "lattice"):
    """Build a jitted single-sample forward with vertex-axis sharding.

    Use for big single clouds (batch handled by the ``data`` axis instead).
    Returns ``fn(params, pc1, pc2) -> flow``.
    """
    vertex_sh = NamedSharding(mesh, P(lattice_axis))

    def constrain(x):
        # shard the leading (vertex) axis, replicate channels
        spec_ = P(*((lattice_axis,) + (None,) * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, spec_))

    def forward(params, pc1, pc2):
        scales = build_pyramid(spec, pc1, pc2)
        with vertex_constraint(constrain):
            return model.apply(params, pc1, pc2, scales)

    replicated = NamedSharding(mesh, P())
    del vertex_sh
    return jax.jit(forward,
                   in_shardings=(replicated, replicated, replicated),
                   out_shardings=replicated)
