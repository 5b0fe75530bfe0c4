"""Lattice-axis sharding — the SP/CP analog for point clouds.

For 32k-100k point clouds a single sample's lattice work dominates.  Two
mechanisms shard the real work across the ``lattice`` mesh axis:

* **Pyramid probes** (the build's dominant cost — the stencil sort-merge
  joins) run under :func:`hplflownet_tpu.lattice.probe_sharding`: shard_map
  over the stencil-tap axis, each device sorting only its taps' queries
  against a replicated copy of the small packed-key table (2 x H int32).
* **Model compute**: GSPMD sharding constraints on every vertex-major
  BCL/correlation intermediate (via the ops' trace-time hook
  :func:`hplflownet_tpu.ops.bcl.vertex_constraint`), which makes XLA
  partition the blur/corr gather+matmul over vertex shards with the splatted
  table replicated.

Evidence that this shards compute (not just storage) is tested by
per-device FLOP counts from the compiled executable (tests/test_sharding.py).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..lattice import LatticeSpec, build_pyramid, probe_sharding
from ..ops.bcl import vertex_constraint

__all__ = ["lattice_sharded_forward"]


def lattice_sharded_forward(model, spec: LatticeSpec, mesh: Mesh,
                            lattice_axis: str = "lattice",
                            jit: bool = True):
    """Build a jitted single-sample forward with lattice-axis sharding.

    Use for big single clouds (batch handled by the ``data`` axis instead).
    Returns ``fn(params, pc1, pc2) -> flow``.
    """

    def constrain(x):
        # shard the leading (vertex) axis, replicate channels
        spec_ = P(*((lattice_axis,) + (None,) * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, spec_))

    def forward(params, pc1, pc2):
        with probe_sharding(mesh, lattice_axis):
            scales = build_pyramid(spec, pc1, pc2)
        with vertex_constraint(constrain):
            return model.apply(params, pc1, pc2, scales)

    if not jit:
        return forward
    replicated = NamedSharding(mesh, P())
    return jax.jit(forward,
                   in_shardings=(replicated, replicated, replicated),
                   out_shardings=replicated)
