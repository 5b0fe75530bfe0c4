"""End-to-end pipeline helpers: lattice spec + model forward under one jit.

The reference splits work across DataLoader workers (CPU lattice build) and
the GPU forward; here the whole thing — pyramid construction and network —
is one jittable function, so XLA sees a single static graph and batch>1 is a
plain vmap axis.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from .lattice import LatticeSpec, ScaleSpec, build_pyramid, default_capacities

__all__ = ["make_lattice_spec", "flow_forward", "batched_flow_forward"]


def make_lattice_spec(
    scales_filter_map: Sequence[Sequence[float]],
    capacities: Sequence[int] | None = None,
    num_points: int | None = None,
    d: int = 3,
) -> LatticeSpec:
    """Build a LatticeSpec from a reference-style scales_filter_map.

    Each row is (scale, blur_radius, corr_filter_radius, corr_corr_radius)
    (configs/train_ours.yaml:21-28).  ``capacities`` fixes the static vertex
    capacity per scale; if omitted it is derived heuristically from
    ``num_points``.
    """
    if capacities is None:
        if num_points is None:
            raise ValueError("need capacities or num_points")
        capacities = default_capacities(num_points, scales_filter_map)
    assert len(capacities) == len(scales_filter_map)
    scales = tuple(
        ScaleSpec(
            scale=float(row[0]),
            blur_radius=int(row[1]),
            corr_filter_radius=int(row[2]),
            corr_corr_radius=int(row[3]),
            capacity=int(cap),
        )
        for row, cap in zip(scales_filter_map, capacities)
    )
    return LatticeSpec(d=d, scales=scales)


def flow_forward(model, params, spec: LatticeSpec,
                 pc1: jax.Array, pc2: jax.Array,
                 valid1: jax.Array | None = None,
                 valid2: jax.Array | None = None,
                 adjoint_plans: bool = True) -> jax.Array:
    """Single-sample: points -> lattice pyramid -> model -> (N, 3) flow.

    Pass ``adjoint_plans=False`` for inference-only calls (skips building
    the correlation backward plans).
    """
    scales = build_pyramid(spec, pc1, pc2, valid1, valid2,
                           adjoint_plans=adjoint_plans)
    return model.apply(params, pc1, pc2, scales)


def batched_flow_forward(model, params, spec: LatticeSpec,
                         pc1: jax.Array, pc2: jax.Array,
                         valid1: jax.Array | None = None,
                         valid2: jax.Array | None = None) -> jax.Array:
    """(B, N, d) batched forward via vmap over samples."""
    def single(t):
        return flow_forward(model, params, spec, *t)

    if valid1 is None:
        valid1 = jnp.ones(pc1.shape[:2], dtype=bool)
    if valid2 is None:
        valid2 = jnp.ones(pc2.shape[:2], dtype=bool)
    # lax.map keeps the fast single-sample lowering (vmap'd sorts/gathers
    # measured 2.5x slower per sample on TPU)
    return jax.lax.map(single, (pc1, pc2, valid1, valid2))
