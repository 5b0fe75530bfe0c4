"""Permutohedral lattice geometry: elevation, rounding, barycentric weights.

Pure-JAX, points-major (channels-last) implementation of the lattice-point
assignment that the reference computes per sample on the host with torch-CPU
(/root/reference/transforms/transforms.py:300-353,
``GenerateDataUnsymmetric.get_keys_and_barycentric``).  Everything here is
jittable, vmappable and static-shape.

Math recap (Adams et al., "Fast High-Dimensional Filtering Using the
Permutohedral Lattice"): a d-dim point is elevated onto the hyperplane
``sum(x) == 0`` in (d+1)-dim space, rounded to the nearest remainder-0 lattice
point, and its enclosing simplex is found by ranking the rounding residuals.
Each point gets d+1 lattice keys (one per remainder) and d+1 barycentric
weights.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "elevation_matrix",
    "canonical_matrix",
    "expected_std",
    "PermutohedralGeometry",
    "KeysBarycentric",
]


def expected_std(d: int) -> float:
    """Scale factor so unit-variance data spans ~2 lattice cells (reference :275)."""
    return (d + 1) * math.sqrt(2.0 / 3.0)


@lru_cache(maxsize=None)
def elevation_matrix(d: int) -> np.ndarray:
    """The (d+1, d) elevation matrix E with zero column sums.

    ``E[:, j]`` has j+1 entries equal to 1/sqrt((j+1)(j+2)), then one entry
    ``-(j+1)/sqrt((j+1)(j+2))``, then zeros — an orthogonal basis of the
    ``sum == 0`` hyperplane.  Matches the construction at
    /root/reference/transforms/transforms.py:271-276 bit-for-bit in float32.
    """
    left = np.triu(np.ones((d + 1, d), dtype=np.float32))
    left[1:, :] += np.diag(np.arange(-1, -d - 1, -1, dtype=np.float32))
    scale = np.sqrt(
        np.arange(1, d + 1, dtype=np.float32) * np.arange(2, d + 2, dtype=np.float32)
    )
    right = np.diag((1.0 / scale).astype(np.float32))
    return (left @ right).astype(np.float32)


@lru_cache(maxsize=None)
def canonical_matrix(d: int) -> np.ndarray:
    """The (d+1, d+1) canonical simplex offsets, row-indexed by coordinate rank.

    Column r holds the key offset for remainder-r vertices: the first d+1-r
    rows are ``r`` and the last r rows are ``r - d - 1``
    (reference :281-285).
    """
    d1 = d + 1
    canonical = np.tile(np.arange(d1, dtype=np.int32), (d1, 1))
    for i in range(1, d1):
        canonical[-i:, i] = i - d1
    return canonical


class KeysBarycentric(NamedTuple):
    """Per-point simplex assignment for one cloud at one lattice scale."""

    keys: jax.Array          # (N, d1, d1) int32 — keys[n, r, :] = key of remainder-r vertex
    barycentric: jax.Array   # (N, d1) float32 — weight of remainder-r vertex
    el_minus_gr: jax.Array   # (N, d1) float32 — position-in-simplex feature


class PermutohedralGeometry:
    """Precomputed constants + the elevate/round/rank kernel for dimension d."""

    def __init__(self, d: int):
        self.d = d
        self.d1 = d + 1
        self.expected_std = expected_std(d)
        self.elevate_mat = jnp.asarray(elevation_matrix(d))
        self.canonical = jnp.asarray(canonical_matrix(d))

    def elevate(self, points: jax.Array, scale: float) -> jax.Array:
        """(N, d) metric points -> (N, d1) elevated coords at lattice ``scale``.

        The optimization_barrier pins the rounded f32 elevated values: XLA
        otherwise FMA-contracts the trailing multiply into downstream
        residual subtractions, flipping rounding ties (see _next_elevated).
        """
        scaled = points.astype(jnp.float32) * jnp.float32(scale)
        return jax.lax.optimization_barrier(
            jnp.matmul(scaled, self.elevate_mat.T, precision=jax.lax.Precision.HIGHEST)
            * jnp.float32(self.expected_std)
        )

    def unelevate(self, keys: jax.Array, scale: float) -> jax.Array:
        """(H, d1) lattice keys -> (H, d) metric coordinates (reference :461-469)."""
        un = keys.astype(jnp.float32) / jnp.float32(self.expected_std * scale)
        return jnp.matmul(un, self.elevate_mat, precision=jax.lax.Precision.HIGHEST)

    def keys_and_barycentric(self, points: jax.Array, scale: float) -> KeysBarycentric:
        """Simplex keys + barycentric weights for (N, d) points.

        Behavior-parity target: reference :300-353 (validated against a numpy
        oracle in tests/oracle/lattice_oracle.py).
        """
        return self.simplex_from_elevated(self.elevate(points, scale))

    def simplex_from_elevated(self, elevated: jax.Array) -> KeysBarycentric:
        """Simplex assignment from already-elevated (N, d1) coordinates.

        Splitting elevation out matters for determinism: deeper pyramid
        scales derive their elevated coords *elementwise* from integer keys
        (``key * scale_ratio``), never through a float matmul whose reduction
        order could flip rounding ties (the reference's un-elevate/re-elevate
        roundtrip at transforms.py:461-469 is tie-unstable in exactly this
        way).
        """
        d, d1 = self.d, self.d1
        greedy = jnp.round(elevated / d1) * d1                        # nearest remainder-0
        el_minus_gr = elevated - greedy

        # rank[n, c] = position of coordinate c in descending residual order
        # (stable, ties broken by coordinate index) — computed by compare
        # counting: rank-2 (N, d1) argsorts are a TPU sort pathology
        # (CLAUDE.md), while the (N, d1, d1) compare grid is 16 elementwise
        # ops per point.  Identical tie semantics to a stable descending
        # argsort: j precedes c iff v[j] > v[c], or v[j] == v[c] and j < c.
        v_c = el_minus_gr[:, :, None]                         # (N, c, 1)
        v_j = el_minus_gr[:, None, :]                         # (N, 1, j)
        idx = jnp.arange(d1, dtype=jnp.int32)
        before = (v_j > v_c) | ((v_j == v_c)
                                & (idx[None, None, :] < idx[None, :, None]))
        rank = jnp.sum(before.astype(jnp.int32), axis=2)      # (N, d1)

        # The rounded point may be off the sum==0 plane by d1*k; fix by moving
        # the k largest (or smallest) residual coordinates to the next lattice
        # plane (reference :322-334).
        remainder_sum = greedy.sum(axis=1, keepdims=True) / d1        # (N, 1) float
        rank_f = rank.astype(jnp.float32)
        cond = (
            ((rank_f >= d1 - remainder_sum) & (remainder_sum > 0))
            | ((rank_f < -remainder_sum) & (remainder_sum < 0))
        ).astype(jnp.float32)
        sign = jnp.where(remainder_sum > 0, -1.0, 0.0) + jnp.where(
            remainder_sum < 0, 1.0, 0.0
        )
        greedy = greedy + d1 * sign * cond
        rank = rank + (d1 * sign * cond).astype(jnp.int32)
        rank = rank + remainder_sum.astype(jnp.int32)

        # Barycentric coordinates from the rank-sorted residuals
        # (reference :337-345).  With s[k] = residual of the rank-k
        # coordinate (descending) and u[k] = s[d - k] its ascending mirror,
        # bary[0] = 1 + (u[0] - u[d]) / d1 and bary[j] = (u[j] - u[j-1]) / d1
        # — the reference's scatter-add collapses to ascending-order
        # differences.  u comes from a masked sum over the (N, d1, d1)
        # rank-match grid: no one-hot matmul, no scatter, no concat shuffle.
        el_minus_gr = elevated - greedy
        u = jnp.sum(jnp.where(rank[:, :, None] == (d - idx)[None, None, :],
                              el_minus_gr[:, :, None], 0.0), axis=1)  # (N, d1)
        bary0 = 1.0 + (u[:, :1] - u[:, d:]) / d1
        bary = jnp.concatenate([bary0, (u[:, 1:] - u[:, :-1]) / d1], axis=1)

        # keys[n, r, c] = greedy[n, c] + canonical[rank[n, c], r]; the
        # canonical matrix is canonical[i, r] = r - d1 * (i + r >= d1)
        # (canonical_matrix docstring), so the gather is pure arithmetic.
        r_ax = idx[None, :, None]                             # remainder axis
        keys = (greedy.astype(jnp.int32)[:, None, :] + r_ax
                - d1 * ((rank[:, None, :] + r_ax) >= d1).astype(jnp.int32))
        return KeysBarycentric(keys=keys, barycentric=bary, el_minus_gr=el_minus_gr)
