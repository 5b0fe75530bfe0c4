"""Slow numpy oracle for the permutohedral lattice build.

Independent transcription of the *behavior* of the reference pipeline
(/root/reference/transforms/transforms.py: get_keys_and_barycentric at
:300-353 and build_unsymmetric at :133-261) using plain numpy and python
dicts in place of torch + the C khash table.  Used only as a golden oracle in
tests; intentionally simple and unvectorized where that aids auditability.
"""

from __future__ import annotations

import math

import numpy as np


def elevation_matrix_np(d: int) -> np.ndarray:
    left = np.triu(np.ones((d + 1, d), dtype=np.float32))
    left[1:, :] += np.diag(np.arange(-1, -d - 1, -1, dtype=np.float32))
    denom = np.sqrt(
        np.arange(1, d + 1, dtype=np.float32) * np.arange(2, d + 2, dtype=np.float32)
    )
    right = np.diag((1.0 / denom).astype(np.float32))
    return (left @ right).astype(np.float32)


def canonical_np(d: int) -> np.ndarray:
    d1 = d + 1
    canonical = np.tile(np.arange(d1, dtype=np.int64), (d1, 1))
    for i in range(1, d1):
        canonical[-i:, i] = i - d1
    return canonical


def keys_and_barycentric_np(points: np.ndarray, scale: float, d: int = 3):
    """points (N, d) float32 -> (keys (N, d1, d1) int64, bary (N, d1), el (N, d1))."""
    d1 = d + 1
    E = elevation_matrix_np(d)
    expected_std = np.float32((d + 1) * math.sqrt(2.0 / 3.0))

    elevated = (points.astype(np.float32) * np.float32(scale)) @ E.T.astype(np.float32)
    elevated = elevated * expected_std                                 # (N, d1)
    return simplex_from_elevated_np(elevated, d)


def simplex_from_elevated_np(elevated: np.ndarray, d: int = 3):
    d1 = d + 1
    elevated = elevated.astype(np.float32)
    greedy = np.round(elevated / d1) * d1
    el_minus_gr = elevated - greedy

    # rank[n, c] = descending-order position of coordinate c (stable ties)
    order = np.argsort(-el_minus_gr, axis=1, kind="stable")
    rank = np.argsort(order, axis=1, kind="stable").astype(np.int64)

    remainder_sum = greedy.sum(axis=1, keepdims=True) / d1
    rank_f = rank.astype(np.float32)
    cond = (
        ((rank_f >= d1 - remainder_sum) & (remainder_sum > 0))
        | ((rank_f < -remainder_sum) & (remainder_sum < 0))
    ).astype(np.float32)
    sign = np.where(remainder_sum > 0, -1.0, np.where(remainder_sum < 0, 1.0, 0.0))
    sign = sign.astype(np.float32)

    greedy = greedy + d1 * sign * cond
    rank = rank + (d1 * sign * cond).astype(np.int64)
    rank = rank + remainder_sum.astype(np.int64)

    el_minus_gr = elevated - greedy

    n = elevated.shape[0]
    rows = np.arange(n)[:, None]
    bary = np.zeros((n, d1 + 1), dtype=np.float32)
    np.add.at(bary, (rows, d - rank), el_minus_gr)
    np.add.at(bary, (rows, d1 - rank), -el_minus_gr)
    bary /= d1
    bary[:, 0] += 1.0 + bary[:, d1]
    bary = bary[:, :d1]

    canonical = canonical_np(d)
    # keys[n, r, c] = greedy[n, c] + canonical[rank[n, c], r]
    keys = greedy.astype(np.int64)[:, None, :] + np.transpose(
        canonical[rank], (0, 2, 1)
    )
    return keys, bary, el_minus_gr


def stencil_np(radius: int, d: int) -> np.ndarray:
    """Recursive stencil walk mirroring Traverse.walk_cuboid (:103-130)."""
    d1 = d + 1
    out = []

    def advance(key, dim):
        key = key.copy() - 1
        key[dim] += d1
        return key

    def walk(start_key, dim, has_zero):
        if dim <= d:
            key = start_key.copy()
            range_end = radius + 1 if (has_zero or dim < d) else 1
            for i in range(range_end):
                walk(key, dim + 1, has_zero or i == 0)
                key = advance(key, dim)
        else:
            out.append(start_key.copy())

    walk(np.zeros(d1, dtype=np.int64), 0, False)
    return np.stack(out)


def build_tables_np(keys1, keys2, blur_radius, corr_filter_radius,
                    corr_corr_radius, d: int = 3):
    """Dict-based dense-id assignment + neighbor/corr tables.

    Ids are assigned in first-visit (point-major, remainder-minor) order like
    the reference; tests compare against the jax build up to id permutation.
    Returns a dict of numpy arrays in reference layouts.
    """
    d1 = d + 1

    def assign(keys):
        table = {}
        inv = []
        n = keys.shape[0]
        offsets = np.empty((n, d1), dtype=np.int64)
        for p in range(n):
            for r in range(d1):
                k = tuple(int(v) for v in keys[p, r])
                if k not in table:
                    table[k] = len(inv)
                    inv.append(k)
                offsets[p, r] = table[k]
        return table, inv, offsets

    table1, inv1, off1 = assign(keys1)
    table2, inv2, off2 = assign(keys2)
    h1, h2 = len(inv1), len(inv2)

    out = {
        "pc1_lattice_offset": off1,
        "pc2_lattice_offset": off2,
        "pc1_keys": np.array(inv1, dtype=np.int64),
        "pc2_keys": np.array(inv2, dtype=np.int64),
    }

    if blur_radius != -1:
        offs = stencil_np(blur_radius, d)
        fs = offs.shape[0]

        def blur(table, inv):
            nb = np.full((len(inv), fs), -1, dtype=np.int64)
            for h, key in enumerate(inv):
                for f in range(fs):
                    q = tuple(int(v) for v in (np.array(key) + offs[f]))
                    nb[h, f] = table.get(q, -1)
            return nb

        out["pc1_blur_neighbors"] = blur(table1, inv1)
        out["pc2_blur_neighbors"] = blur(table2, inv2)

    if corr_filter_radius != -1:
        f_offs = stencil_np(corr_filter_radius, d)
        c_offs = stencil_np(corr_corr_radius, d)
        nf, nc = f_offs.shape[0], c_offs.shape[0]
        pc1_corr = np.full((h1, nc), -1, dtype=np.int64)
        pc2_corr = np.full((nf, h1, nc), -1, dtype=np.int64)
        for h, key in enumerate(inv1):
            key = np.array(key)
            for c in range(nc):
                center = key + c_offs[c]
                pc1_corr[h, c] = table1.get(tuple(int(v) for v in center), -1)
                for f in range(nf):
                    q = tuple(int(v) for v in (center + f_offs[f]))
                    pc2_corr[f, h, c] = table2.get(q, -1)
        out["pc1_corr_indices"] = pc1_corr
        out["pc2_corr_indices"] = pc2_corr

    return out
