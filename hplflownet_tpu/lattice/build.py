"""Sort-based on-device lattice construction with static shapes.

This replaces the reference's host-side C hash table + Numba builder
(/root/reference/transforms/transforms.py:133-261, models/khash.h) with a
TPU-friendly pipeline that runs inside ``jax.jit``:

1. Pack each (d+1)-int lattice key into a pair of int32 words (keys sum to
   zero, so the last coordinate is dropped).  int32 pairs keep everything in
   TPU-native 32-bit arithmetic — no int64 emulation.
2. ``lax.sort`` the packed keys lexicographically (``num_keys=2``) and mark
   first-occurrences to assign dense vertex ids; scatter the unique keys into
   a static-``capacity`` sorted vertex table (sentinel-padded).
3. All lookups (per-point vertex ids, blur-neighbor tables, correlation
   tables) become vectorized branchless binary searches over that table.

The variable per-sample ``hash_cnt`` of the reference
(transforms/transforms.py:390-391) becomes a static per-scale ``capacity``;
vertices beyond capacity are dropped (counted in ``overflow`` for
monitoring) and missing neighbors are ``-1`` exactly like the reference.

Index layout: neighbor/correlation tables are stencil-major — ``(F, H)``,
``(Cc, H)``, ``(F, Cc, H)`` — keeping the large lattice axis minor.  TPU
arrays tile as (8, 128) over the last two dims, so a minor dim of 15 would
pad 8.5x in HBM (measured: 45MB tables ballooning to 390MB).
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import PermutohedralGeometry
from .offsets import neighborhood_offsets
from ..ops.segment import ReducePlan, local_ranks, make_reduce_plan

__all__ = [
    "probe_sharding",
    "ScaleSpec",
    "LatticeSpec",
    "CloudLattice",
    "ScalePair",
    "build_cloud_lattice",
    "build_pyramid",
    "default_capacities",
]

# 15 bits per packed coordinate: lattice keys are elevated coords rounded to
# multiples of d+1; for metric scene-flow data (|x| <~ 100 m, scales <= 3)
# they stay well inside +-16383.
_COORD_BITS = 15
_COORD_BIAS = 1 << (_COORD_BITS - 1)
_SENTINEL = np.int32(np.iinfo(np.int32).max)


class ScaleSpec(NamedTuple):
    """One row of the reference's ``scales_filter_map`` plus a static capacity."""

    scale: float
    blur_radius: int          # -1 => no blur tables at this scale
    corr_filter_radius: int   # -1 => no correlation at this scale
    corr_corr_radius: int
    capacity: int             # static max #lattice vertices per cloud


class LatticeSpec(NamedTuple):
    d: int
    scales: tuple  # tuple[ScaleSpec, ...]

    @property
    def d1(self) -> int:
        return self.d + 1


class CloudLattice(NamedTuple):
    """Per-cloud, per-scale lattice assignment (all static shapes)."""

    lattice_offset: jax.Array   # (N, d1) int32, dense vertex id; -1 if absent
    barycentric: jax.Array      # (N, d1) float32, zero rows for invalid points
    el_minus_gr: jax.Array      # (N, d1) float32
    vkeys_hi: jax.Array         # (H,) int32 sorted packed keys, sentinel-padded
    vkeys_lo: jax.Array         # (H,) int32
    vertex_valid: jax.Array     # (H,) bool
    num_valid: jax.Array        # () int32: true vertex count (min(count, H))
    overflow: jax.Array         # () int32: unique keys dropped past capacity
    splat_plan: ReducePlan      # segment-sum plan over lattice_offset (free:
                                # reuses the key sort, ids sorted == keys sorted)


class ScalePair(NamedTuple):
    """Everything both clouds need at one scale (mirrors the reference's
    12-key per-scale dict, transforms/transforms.py:471-483, padded static)."""

    pc1_barycentric: jax.Array     # (N1, d1) f32
    pc2_barycentric: jax.Array     # (N2, d1) f32
    pc1_el_minus_gr: jax.Array     # (N1, d1) f32
    pc2_el_minus_gr: jax.Array     # (N2, d1) f32
    pc1_lattice_offset: jax.Array  # (N1, d1) i32
    pc2_lattice_offset: jax.Array  # (N2, d1) i32
    pc1_blur_neighbors: jax.Array  # (F, H1) i32 or (1, 1) when blur disabled
    pc2_blur_neighbors: jax.Array  # (F, H2) i32
    pc1_corr_indices: jax.Array    # (Cc, H1) i32 or (1, 1)
    # cross-cloud correlation table in unique-offset form: the F x Cc
    # combined stencil offsets collapse to U distinct ones (225 -> 65 for the
    # radius-1 stencils), so only the U distinct index rows are stored /
    # gathered; pc2_corr_inverse maps (f, c) -> u.  The dense equivalent of
    # the reference's (filter_size, corr_size, H1) table
    # (transforms.py:223-241) is pc2_corr_uniq[pc2_corr_inverse].
    pc2_corr_uniq: jax.Array       # (U, H1) i32 or (1, 1)
    pc2_corr_inverse: jax.Array    # (F, Cc) i32 or (1, 1)
    pc1_num_valid: jax.Array       # () i32
    pc2_num_valid: jax.Array       # () i32
    pc1_overflow: jax.Array        # () i32
    pc2_overflow: jax.Array        # () i32
    # scatter-free adjoint plans (ops/segment.py):
    pc1_splat_plan: ReducePlan     # lattice_offset1 -> H1 (splat fwd + slice bwd)
    pc2_splat_plan: ReducePlan     # lattice_offset2 -> H2
    # (U, H2) i32 adjoint index map of pc2_corr_uniq — uniq_inv[u, r] =
    # id1(key2[r] - uniq_delta[u]) — built only when adjoint_plans; turns
    # the correlation backward into one batched gather ((1, 1) otherwise)
    pc2_corr_uniq_inv: jax.Array
    # () i32: queries whose true position fell outside the windowed probe's
    # static window (degraded to "absent" like capacity overflow; 0 on
    # realistic clouds — see _probe_rows_sorted)
    probe_overflow: jax.Array
    # () i32: (tap, block) pairs whose span exceeds the fused stencil
    # kernel's window — those taps contribute zero in the model (see
    # ops/pallas_stencil.stencil_gather_matmul); 0 on realistic clouds
    stencil_overflow: jax.Array

    def pc2_corr_indices_full(self):
        """Dense (F, Cc, H1) cross-corr table (reference layout), for tests."""
        return self.pc2_corr_uniq[self.pc2_corr_inverse]


# ---------------------------------------------------------------------------
# key packing
# ---------------------------------------------------------------------------

def _pack_keys(keys: jax.Array, d: int):
    """(..., d1) int32 keys -> lexicographically ordered (hi, lo) int32 pair.

    The last coordinate is redundant (keys sum to 0) and dropped.  Supports
    d <= 4: one coordinate in ``hi`` (d <= 3) or two (d == 4), two in ``lo``.
    """
    if d == 3:
        hi = keys[..., 0]
        lo = ((keys[..., 1] + _COORD_BIAS) << _COORD_BITS) | (keys[..., 2] + _COORD_BIAS)
    elif d == 2:
        hi = keys[..., 0]
        lo = keys[..., 1] + _COORD_BIAS
    elif d == 4:
        hi = ((keys[..., 0] + _COORD_BIAS) << _COORD_BITS) | (keys[..., 1] + _COORD_BIAS)
        lo = ((keys[..., 2] + _COORD_BIAS) << _COORD_BITS) | (keys[..., 3] + _COORD_BIAS)
    else:
        raise NotImplementedError(f"key packing for d={d}")
    return hi.astype(jnp.int32), lo.astype(jnp.int32)


def _pack_deltas(offsets: np.ndarray, d: int):
    """Pack stencil offsets so that packed-key + packed-delta == packed(key + offset)."""
    offsets = offsets.astype(np.int64)
    if d == 3:
        hi = offsets[..., 0]
        lo = (offsets[..., 1] << _COORD_BITS) + offsets[..., 2]
    elif d == 2:
        hi = offsets[..., 0]
        lo = offsets[..., 1]
    elif d == 4:
        hi = (offsets[..., 0] << _COORD_BITS) + offsets[..., 1]
        lo = (offsets[..., 2] << _COORD_BITS) + offsets[..., 3]
    else:
        raise NotImplementedError(f"delta packing for d={d}")
    return (
        jnp.asarray(hi.astype(np.int32)),
        jnp.asarray(lo.astype(np.int32)),
    )


def _unpack_keys(hi: jax.Array, lo: jax.Array, d: int) -> jax.Array:
    """Inverse of :func:`_pack_keys`; reconstructs the dropped last coordinate."""
    mask = (1 << _COORD_BITS) - 1
    if d == 3:
        k0 = hi
        k1 = (lo >> _COORD_BITS) - _COORD_BIAS
        k2 = (lo & mask) - _COORD_BIAS
        k3 = -(k0 + k1 + k2)
        return jnp.stack([k0, k1, k2, k3], axis=-1)
    if d == 2:
        k0 = hi
        k1 = lo - _COORD_BIAS
        return jnp.stack([k0, k1, -(k0 + k1)], axis=-1)
    if d == 4:
        k0 = (hi >> _COORD_BITS) - _COORD_BIAS
        k1 = (hi & mask) - _COORD_BIAS
        k2 = (lo >> _COORD_BITS) - _COORD_BIAS
        k3 = (lo & mask) - _COORD_BIAS
        return jnp.stack([k0, k1, k2, k3, -(k0 + k1 + k2 + k3)], axis=-1)
    raise NotImplementedError(f"key unpacking for d={d}")


# ---------------------------------------------------------------------------
# sorted-table probe (sort-merge join)
# ---------------------------------------------------------------------------

_TAG_SHIFT = 28  # positions fit in 28 bits (< 268M probe entries)

# Trace-time hook: when set to (mesh, axis), stencil probes are shard_mapped
# over their leading (tap) axis — each device sorts only its taps' queries
# against a replicated copy of the small key table.  The probes are the
# pyramid's dominant cost and are independent across taps, so this shards
# the real build work (SURVEY.md section 5's SP analog), not just storage.
_PROBE_MESH: contextvars.ContextVar = contextvars.ContextVar(
    "probe_mesh", default=None)


@contextlib.contextmanager
def probe_sharding(mesh, axis: str = "lattice"):
    """Shard pyramid stencil probes over ``axis`` for the enclosed trace."""
    token = _PROBE_MESH.set((mesh, axis))
    try:
        yield
    finally:
        _PROBE_MESH.reset(token)


# (block, window) sizes: window >= 128-aligned span p100 with margin
# (measured over 6 seeds: blur ~354 at B=128; correlation ~311 at B=64 — the
# smaller block buys a whole 128-row window tier); overflow degrades to
# absent and is counted, never silently wrong
_PROBE_BW_BLUR = (128, 384)
_PROBE_BW_CORR = (128, 512)  # B=64/W=384 measured slower: 64-row
                             # blocks half-fill the 128-lane VPU tiles


def _probe_with_overflow(vhi, vlo, qhi, qlo):
    """Sort-join probe widened to the windowed probe's 3-output signature."""
    idx, found = _probe(vhi, vlo, qhi, qlo)
    return idx, found, jnp.zeros((qhi.shape[0],), jnp.int32)


def _probe_dispatch(vhi, vlo, qhi, qlo, rows_sorted=False,
                    bw=_PROBE_BW_CORR):
    """Route to the plain/windowed probe or the tap-sharded shard_map version.

    Returns ``(idx, found, overflow)`` with ``overflow`` a per-tap count of
    window-overflowed queries (always 0 on the sort path).
    """
    if rows_sorted:
        def probe(vh, vl, qh, ql):
            return _probe_rows_sorted(vh, vl, qh, ql, bw=bw)
    else:
        probe = _probe_with_overflow
    cfg = _PROBE_MESH.get()
    if cfg is None or qhi.ndim != 2:
        return probe(vhi, vlo, qhi, qlo)
    mesh, axis = cfg
    n_shards = mesh.shape[axis]
    if n_shards == 1:
        return probe(vhi, vlo, qhi, qlo)
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map as _sm
        def shard_map(f, mesh, in_specs, out_specs):
            return _sm(f, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _sme
        def shard_map(f, mesh, in_specs, out_specs):
            return _sme(f, mesh=mesh, in_specs=in_specs,
                        out_specs=out_specs, check_rep=False)

    f, h = qhi.shape
    pad = (-f) % n_shards
    if pad:
        # sentinel queries: sort last, match nothing real
        filler = jnp.full((pad, h), _SENTINEL, jnp.int32)
        qhi = jnp.concatenate([qhi, filler])
        qlo = jnp.concatenate([qlo, filler])

    fn = shard_map(
        probe, mesh,
        (P(), P(), P(axis), P(axis)),
        (P(axis), P(axis), P(axis)))
    idx, found, overflow = fn(vhi, vlo, qhi, qlo)
    return idx[:f], found[:f], overflow[:f]


def _probe_counts(vhi: jax.Array, vlo: jax.Array,
                  qhi: jax.Array, qlo: jax.Array):
    """Per query: ``(lt, found)`` — count of table keys strictly below the
    query, and whether the query key exists in the table.

    Sort-merge join with the table inserted TWICE around the queries —
    tag 0 copies sort before equal-key queries, tag 2 copies after — so for
    a query ``q``: ``count(tag0 <= q)`` counts table keys ``<= q`` and
    ``count(tag2 <= q)`` counts table keys ``< q``; the key exists iff they
    differ (table keys are unique, so they differ by at most 1).  Everything
    is one 3-array sort + two cumsums + one 2-array unsort: no
    associative_scan, no random gathers (TPU sorts are ~100x cheaper than
    random gathers: 0.34 ms to sort 400k pairs vs 39 ms for a 15-step binary
    search).  (tag, position) share one int32 word so the sort moves 3
    arrays, not 4; (lt, found) share the unsort's single payload word.
    """
    shape = qhi.shape
    qh = qhi.reshape(-1)
    ql = qlo.reshape(-1)
    n_t = vhi.shape[0]
    n_q = qh.shape[0]
    assert max(n_t, n_q) < (1 << _TAG_SHIFT)

    hi = jnp.concatenate([vhi, qh, vhi])
    lo = jnp.concatenate([vlo, ql, vlo])
    tpos = jnp.arange(n_t, dtype=jnp.int32)
    qpos = jnp.arange(n_q, dtype=jnp.int32)
    word = jnp.concatenate([
        tpos,                                   # tag 0: table, before queries
        qpos + jnp.int32(1 << _TAG_SHIFT),      # tag 1: queries
        tpos + jnp.int32(2 << _TAG_SHIFT),      # tag 2: table, after queries
    ])
    _, _, sword = jax.lax.sort((hi, lo, word), num_keys=3)

    le = jnp.cumsum((sword < (1 << _TAG_SHIFT)).astype(jnp.int32))
    lt = jnp.cumsum((sword >= (2 << _TAG_SHIFT)).astype(jnp.int32))
    # pack (lt, found) into one int32 payload word
    res_s = (lt << 1) | (le > lt).astype(jnp.int32)

    # unsort by the unique word; queries land at positions [n_t, n_t + n_q)
    _, res = jax.lax.sort((sword, res_s), num_keys=1)
    res_q = res[n_t:n_t + n_q].reshape(shape)
    return res_q >> 1, (res_q & 1).astype(bool)


def _probe(vhi: jax.Array, vlo: jax.Array, qhi: jax.Array, qlo: jax.Array):
    """Find each query key in the sorted vertex table via the sort-merge
    join.  Returns ``(idx, found)``: dense vertex id (int32, arbitrary where
    not found) and a bool mask, shaped like the queries."""
    lt, found = _probe_counts(vhi, vlo, qhi, qlo)
    return lt, found


# Windowed probe: each query row is the sorted vertex-key array plus one
# packed stencil delta, so rows are themselves sorted (constant addition
# preserves the lexicographic (hi, lo) order; invalid vertices are masked to
# the sentinel, which sorts last).  Block the row into runs of _PROBE_B
# queries, find each block's lower bound in the table with a *small*
# sort-merge join over just the block-boundary queries, then count within a
# _PROBE_W-wide window of table keys — dense, branchless VPU compares
# instead of an O((F+2)·H) sort (measured 3.4 ms for the 65-tap correlation
# probe at 13k vertices; the windowed form is ~0.8 ms).  A lax.cond falls
# back to the exact sort join whenever any block's true span exceeds the
# window (measured spans: p100 ~210 at B=128 on FT3D-like clouds, W=384).


def _lex_le(ahi, alo, bhi, blo):
    """(ahi, alo) <= (bhi, blo) lexicographically, elementwise."""
    return (ahi < bhi) | ((ahi == bhi) & (alo <= blo))


def _lex_lt(ahi, alo, bhi, blo):
    """(ahi, alo) < (bhi, blo) lexicographically, elementwise."""
    return (ahi < bhi) | ((ahi == bhi) & (alo < blo))


def _lower_bound_2level(vhi, vlo, qhi, qlo, with_found: bool = False):
    """Exact count of table keys strictly below each query, sort-free.

    Two dense compare levels instead of a sort-merge join (each boundary
    join cost a ~0.1 ms sort pair; this is ~2M VPU compares): level 1
    counts block-first keys below the query — only the last such block can
    straddle the boundary (global sortedness) — and level 2 counts inside
    that one block, fetched with the fast 128-row gather.

    With ``with_found`` also returns whether the query key exists in the
    table (the match, if any, sits at index ``lt``: inside the straddling
    block, or — when that block is entirely below the query — at the next
    block's first key).
    """
    lane = 128
    n_t = vhi.shape[0]
    pad = (-n_t) % lane
    if pad:
        filler = jnp.full((pad,), _SENTINEL, jnp.int32)
        vhi = jnp.concatenate([vhi, filler])
        vlo = jnp.concatenate([vlo, filler])
    nbk = vhi.shape[0] // lane
    bf_hi = vhi[::lane]                                    # (nbk,)
    bf_lo = vlo[::lane]
    shape = qhi.shape
    qh = qhi.reshape(-1, 1)
    ql = qlo.reshape(-1, 1)
    b0 = jnp.sum(_lex_lt(bf_hi[None, :], bf_lo[None, :], qh, ql)
                 .astype(jnp.int32), axis=1)               # (nq,)
    safe_b = jnp.maximum(b0 - 1, 0)
    row_hi = vhi.reshape(nbk, lane)[safe_b]                # (nq, 128)
    row_lo = vlo.reshape(nbk, lane)[safe_b]
    inblock = jnp.sum(_lex_lt(row_hi, row_lo, qh, ql).astype(jnp.int32),
                      axis=1)
    lt = jnp.where(b0 == 0, 0, (b0 - 1) * lane + inblock)
    lt = jnp.minimum(lt, n_t)
    if not with_found:
        return lt.reshape(shape)
    eq_in = jnp.any((row_hi == qh) & (row_lo == ql), axis=1)
    bd = jnp.minimum(b0, nbk - 1)
    eq_bd = (bf_hi[bd] == qh[:, 0]) & (bf_lo[bd] == ql[:, 0])
    found = (eq_in & (b0 > 0)) | eq_bd
    return lt.reshape(shape), found.reshape(shape)


def _probe_rows_sorted(vhi, vlo, qhi, qlo, bw=_PROBE_BW_CORR):
    """Windowed probe for row-sorted queries.

    Returns ``(idx, found, overflow)``: like :func:`_probe` plus a per-tap
    count of real queries whose block's true span exceeded the static
    window.  Such queries degrade to "absent" (found=False) — the same
    contract as capacity overflow (vertices past ``capacity`` are dropped
    and counted), never a wrong index.  On FT3D-like clouds spans are ~210
    at B=128 (see _PROBE_W) so overflow is zero in practice; callers surface
    the counter through ``ScalePair.probe_overflow``.
    """
    f, h = qhi.shape
    n_t = vhi.shape[0]
    b, w = bw
    pad = (-h) % b
    if pad:
        filler = jnp.full((f, pad), _SENTINEL, jnp.int32)
        qhi_p = jnp.concatenate([qhi, filler], axis=1)
        qlo_p = jnp.concatenate([qlo, filler], axis=1)
    else:
        qhi_p, qlo_p = qhi, qlo
    hp = qhi_p.shape[1]
    nb = hp // b

    # block-boundary lower bounds via the small join: (f, nb) queries
    lt = _lower_bound_2level(vhi, vlo, qhi_p[:, ::b], qlo_p[:, ::b])
    # windows start at a 128-aligned position so they can be fetched as
    # whole-row gathers of a (n/128, 128) view — XLA's fast row-gather path.
    # (An elementwise vhi[pos] gather lowers to scalar loads, ~1.2 ms per
    # window set, and lax.gather with slice_sizes lowers to a sequential
    # while+dynamic-slice loop, ~5 ms.  Row gathers are contiguous copies.)
    lane = 128
    n_t_pad = -(-max(n_t, w) // lane) * lane
    start = jnp.clip(lt & ~(lane - 1), 0, n_t_pad - w)
    # Every VALID query's result position sits below the next boundary's
    # lower bound + 1 (unique table keys).  The final block is bounded by
    # the valid table size: sentinel-masked queries can count up to n_t but
    # their results are discarded by the callers' vertex_valid masking, so
    # they must not flag overflow.  Clamping/aligning start only
    # strengthens the condition.
    n_valid_t = jnp.sum(
        (~((vhi == _SENTINEL) & (vlo == _SENTINEL))).astype(jnp.int32))
    bound = jnp.concatenate(
        [lt[:, 1:], jnp.full((f, 1), 0, jnp.int32) + n_valid_t], axis=1)
    bound = jnp.minimum(bound, n_valid_t)
    block_ok = bound + 1 - start <= w                             # (f, nb)

    tpad = n_t_pad - n_t
    vhi_p, vlo_p = vhi, vlo
    if tpad:
        filler_t = jnp.full((tpad,), _SENTINEL, jnp.int32)
        vhi_p = jnp.concatenate([vhi, filler_t])
        vlo_p = jnp.concatenate([vlo, filler_t])
    rows = (start[:, :, None] >> 7) + jnp.arange(w // lane, dtype=jnp.int32)
    rows = rows.reshape(-1)
    whi = vhi_p.reshape(-1, lane)[rows].reshape(f, nb, 1, w)
    wlo = vlo_p.reshape(-1, lane)[rows].reshape(f, nb, 1, w)
    qh = qhi_p.reshape(f, nb, b, 1)
    ql = qlo_p.reshape(f, nb, b, 1)
    # one fused reduce: low 16 bits count "window key <= query", bit 16
    # counts exact matches (at most one — table keys are unique).  No
    # in-table masking needed: positions past the table read the sentinel
    # padding, which never compares <= a real (non-sentinel) query, and
    # sentinel queries' results are discarded by the callers.
    le_term = _lex_le(whi, wlo, qh, ql)
    eq_term = (whi == qh) & (wlo == ql)
    enc = le_term.astype(jnp.int32) + (eq_term.astype(jnp.int32) << 16)
    cnt = jnp.sum(enc, axis=-1)                                   # (f, nb, b)
    idx = start[:, :, None] + (cnt & 0xFFFF) - 1
    found = (cnt >> 16 > 0) & block_ok[:, :, None]

    real_q = ~((qh[..., 0] == _SENTINEL) & (ql[..., 0] == _SENTINEL))
    overflow = jnp.sum((real_q & ~block_ok[:, :, None]).astype(jnp.int32),
                       axis=(1, 2))                               # (f,)
    return (idx.reshape(f, hp)[:, :h],
            found.reshape(f, hp)[:, :h],
            overflow)


# ---------------------------------------------------------------------------
# per-cloud build
# ---------------------------------------------------------------------------

def build_cloud_lattice(
    geom: PermutohedralGeometry,
    points: jax.Array,       # (N, d) float32
    valid: jax.Array,        # (N,) bool
    scale: float,
    capacity: int,
) -> CloudLattice:
    """Assign (metric) points to lattice vertices; see _build_from_elevated."""
    return _build_from_elevated(geom, geom.elevate(points, scale),
                                valid, capacity)


def _build_from_elevated(
    geom: PermutohedralGeometry,
    elevated: jax.Array,     # (N, d1) float32
    valid: jax.Array,        # (N,) bool
    capacity: int,
) -> CloudLattice:
    """Build the dense-id vertex table from elevated coordinates.

    Deliberately scatter-free: dense ids come from a rank cumsum over the
    sorted keys, the vertex table from gathers at per-rank run starts
    (binary search over the non-decreasing rank array), and the sort's
    permutation payload doubles as the splat plan — XLA's TPU scatter path
    is catastrophically slow to compile and run (see ops/segment.py).
    """
    d = geom.d
    kb = geom.simplex_from_elevated(elevated)

    hi, lo = _pack_keys(kb.keys, d)                        # (N, d1)
    hi = jnp.where(valid[:, None], hi, _SENTINEL)
    lo = jnp.where(valid[:, None], lo, _SENTINEL)

    m = hi.size
    iota = jnp.arange(m, dtype=jnp.int32)
    shi, slo, perm = jax.lax.sort(
        (hi.reshape(-1), lo.reshape(-1), iota), num_keys=2)
    real = ~((shi == _SENTINEL) & (slo == _SENTINEL))
    is_new = jnp.ones(shi.shape, dtype=bool)
    is_new = is_new.at[1:].set((shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1]))
    is_new = is_new & real

    num_unique = jnp.sum(is_new.astype(jnp.int32))
    overflow = jnp.maximum(num_unique - capacity, 0)
    total_real = jnp.sum(real.astype(jnp.int32))

    # Dense ids occur consecutively in sorted order, so run starts are
    # exact 2-level dense lower bounds of each rank over the non-decreasing
    # rank array (level 1: block-first ranks; level 2: one fetched 128-row
    # block — queries are sorted, so the row fetch is monotone), and the
    # unique keys come from an in-row one-hot select at those positions.
    # Replaces a 3-array m-entry compaction sort per build.
    ranks = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    lane = 128
    mp = -(-m // lane) * lane
    rk, shi_p, slo_p = ranks, shi, slo
    if mp != m:
        rk = jnp.concatenate([rk, jnp.full(mp - m, 1 << 29, jnp.int32)])
        shi_p = jnp.concatenate(
            [shi_p, jnp.full(mp - m, _SENTINEL, jnp.int32)])
        slo_p = jnp.concatenate(
            [slo_p, jnp.full(mp - m, _SENTINEL, jnp.int32)])
    nbk = mp // lane
    q = jnp.arange(capacity + 1, dtype=jnp.int32)
    r0b = rk[::lane]                                        # (nbk,)
    b0 = jnp.sum((r0b[None, :] < q[:, None]).astype(jnp.int32), axis=1)
    safe_b = jnp.maximum(b0 - 1, 0)
    rows_rk = rk.reshape(nbk, lane)[safe_b]                 # (cap+1, 128)
    inblock = jnp.sum((rows_rk < q[:, None]).astype(jnp.int32), axis=1)
    starts_sorted = jnp.minimum(
        jnp.where(b0 == 0, 0, (b0 - 1) * lane + inblock), m)

    ranks_idx = jnp.arange(capacity, dtype=jnp.int32)
    in_range = ranks_idx < num_unique
    vertex_start = jnp.where(in_range, starts_sorted[:capacity], total_real)
    vertex_end = jnp.where(ranks_idx + 1 < num_unique,
                           starts_sorted[1:capacity + 1], total_real)
    vertex_end = jnp.where(in_range, vertex_end, vertex_start)
    vertex_valid = vertex_start < vertex_end

    safe_pos = jnp.minimum(starts_sorted[:capacity], m - 1)
    row_hi = shi_p.reshape(nbk, lane)[safe_pos >> 7]        # (cap, 128)
    row_lo = slo_p.reshape(nbk, lane)[safe_pos >> 7]
    sel = (jnp.arange(lane, dtype=jnp.int32)[None, :]
           == (safe_pos & (lane - 1))[:, None])
    comp_hi = jnp.sum(jnp.where(sel, row_hi, 0), axis=1)
    comp_lo = jnp.sum(jnp.where(sel, row_lo, 0), axis=1)

    vhi = jnp.where(vertex_valid, comp_hi, _SENTINEL)
    vlo = jnp.where(vertex_valid, comp_lo, _SENTINEL)

    # per-entry dense ids are just the rank cumsum, unsorted back to flat
    # order through the key sort's permutation (no probe needed).  NB: a
    # 2-level dense lower bound here is NOT faster — the queries are in
    # original (unsorted) order, so its in-block row fetch becomes a random
    # 128-row gather (~130 MB per build, measured far slower than the sort).
    ids_sorted = jnp.where(real & (ranks < capacity), ranks, -1)
    _, ids_flat = jax.lax.sort((perm, ids_sorted), num_keys=1)
    lattice_offset = ids_flat.reshape(hi.shape)

    barycentric = jnp.where(valid[:, None], kb.barycentric, 0.0)
    el_minus_gr = jnp.where(valid[:, None], kb.el_minus_gr, 0.0)

    # splat plan for free: sorted-by-key order == sorted-by-id order;
    # target ids equal dense ranks, so the block-first-rank array enables
    # the gather-free rank-mode reduction (ops/segment.py).  ranks[::128]
    # yields ceil(m/128) entries — exactly one per (possibly padded) block.
    same_prev = jnp.concatenate(
        [jnp.zeros((1,), bool), (shi[1:] == shi[:-1]) & (slo[1:] == slo[:-1])])
    splat_plan = ReducePlan(ids=lattice_offset.reshape(-1), perm=perm,
                            start=vertex_start, end=vertex_end,
                            lrank=local_ranks(same_prev),
                            r0=ranks[::128])

    return CloudLattice(
        lattice_offset=lattice_offset,
        barycentric=barycentric,
        el_minus_gr=el_minus_gr,
        vkeys_hi=vhi,
        vkeys_lo=vlo,
        vertex_valid=vertex_valid,
        num_valid=jnp.minimum(num_unique, capacity).astype(jnp.int32),
        overflow=overflow.astype(jnp.int32),
        splat_plan=splat_plan,
    )


def _neighbor_table(cl: CloudLattice, offsets: np.ndarray, d: int):
    """((F, H) blur-neighbor ids, window-overflow count); -1 = absent."""
    # the stencil's first offset is the zero offset (identity tap: each valid
    # vertex maps to itself) — fill it directly and probe only the rest
    assert not offsets[0].any(), "stencil row 0 must be the zero offset"
    dhi, dlo = _pack_deltas(offsets[1:], d)                # (F-1,)
    # sentinel-mask invalid vertices so each query row stays sorted (the
    # windowed probe relies on it; results there are discarded anyway)
    ok_v = cl.vertex_valid[None, :]
    qhi = jnp.where(ok_v, dhi[:, None] + cl.vkeys_hi[None, :], _SENTINEL)
    qlo = jnp.where(ok_v, dlo[:, None] + cl.vkeys_lo[None, :], _SENTINEL)
    idx, found, oflow = _probe_dispatch(cl.vkeys_hi, cl.vkeys_lo, qhi, qlo,
                                        rows_sorted=True,
                                        bw=_PROBE_BW_BLUR)
    ok = found & cl.vertex_valid[None, :]
    h = cl.vkeys_hi.shape[0]
    iota = jnp.arange(h, dtype=jnp.int32)
    self_row = jnp.where(cl.vertex_valid, iota, -1)[None, :]
    rest = jnp.where(ok, idx, -1).astype(jnp.int32)
    return jnp.concatenate([self_row, rest], axis=0), jnp.sum(oflow)


def _corr_tables(cl1: CloudLattice, cl2: CloudLattice,
                 filter_offsets: np.ndarray, corr_offsets: np.ndarray, d: int,
                 pc1_corr: jax.Array | None = None,
                 with_inverse: bool = False):
    """Correlation index tables (reference semantics, transforms.py:223-241).

    pc1_corr[c, h]       = id of (key1[h] + corr_offsets[c]) in cloud-1 table
    pc2_corr[f, c, h]    = id of (key1[h] + corr_offsets[c] + filter_offsets[f])
                           in cloud-2 table

    Pass ``pc1_corr`` to reuse an existing table (e.g. the blur-neighbor
    table when the stencils coincide).  Also returns the summed
    window-overflow count of its probes.

    ``with_inverse`` additionally probes the NEGATED unique offsets from
    cloud-2 keys into the cloud-1 table: ``uniq_inv[u, r] = id1(key2[r] -
    uniq_delta[u])`` — the exact adjoint index map of ``uniq_tab`` (the
    vertex-id maps are injective), which turns the correlation backward's
    scatter into one batched gather (ops/corr.py _corr_cross_bwd).
    """
    probe_overflow = jnp.zeros((), jnp.int32)
    ok_v = cl1.vertex_valid[None, :]
    if pc1_corr is None:
        chi, clo = _pack_deltas(corr_offsets, d)           # (Cc,)
        center_hi = jnp.where(
            ok_v, chi[:, None] + cl1.vkeys_hi[None, :], _SENTINEL)
        center_lo = jnp.where(
            ok_v, clo[:, None] + cl1.vkeys_lo[None, :], _SENTINEL)
        idx1, found1, oflow1 = _probe_dispatch(cl1.vkeys_hi, cl1.vkeys_lo,
                                               center_hi, center_lo,
                                               rows_sorted=True)
        probe_overflow = probe_overflow + jnp.sum(oflow1)
        ok1 = found1 & ok_v
        pc1_corr = jnp.where(ok1, idx1, -1).astype(jnp.int32)

    # the F x Cc combined offsets collapse heavily (225 -> 65 for the radius-1
    # stencils): probe only the distinct combined offsets and keep the table
    # in unique-offset form — downstream ops gather (U, H1) instead of
    # (F, Cc, H1) and fold the static inverse map into the kernel tensor
    combined = (filter_offsets[:, None, :].astype(np.int64)
                + corr_offsets[None, :, :]).reshape(-1, corr_offsets.shape[1])
    uniq, inverse = np.unique(combined, axis=0, return_inverse=True)
    uhi, ulo = _pack_deltas(uniq, d)                        # (U,)

    qhi = jnp.where(ok_v, uhi[:, None] + cl1.vkeys_hi[None, :], _SENTINEL)
    qlo = jnp.where(ok_v, ulo[:, None] + cl1.vkeys_lo[None, :], _SENTINEL)
    idx2, found2, oflow2 = _probe_dispatch(cl2.vkeys_hi, cl2.vkeys_lo,
                                           qhi, qlo, rows_sorted=True)
    probe_overflow = probe_overflow + jnp.sum(oflow2)
    ok2 = found2 & ok_v
    uniq_tab = jnp.where(ok2, idx2, -1).astype(jnp.int32)   # (U, H1)

    nf, nc = filter_offsets.shape[0], corr_offsets.shape[0]
    inverse = jnp.asarray(inverse.astype(np.int32).reshape(nf, nc))

    uniq_inv = jnp.zeros((1, 1), dtype=jnp.int32)
    if with_inverse:
        nhi, nlo = _pack_deltas(-uniq, d)                   # (U,)
        ok_v2 = cl2.vertex_valid[None, :]
        rhi = jnp.where(ok_v2, nhi[:, None] + cl2.vkeys_hi[None, :],
                        _SENTINEL)
        rlo = jnp.where(ok_v2, nlo[:, None] + cl2.vkeys_lo[None, :],
                        _SENTINEL)
        idx3, found3, oflow3 = _probe_dispatch(cl1.vkeys_hi, cl1.vkeys_lo,
                                               rhi, rlo, rows_sorted=True)
        probe_overflow = probe_overflow + jnp.sum(oflow3)
        ok3 = found3 & ok_v2
        uniq_inv = jnp.where(ok3, idx3, -1).astype(jnp.int32)  # (U, H2)
    return pc1_corr, uniq_tab, inverse, uniq_inv, probe_overflow


def _next_elevated(geom: PermutohedralGeometry, cl: CloudLattice,
                   scale: float, next_scale: float):
    """Next scale's elevated coordinates, directly from the vertex keys.

    Mathematically identical to the reference's un-elevate -> re-elevate
    roundtrip (transforms.py:461-469) — the keys lie on the ``sum == 0``
    hyperplane where elevation is the inverse of un-elevation — but computed
    as a single *elementwise* product ``key * (next_scale / scale)``.  That
    keeps deeper scales bit-deterministic: vertex-derived points sit exactly
    on rounding-tie boundaries, and a matmul roundtrip would let compiler
    fusion choices flip those ties.
    """
    keys = _unpack_keys(cl.vkeys_hi, cl.vkeys_lo, geom.d)  # (H, d1)
    keys = jnp.where(cl.vertex_valid[:, None], keys, 0)
    ratio = jnp.float32(next_scale) / jnp.float32(scale)
    # optimization_barrier: without it XLA contracts this multiply into the
    # consumer's ``elevated - greedy`` subtraction as an FMA, feeding the
    # *unrounded* product into the residual at exact-tie points (measured:
    # el = -2.0000017 fused vs -2.0 eager for key*2/3), which flips simplex
    # ranks and breaks jit==eager==reference parity at non-pow2 scale ratios.
    elevated = jax.lax.optimization_barrier(keys.astype(jnp.float32) * ratio)
    return elevated, cl.vertex_valid


# ---------------------------------------------------------------------------
# full multi-scale pyramid
# ---------------------------------------------------------------------------

def build_pyramid(
    spec: LatticeSpec,
    pc1: jax.Array,                  # (N, d) float32, metric coords
    pc2: jax.Array,
    valid1: jax.Array | None = None,  # (N,) bool
    valid2: jax.Array | None = None,
    adjoint_plans: bool = True,
):
    """Build all per-scale lattice tables for a cloud pair (single sample).

    Jittable; vmap over a leading batch axis for batch > 1.  Mirrors
    ``GenerateDataUnsymmetric.__call__`` (transforms/transforms.py:358-485)
    with static shapes: each scale's points are the previous scale's (padded)
    vertex positions, carrying a validity mask instead of a dynamic count.

    ``adjoint_plans=False`` skips the correlation-table reduce plans, which
    only the backward pass reads — saves ~1/3 of pyramid time at inference.
    """
    geom = PermutohedralGeometry(spec.d)
    if valid1 is None:
        valid1 = jnp.ones(pc1.shape[0], dtype=bool)
    if valid2 is None:
        valid2 = jnp.ones(pc2.shape[0], dtype=bool)

    # scale 0 elevates the metric points; deeper scales derive elevated
    # coords elementwise from the previous scale's vertex keys (deterministic
    # under any compiler fusion — see _next_elevated)
    elev1 = geom.elevate(pc1, spec.scales[0].scale)
    elev2 = geom.elevate(pc2, spec.scales[0].scale)

    scales_out = []
    for i, ss in enumerate(spec.scales):
        cl1 = _build_from_elevated(geom, elev1, valid1, ss.capacity)
        cl2 = _build_from_elevated(geom, elev2, valid2, ss.capacity)

        from ..ops.pallas_stencil import stencil_overflow_count
        probe_oflow = jnp.zeros((), jnp.int32)
        stencil_oflow = jnp.zeros((), jnp.int32)
        if ss.blur_radius != -1:
            offs = neighborhood_offsets(ss.blur_radius, spec.d)
            nb1, of1 = _neighbor_table(cl1, offs, spec.d)
            nb2, of2 = _neighbor_table(cl2, offs, spec.d)
            probe_oflow = probe_oflow + of1 + of2
            stencil_oflow = (stencil_oflow
                             + stencil_overflow_count(nb1, ss.capacity, 384)
                             + stencil_overflow_count(nb2, ss.capacity, 384))
        else:
            nb1 = jnp.zeros((1, 1), dtype=jnp.int32)
            nb2 = jnp.zeros((1, 1), dtype=jnp.int32)


        if ss.corr_filter_radius != -1:
            f_offs = neighborhood_offsets(ss.corr_filter_radius, spec.d)
            c_offs = neighborhood_offsets(ss.corr_corr_radius, spec.d)
            if ss.corr_corr_radius == ss.blur_radius and ss.blur_radius != -1:
                # identical stencil + identical table => pc1_corr == blur
                # neighbors; skip Cc*H probes (default config has all radii 1)
                corr1, corr2u, corr2inv, corr2u_inv, of_c = _corr_tables(
                    cl1, cl2, f_offs, c_offs, spec.d, pc1_corr=nb1,
                    with_inverse=adjoint_plans)
            else:
                corr1, corr2u, corr2inv, corr2u_inv, of_c = _corr_tables(
                    cl1, cl2, f_offs, c_offs, spec.d,
                    with_inverse=adjoint_plans)
            probe_oflow = probe_oflow + of_c
            stencil_oflow = (stencil_oflow
                             + stencil_overflow_count(corr1, ss.capacity, 384)
                             + stencil_overflow_count(corr2u, ss.capacity,
                                                      512))
        else:
            corr1 = jnp.zeros((1, 1), dtype=jnp.int32)
            corr2u = jnp.zeros((1, 1), dtype=jnp.int32)
            corr2inv = jnp.zeros((1, 1), dtype=jnp.int32)
            corr2u_inv = jnp.zeros((1, 1), dtype=jnp.int32)

        scales_out.append(ScalePair(
            pc1_barycentric=cl1.barycentric,
            pc2_barycentric=cl2.barycentric,
            pc1_el_minus_gr=cl1.el_minus_gr,
            pc2_el_minus_gr=cl2.el_minus_gr,
            pc1_lattice_offset=cl1.lattice_offset,
            pc2_lattice_offset=cl2.lattice_offset,
            pc1_blur_neighbors=nb1,
            pc2_blur_neighbors=nb2,
            pc1_corr_indices=corr1,
            pc2_corr_uniq=corr2u,
            pc2_corr_inverse=corr2inv,
            pc1_num_valid=cl1.num_valid,
            pc2_num_valid=cl2.num_valid,
            pc1_overflow=cl1.overflow,
            pc2_overflow=cl2.overflow,
            pc1_splat_plan=cl1.splat_plan,
            pc2_splat_plan=cl2.splat_plan,
            pc2_corr_uniq_inv=corr2u_inv,
            probe_overflow=probe_oflow,
            stencil_overflow=stencil_oflow,
        ))

        if i + 1 < len(spec.scales):
            next_scale = spec.scales[i + 1].scale
            elev1, valid1 = _next_elevated(geom, cl1, ss.scale, next_scale)
            elev2, valid2 = _next_elevated(geom, cl2, ss.scale, next_scale)

    return scales_out


def default_capacities(num_points: int, scales: Sequence[Sequence[float]]):
    """Heuristic static capacities per scale.

    At fine scales nearly every point touches d+1 distinct vertices; each
    coarser scale roughly halves lattice resolution so occupancy shrinks
    geometrically.  Tune with ``tools/measure_capacities.py`` on real data.
    """
    caps = []
    n = num_points
    prev_scale = None
    for row in scales:
        scale = float(row[0])
        if prev_scale is None:
            cap = 3 * n
        else:
            shrink = max(1.0, (prev_scale / scale) ** 1.5)
            cap = max(64, int(caps[-1] / shrink))
        caps.append(int(cap))
        prev_scale = scale
    return caps
