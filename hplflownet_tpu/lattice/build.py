"""Sort-based on-device lattice construction with static shapes.

This replaces the reference's host-side C hash table + Numba builder
(/root/reference/transforms/transforms.py:133-261, models/khash.h) with a
TPU-friendly pipeline that runs inside ``jax.jit``:

1. Pack each (d+1)-int lattice key into one int32 word (default — keys sum
   to zero so the last coordinate is dropped, and 10-bit coordinate fields
   cover the 35 m protocol; see coord_bits) or a pair of words for wider
   scenes.  Packed int32 words keep everything in TPU-native 32-bit
   arithmetic — no int64 emulation — and a single-word key makes every sort
   one payload lighter and every probe compare ~3x cheaper.
2. ``lax.sort`` the packed keys lexicographically and mark
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

# Packed-key width.  Lattice keys are elevated coords rounded to multiples
# of d+1; their magnitude is ~2.9 * scale * |x| (measured 302 at scale 3 on
# 35 m-capped clouds — the reference's DEPTH_THRESHOLD protocol).  With the
# default ``coord_bits=10`` all d stored coordinates of a d<=3 key pack into
# ONE int32 word, which makes every builder sort one payload array lighter
# and every probe compare ~3x cheaper than the two-word form.  Points whose
# key coordinates fall outside the packable range are degraded to invalid
# and counted in ``CloudLattice.overflow`` (same contract as capacity
# overflow); scenes needing wider keys set ``LatticeSpec.coord_bits=15``
# (two words, |coord| <= 16383).
_DELTA_MARGIN = 16   # headroom for stencil deltas (|combined offset| <= 8)
_SENTINEL = np.int32(np.iinfo(np.int32).max)

# Fused dual-cloud structures tag the cloud in bit 30 of the packed low
# word (every real packed field is range-guarded below 2^30 - 1, and a
# 1-coord low word of the two-word layout is < 2^15).  The per-cloud
# sentinel tag | _SENT_LO sorts above every real key of its cloud and
# below the other cloud's, keeping fused arrays globally sorted.
_TAG_BIT = 30
_SENT_LO = np.int32((1 << 30) - 1)


def _num_words(d: int, bits: int) -> int:
    """Words per packed key: 1 when all d stored coords fit 30 bits."""
    if d not in (2, 3, 4):
        raise NotImplementedError(f"key packing for d={d}")
    return 1 if d * bits <= 30 else 2


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
    # bits per packed key coordinate: 10 (default) packs a whole d<=3 key
    # into one int32 (|coord| <= 495 after delta margin — covers the 35 m
    # protocol at scale 3 with 1.6x headroom); 15 uses two words
    # (|coord| <= 16367) for wider scenes.  Out-of-range coords degrade to
    # invalid and are counted in overflow.
    coord_bits: int = 10

    @property
    def d1(self) -> int:
        return self.d + 1


class CloudLattice(NamedTuple):
    """Per-cloud, per-scale lattice assignment (all static shapes)."""

    lattice_offset: jax.Array   # (N, d1) int32, dense vertex id; -1 if absent
    barycentric: jax.Array      # (N, d1) float32, zero rows for invalid points
    el_minus_gr: jax.Array      # (N, d1) float32
    vkeys: tuple                # 1-2 (H,) int32 sorted packed key words,
                                # sentinel-padded (see _pack_keys)
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

def _word_layout(d: int, bits: int):
    """Tuple of per-word coordinate counts (front-loaded, lex-preserving)."""
    if _num_words(d, bits) == 1:
        return (d,)
    if d == 2:
        return (1, 1)
    if d == 3:
        return (1, 2)
    return (2, 2)


def _pack_fields(coords, bits: int, bias: int):
    w = coords[0] + bias
    for c in coords[1:]:
        w = (w << bits) | (c + bias)
    return w


def _pack_keys(keys: jax.Array, d: int, bits: int):
    """(..., d1) int32 keys -> tuple of lexicographically ordered int32 words.

    The last coordinate is redundant (keys sum to 0) and dropped.  One word
    when d*bits <= 30 (the d=3 default), two otherwise.
    """
    bias = 1 << (bits - 1)
    layout = _word_layout(d, bits)
    words = []
    i = 0
    for cnt in layout:
        coords = [keys[..., i + j] for j in range(cnt)]
        words.append(_pack_fields(coords, bits, bias).astype(jnp.int32))
        i += cnt
    return tuple(words)


def _pack_deltas(offsets: np.ndarray, d: int, bits: int):
    """Pack stencil offsets so word-wise integer addition equals packing the
    offset key: packed(key) + packed_delta == packed(key + offset), provided
    every field stays in range (guaranteed by the _DELTA_MARGIN guard)."""
    offsets = offsets.astype(np.int64)
    layout = _word_layout(d, bits)
    words = []
    i = 0
    for cnt in layout:
        w = offsets[..., i]
        for j in range(1, cnt):
            w = (w << bits) + offsets[..., i + j]
        words.append(jnp.asarray(w.astype(np.int32)))
        i += cnt
    return tuple(words)


def _unpack_keys(words, d: int, bits: int) -> jax.Array:
    """Inverse of :func:`_pack_keys`; reconstructs the dropped last coord."""
    bias = 1 << (bits - 1)
    mask = (1 << bits) - 1
    layout = _word_layout(d, bits)
    coords = []
    for w, cnt in zip(words, layout):
        for j in range(cnt - 1, -1, -1):
            coords.append(((w >> (bits * j)) & mask) - bias)
    total = coords[0]
    for c in coords[1:]:
        total = total + c
    coords.append(-total)
    return jnp.stack(coords, axis=-1)


# --- word-tuple helpers (probes/sorts are generic over 1- or 2-word keys) ---

def _w_all_sentinel(words):
    # a real packed low word never reaches 2^30 - 1 (fields are
    # range-guarded), so the low 30 bits identify every sentinel form:
    # the global _SENTINEL and the tagged per-cloud `tag | _SENT_LO`
    return (words[0] & _SENT_LO) == _SENT_LO


def _w_where(cond, words, fill):
    return tuple(jnp.where(cond, w, fill) for w in words)


def _w_add(words, deltas):
    return tuple(w + dv for w, dv in zip(words, deltas))


def _w_eq(a, b):
    m = a[0] == b[0]
    for x, y in zip(a[1:], b[1:]):
        m = m & (x == y)
    return m


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


def _probe_with_overflow(vw, qw):
    """Sort-join probe widened to the windowed probe's 3-output signature."""
    idx, found = _probe(vw, qw)
    return idx, found, jnp.zeros((qw[0].shape[0],), jnp.int32)


def _probe_dispatch(vw, qw, rows_sorted=False, bw=_PROBE_BW_CORR,
                    block_caps=None):
    """Route to the plain/windowed probe or the tap-sharded shard_map version.

    ``vw``/``qw`` are packed-key word tuples (1 or 2 int32 arrays each).
    Returns ``(idx, found, overflow)`` with ``overflow`` a per-tap count of
    window-overflowed queries (always 0 on the sort path).  ``block_caps``
    is forwarded to the windowed probe (fused dual-cloud tables).
    """
    from ..ops.dispatch import exact_mode_active
    if rows_sorted and not exact_mode_active():
        def probe(v, q):
            return _probe_rows_sorted(v, q, bw=bw, block_caps=block_caps)
    else:
        # exact mode routes even sorted rows through the window-free
        # sort-merge join (no degrade; overflow identically 0)
        probe = _probe_with_overflow
    cfg = _PROBE_MESH.get()
    if cfg is None or qw[0].ndim != 2:
        return probe(vw, qw)
    mesh, axis = cfg
    n_shards = mesh.shape[axis]
    if n_shards == 1:
        return probe(vw, qw)
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

    f, h = qw[0].shape
    pad = (-f) % n_shards
    if pad:
        # sentinel queries: sort last, match nothing real
        filler = jnp.full((pad, h), _SENTINEL, jnp.int32)
        qw = tuple(jnp.concatenate([q, filler]) for q in qw)

    nw = len(vw)
    fn = shard_map(
        probe, mesh,
        (tuple(P() for _ in range(nw)), tuple(P(axis) for _ in range(nw))),
        (P(axis), P(axis), P(axis)))
    idx, found, overflow = fn(vw, qw)
    return idx[:f], found[:f], overflow[:f]


def _probe_counts(vw, qw):
    """Per query: ``(lt, found)`` — count of table keys strictly below the
    query, and whether the query key exists in the table.

    Sort-merge join with the table inserted TWICE around the queries —
    tag 0 copies sort before equal-key queries, tag 2 copies after — so for
    a query ``q``: ``count(tag0 <= q)`` counts table keys ``<= q`` and
    ``count(tag2 <= q)`` counts table keys ``< q``; the key exists iff they
    differ (table keys are unique, so they differ by at most 1).  Everything
    is one (words+1)-array sort + two cumsums + one 2-array unsort: no
    associative_scan, no random gathers (TPU sorts are ~100x cheaper than
    random gathers: 0.34 ms to sort 400k pairs vs 39 ms for a 15-step binary
    search).  (tag, position) share one int32 word so a single-word key sort
    moves 2 arrays; (lt, found) share the unsort's single payload word.
    """
    shape = qw[0].shape
    qf = tuple(q.reshape(-1) for q in qw)
    n_t = vw[0].shape[0]
    n_q = qf[0].shape[0]
    assert max(n_t, n_q) < (1 << _TAG_SHIFT)

    keys = tuple(jnp.concatenate([v, q, v]) for v, q in zip(vw, qf))
    tpos = jnp.arange(n_t, dtype=jnp.int32)
    qpos = jnp.arange(n_q, dtype=jnp.int32)
    word = jnp.concatenate([
        tpos,                                   # tag 0: table, before queries
        qpos + jnp.int32(1 << _TAG_SHIFT),      # tag 1: queries
        tpos + jnp.int32(2 << _TAG_SHIFT),      # tag 2: table, after queries
    ])
    sword = jax.lax.sort((*keys, word), num_keys=len(keys) + 1)[-1]

    le = jnp.cumsum((sword < (1 << _TAG_SHIFT)).astype(jnp.int32))
    lt = jnp.cumsum((sword >= (2 << _TAG_SHIFT)).astype(jnp.int32))
    # pack (lt, found) into one int32 payload word
    res_s = (lt << 1) | (le > lt).astype(jnp.int32)

    # unsort by the unique word; queries land at positions [n_t, n_t + n_q)
    _, res = jax.lax.sort((sword, res_s), num_keys=1)
    res_q = res[n_t:n_t + n_q].reshape(shape)
    return res_q >> 1, (res_q & 1).astype(bool)


def _probe(vw, qw):
    """Find each query key in the sorted vertex table via the sort-merge
    join.  Returns ``(idx, found)``: dense vertex id (int32, arbitrary where
    not found) and a bool mask, shaped like the queries."""
    lt, found = _probe_counts(vw, qw)
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


def _lex_le(aw, bw):
    """word-tuple ``aw <= bw`` lexicographically, elementwise."""
    if len(aw) == 1:
        return aw[0] <= bw[0]
    return (aw[0] < bw[0]) | ((aw[0] == bw[0]) & (aw[1] <= bw[1]))


def _lex_lt(aw, bw):
    """word-tuple ``aw < bw`` lexicographically, elementwise."""
    if len(aw) == 1:
        return aw[0] < bw[0]
    return (aw[0] < bw[0]) | ((aw[0] == bw[0]) & (aw[1] < bw[1]))


def _lower_bound_2level(vw, qw, with_found: bool = False):
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
    n_t = vw[0].shape[0]
    pad = (-n_t) % lane
    if pad:
        filler = jnp.full((pad,), _SENTINEL, jnp.int32)
        vw = tuple(jnp.concatenate([v, filler]) for v in vw)
    nbk = vw[0].shape[0] // lane
    bf = tuple(v[::lane] for v in vw)                      # (nbk,) each
    shape = qw[0].shape
    qc = tuple(q.reshape(-1, 1) for q in qw)
    b0 = jnp.sum(_lex_lt(tuple(b[None, :] for b in bf), qc)
                 .astype(jnp.int32), axis=1)               # (nq,)
    safe_b = jnp.maximum(b0 - 1, 0)
    rows = tuple(v.reshape(nbk, lane)[safe_b] for v in vw)  # (nq, 128) each
    inblock = jnp.sum(_lex_lt(rows, qc).astype(jnp.int32), axis=1)
    lt = jnp.where(b0 == 0, 0, (b0 - 1) * lane + inblock)
    lt = jnp.minimum(lt, n_t)
    if not with_found:
        return lt.reshape(shape)
    eq_in = jnp.any(_w_eq(rows, qc), axis=1)
    bd = jnp.minimum(b0, nbk - 1)
    eq_bd = _w_eq(tuple(b[bd] for b in bf),
                  tuple(q[:, 0] for q in qc))
    found = (eq_in & (b0 > 0)) | eq_bd
    return lt.reshape(shape), found.reshape(shape)


def _probe_rows_sorted(vw, qw, bw=_PROBE_BW_CORR, block_caps=None):
    """Windowed probe for row-sorted queries (word-tuple keys).

    Returns ``(idx, found, overflow)``: like :func:`_probe` plus a per-tap
    count of real queries whose block's true span exceeded the static
    window.  Such queries degrade to "absent" (found=False) — the same
    contract as capacity overflow (vertices past ``capacity`` are dropped
    and counted), never a wrong index.  On FT3D-like clouds spans are ~210
    at B=128 (see _PROBE_W) so overflow is zero in practice; callers surface
    the counter through ``ScalePair.probe_overflow``.

    ``block_caps`` (optional, (H/B,) i32) overrides the default scalar
    valid-table-size cap on each query block's result-position bound —
    the fused dual-cloud probe passes per-segment caps because its table's
    real entries live in two runs ``[0, r_a) ∪ [H_a, H_a + r_b)``.
    """
    f, h = qw[0].shape
    n_t = vw[0].shape[0]
    b, w = bw
    pad = (-h) % b
    if pad:
        filler = jnp.full((f, pad), _SENTINEL, jnp.int32)
        qw_p = tuple(jnp.concatenate([q, filler], axis=1) for q in qw)
    else:
        qw_p = qw
    hp = qw_p[0].shape[1]
    nb = hp // b

    # block-boundary lower bounds via the small join: (f, nb) queries
    lt = _lower_bound_2level(vw, tuple(q[:, ::b] for q in qw_p))
    # windows start at a 128-aligned position so they can be fetched as
    # whole-row gathers of a (n/128, 128) view — XLA's fast row-gather path.
    # (An elementwise v[pos] gather lowers to scalar loads, ~1.2 ms per
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
    if block_caps is None:
        cap_row = jnp.sum((~_w_all_sentinel(vw)).astype(jnp.int32))  # scalar
        last = jnp.full((f, 1), 0, jnp.int32) + cap_row
    else:
        assert block_caps.shape == (nb,), (block_caps.shape, nb)
        cap_row = block_caps[None, :]                                # (1, nb)
        last = jnp.broadcast_to(block_caps[-1], (f, 1))
    bound = jnp.concatenate([lt[:, 1:], last], axis=1)
    bound = jnp.minimum(bound, cap_row)
    block_ok = bound + 1 - start <= w                             # (f, nb)

    tpad = n_t_pad - n_t
    vw_p = vw
    if tpad:
        filler_t = jnp.full((tpad,), _SENTINEL, jnp.int32)
        vw_p = tuple(jnp.concatenate([v, filler_t]) for v in vw)
    rows = (start[:, :, None] >> 7) + jnp.arange(w // lane, dtype=jnp.int32)
    rows = rows.reshape(-1)
    win = tuple(v.reshape(-1, lane)[rows].reshape(f, nb, 1, w) for v in vw_p)
    qc = tuple(q.reshape(f, nb, b, 1) for q in qw_p)
    # one fused reduce: low 16 bits count "window key <= query", bit 16
    # counts exact matches (at most one — table keys are unique).  No
    # in-table masking needed: positions past the table read the sentinel
    # padding, which never compares <= a real (non-sentinel) query, and
    # sentinel queries' results are discarded by the callers.  Single-word
    # keys make both terms one compare each.
    le_term = _lex_le(win, qc)
    eq_term = _w_eq(win, qc)
    enc = le_term.astype(jnp.int32) + (eq_term.astype(jnp.int32) << 16)
    cnt = jnp.sum(enc, axis=-1)                                   # (f, nb, b)
    idx = start[:, :, None] + (cnt & 0xFFFF) - 1
    found = (cnt >> 16 > 0) & block_ok[:, :, None]

    real_q = ~_w_all_sentinel(tuple(q[..., 0] for q in qc))
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
    bits: int = 10,
) -> CloudLattice:
    """Assign (metric) points to lattice vertices; see _build_from_elevated."""
    return _build_from_elevated(geom, geom.elevate(points, scale),
                                valid, capacity, bits)


def _build_from_elevated(
    geom: PermutohedralGeometry,
    elevated: jax.Array,     # (N, d1) float32
    valid: jax.Array,        # (N,) bool
    capacity: int,
    bits: int = 10,
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

    # range guard: coordinates that don't fit the packed fields (with the
    # stencil-delta margin) degrade the point to invalid — counted like
    # capacity overflow, never a wrapped/aliased key
    bound = (1 << (bits - 1)) - 1 - _DELTA_MARGIN
    in_range = jnp.all(jnp.abs(kb.keys) <= bound, axis=(-2, -1))   # (N,)
    range_dropped = jnp.sum((valid & ~in_range).astype(jnp.int32))
    valid = valid & in_range

    words = _pack_keys(kb.keys, d, bits)                   # (N, d1) each
    words = _w_where(valid[:, None], words, _SENTINEL)

    m = words[0].size
    nw = len(words)
    iota = jnp.arange(m, dtype=jnp.int32)
    sorted_all = jax.lax.sort(
        (*(w.reshape(-1) for w in words), iota), num_keys=nw)
    sw = sorted_all[:nw]
    perm = sorted_all[nw]
    real = ~_w_all_sentinel(sw)
    is_new = jnp.ones(sw[0].shape, dtype=bool)
    diff = sw[0][1:] != sw[0][:-1]
    for w in sw[1:]:
        diff = diff | (w[1:] != w[:-1])
    is_new = is_new.at[1:].set(diff)
    is_new = is_new & real

    num_unique = jnp.sum(is_new.astype(jnp.int32))
    overflow = jnp.maximum(num_unique - capacity, 0) + range_dropped
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
    rk, sw_p = ranks, sw
    if mp != m:
        rk = jnp.concatenate([rk, jnp.full(mp - m, 1 << 29, jnp.int32)])
        sw_p = tuple(
            jnp.concatenate([w, jnp.full(mp - m, _SENTINEL, jnp.int32)])
            for w in sw)
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
    rank_live = ranks_idx < num_unique
    vertex_start = jnp.where(rank_live, starts_sorted[:capacity], total_real)
    vertex_end = jnp.where(ranks_idx + 1 < num_unique,
                           starts_sorted[1:capacity + 1], total_real)
    vertex_end = jnp.where(rank_live, vertex_end, vertex_start)
    vertex_valid = vertex_start < vertex_end

    safe_pos = jnp.minimum(starts_sorted[:capacity], m - 1)
    sel = (jnp.arange(lane, dtype=jnp.int32)[None, :]
           == (safe_pos & (lane - 1))[:, None])
    vkeys = tuple(
        jnp.where(vertex_valid,
                  jnp.sum(jnp.where(
                      sel, w.reshape(nbk, lane)[safe_pos >> 7], 0), axis=1),
                  _SENTINEL)
        for w in sw_p)

    # per-entry dense ids are just the rank cumsum, unsorted back to flat
    # order through the key sort's permutation (no probe needed).  NB: a
    # 2-level dense lower bound here is NOT faster — the queries are in
    # original (unsorted) order, so its in-block row fetch becomes a random
    # 128-row gather (~130 MB per build, measured far slower than the sort).
    ids_sorted = jnp.where(real & (ranks < capacity), ranks, -1)
    _, ids_flat = jax.lax.sort((perm, ids_sorted), num_keys=1)
    lattice_offset = ids_flat.reshape(words[0].shape)

    barycentric = jnp.where(valid[:, None], kb.barycentric, 0.0)
    el_minus_gr = jnp.where(valid[:, None], kb.el_minus_gr, 0.0)

    # splat plan for free: sorted-by-key order == sorted-by-id order;
    # target ids equal dense ranks, so the block-first-rank array enables
    # the gather-free rank-mode reduction (ops/segment.py).  ranks[::128]
    # yields ceil(m/128) entries — exactly one per (possibly padded) block.
    same_prev = jnp.concatenate([jnp.zeros((1,), bool), ~diff])
    splat_plan = ReducePlan(ids=lattice_offset.reshape(-1), perm=perm,
                            start=vertex_start, end=vertex_end,
                            lrank=local_ranks(same_prev),
                            r0=ranks[::128])

    return CloudLattice(
        lattice_offset=lattice_offset,
        barycentric=barycentric,
        el_minus_gr=el_minus_gr,
        vkeys=vkeys,
        vertex_valid=vertex_valid,
        num_valid=jnp.minimum(num_unique, capacity).astype(jnp.int32),
        overflow=overflow.astype(jnp.int32),
        splat_plan=splat_plan,
    )


def _build_two_from_elevated(
    geom: PermutohedralGeometry,
    elev1: jax.Array,        # (N, d1) float32
    valid1: jax.Array,       # (N,) bool
    elev2: jax.Array,        # (N, d1) float32 — same N as elev1
    valid2: jax.Array,
    capacity: int,
    bits: int = 10,
) -> tuple:
    """Both clouds' lattices from ONE tagged sort (exact parity with two
    :func:`_build_from_elevated` calls).

    The fwd op profile is dominated by a ~9 ms tail of thousands of small
    builder ops (sorts, cumsums, dense bounds) repeated per cloud per
    scale; fusing the clouds halves that op count.  A cloud tag in bit 30
    of the packed low word dominates the lexicographic order, so one
    2m-entry sort yields ``[cloud1 sorted | cloud2 sorted]`` with each
    block's sentinels at its own tail (per-cloud sentinel ``tag | 2^30-1``
    sorts above every real key of its cloud and below the other cloud's).
    Each cloud's entries occupy exactly m sorted positions, so every
    per-cloud quantity is a static slice; dense ranks are recovered from
    the global rank cumsum by subtracting cloud 1's unique count.  The
    stable sort keeps equal keys in original relative order, making the
    permutation (and hence splat-plan lranks) bit-identical to the
    standalone builds.
    """
    assert elev1.shape == elev2.shape, (elev1.shape, elev2.shape)
    d = geom.d
    d1 = d + 1
    n = elev1.shape[0]
    m = n * d1
    valid_in = jnp.concatenate([valid1, valid2])
    kb = geom.simplex_from_elevated(
        jnp.concatenate([elev1, elev2], axis=0))

    bound = (1 << (bits - 1)) - 1 - _DELTA_MARGIN
    in_range = jnp.all(jnp.abs(kb.keys) <= bound, axis=(-2, -1))   # (2N,)
    rdrop = (valid_in & ~in_range).astype(jnp.int32)
    range_dropped = (jnp.sum(rdrop[:n]), jnp.sum(rdrop[n:]))
    valid = valid_in & in_range

    words = _pack_keys(kb.keys, d, bits)                   # (2N, d1) each
    tag = (jnp.arange(2 * n, dtype=jnp.int32)[:, None] >= n
           ).astype(jnp.int32) << _TAG_BIT
    w0 = jnp.where(valid[:, None], words[0] | tag, tag | _SENT_LO)
    rest = tuple(jnp.where(valid[:, None], w, _SENT_LO) for w in words[1:])
    flat = (w0.reshape(-1), *(w.reshape(-1) for w in rest))
    nw = len(flat)
    iota = jnp.arange(2 * m, dtype=jnp.int32)
    sorted_all = jax.lax.sort((*flat, iota), num_keys=nw)
    sw = sorted_all[:nw]
    perm = sorted_all[nw]
    real = (sw[0] & _SENT_LO) != _SENT_LO
    diff = sw[0][1:] != sw[0][:-1]
    for w in sw[1:]:
        diff = diff | (w[1:] != w[:-1])
    is_new = jnp.concatenate([jnp.ones((1,), bool), diff]) & real

    isn32 = is_new.astype(jnp.int32)
    nu1 = jnp.sum(isn32[:m])
    nu2 = jnp.sum(isn32[m:])
    real32 = real.astype(jnp.int32)
    total_real = (jnp.sum(real32[:m]), jnp.sum(real32[m:]))
    ranks_g = jnp.cumsum(isn32) - 1                         # (2m,)

    # fused 2-level dense lower bounds: cloud 2's rank-q run starts where
    # the global rank first reaches q + nu1 (every cloud-1 entry, sentinel
    # rows included, carries a global rank < nu1 + q)
    lane = 128
    mm = 2 * m
    mp = -(-mm // lane) * lane
    rk = ranks_g
    if mp != mm:
        rk = jnp.concatenate([rk, jnp.full(mp - mm, 1 << 29, jnp.int32)])
    nbk = mp // lane
    qb = jnp.arange(capacity + 1, dtype=jnp.int32)
    q = jnp.concatenate([qb, qb + nu1])                    # (2(cap+1),)
    r0b = rk[::lane]
    b0 = jnp.sum((r0b[None, :] < q[:, None]).astype(jnp.int32), axis=1)
    safe_b = jnp.maximum(b0 - 1, 0)
    rows_rk = rk.reshape(nbk, lane)[safe_b]
    inblock = jnp.sum((rows_rk < q[:, None]).astype(jnp.int32), axis=1)
    starts_all = jnp.minimum(
        jnp.where(b0 == 0, 0, (b0 - 1) * lane + inblock), mm)

    # one fused unsort of the dense ids (per-cloud ranks, capacity-clipped)
    ranks_local = jnp.concatenate([ranks_g[:m], ranks_g[m:] - nu1])
    ids_sorted = jnp.where(real & (ranks_local < capacity), ranks_local, -1)
    _, ids_flat = jax.lax.sort((perm, ids_sorted), num_keys=1)

    same_prev = jnp.concatenate([jnp.zeros((1,), bool), ~diff])
    sw_blocks = tuple(
        (jnp.concatenate([w, jnp.full(mp - mm, _SENTINEL, jnp.int32)])
         if mp != mm else w).reshape(nbk, lane)
        for w in sw)

    out = []
    for c in range(2):
        lo = c * m
        nu = nu1 if c == 0 else nu2
        starts_sorted = starts_all[c * (capacity + 1):(c + 1) * (capacity + 1)] - lo
        tre = total_real[c]

        ranks_idx = jnp.arange(capacity, dtype=jnp.int32)
        rank_live = ranks_idx < nu
        vertex_start = jnp.where(rank_live, starts_sorted[:capacity], tre)
        vertex_end = jnp.where(ranks_idx + 1 < nu,
                               starts_sorted[1:capacity + 1], tre)
        vertex_end = jnp.where(rank_live, vertex_end, vertex_start)
        vertex_valid = vertex_start < vertex_end

        safe_pos = jnp.minimum(starts_sorted[:capacity] + lo, mm - 1)
        sel = (jnp.arange(lane, dtype=jnp.int32)[None, :]
               == (safe_pos & (lane - 1))[:, None])
        raw = tuple(
            jnp.sum(jnp.where(sel, wb[safe_pos >> 7], 0), axis=1)
            for wb in sw_blocks)
        vkeys = (jnp.where(vertex_valid, raw[0] & _SENT_LO, _SENTINEL),
                 *(jnp.where(vertex_valid, w, _SENTINEL) for w in raw[1:]))

        lattice_offset = ids_flat[lo:lo + m].reshape(n, d1)
        bary = jnp.where(valid[c * n:(c + 1) * n, None],
                         kb.barycentric[c * n:(c + 1) * n], 0.0)
        emg = jnp.where(valid[c * n:(c + 1) * n, None],
                        kb.el_minus_gr[c * n:(c + 1) * n], 0.0)
        splat_plan = ReducePlan(
            ids=lattice_offset.reshape(-1),
            perm=perm[lo:lo + m] - lo,
            start=vertex_start, end=vertex_end,
            lrank=local_ranks(same_prev[lo:lo + m]),
            r0=ranks_local[lo:lo + m:128])
        out.append(CloudLattice(
            lattice_offset=lattice_offset,
            barycentric=bary,
            el_minus_gr=emg,
            vkeys=vkeys,
            vertex_valid=vertex_valid,
            num_valid=jnp.minimum(nu, capacity).astype(jnp.int32),
            overflow=(jnp.maximum(nu - capacity, 0)
                      + range_dropped[c]).astype(jnp.int32),
            splat_plan=splat_plan,
        ))
    return out[0], out[1]


def _neighbor_table(cl: CloudLattice, offsets: np.ndarray, d: int,
                    bits: int = 10):
    """((F, H) blur-neighbor ids, window-overflow count); -1 = absent."""
    # the stencil's first offset is the zero offset (identity tap: each valid
    # vertex maps to itself) — fill it directly and probe only the rest
    assert not offsets[0].any(), "stencil row 0 must be the zero offset"
    deltas = _pack_deltas(offsets[1:], d, bits)            # (F-1,) each
    # sentinel-mask invalid vertices so each query row stays sorted (the
    # windowed probe relies on it; results there are discarded anyway)
    ok_v = cl.vertex_valid[None, :]
    qw = _w_where(ok_v,
                  tuple(dv[:, None] + v[None, :]
                        for dv, v in zip(deltas, cl.vkeys)),
                  _SENTINEL)
    idx, found, oflow = _probe_dispatch(cl.vkeys, qw, rows_sorted=True,
                                        bw=_PROBE_BW_BLUR)
    ok = found & cl.vertex_valid[None, :]
    h = cl.vkeys[0].shape[0]
    iota = jnp.arange(h, dtype=jnp.int32)
    self_row = jnp.where(cl.vertex_valid, iota, -1)[None, :]
    rest = jnp.where(ok, idx, -1).astype(jnp.int32)
    return jnp.concatenate([self_row, rest], axis=0), jnp.sum(oflow)


def _fused_build_threshold() -> int:
    """Per-scale dual-cloud fusion policy from ``HPL_FUSED_BUILD``.

    ``"0"`` (default) never fuses; ``"1"`` fuses every scale; any other
    integer is a capacity threshold — fuse only scales whose capacity is
    <= the value.  Rationale: fusing the two clouds' builds+probes halves
    the op count but raises real compare/sort volume, so it LOSES at the
    fine scales (measured 24.7 ms fwd vs 23.3 all-fused-vs-unfused, TPU
    v5e, 8192-pt pairs) while the coarse scales — a few hundred vertices,
    cost = pure per-op overhead — looked like where halving op count could
    pay.  Measured (2026-08-20, same protocol): threshold 3584 (fuses the
    four coarse scales) is NEUTRAL — fwd 23.7 vs 23.6 ms, train 61.4 vs
    61.7 — the coarse builder ops are not the profile's small-op tail, so
    the default stays off.
    """
    import os
    v = os.environ.get("HPL_FUSED_BUILD", "0").strip()
    if v in ("", "0"):
        return -1
    if v == "1":
        return 1 << 30
    return int(v)


def _tag_words(words, tag: int):
    """Tag a key-word tuple's low word with the cloud bit.  Sentinel entries
    (detected by the low-30-bit pattern, any form) become the per-cloud
    sentinel ``tag | _SENT_LO`` so fused arrays stay sorted."""
    sent = _w_all_sentinel(words)
    t = np.int32(tag << _TAG_BIT)
    w0 = jnp.where(sent, t | _SENT_LO, words[0] | t)
    rest = tuple(jnp.where(sent, _SENT_LO, w) for w in words[1:])
    return (w0, *rest)


def _probe_two(vwa, ra, qa, vwb, rb, qb, bw, fuse: bool = False):
    """Fused windowed probe of (table_a, queries_a) and (table_b, queries_b).

    One probe over the tagged fused table ``[a | b]`` and column-concatenated
    tagged queries — the probes' fixed op costs (boundary bounds, window
    fetch plumbing) are paid once instead of twice.  Requires equal leading
    (tap) dims and sentinel-masked inputs; returns ``(idx_a, found_a,
    idx_b, found_b, overflow_sum)`` with b's indices rebased to its own
    table.  Falls back to two plain probes unless ``fuse`` (see
    :func:`_fused_build_threshold`), when the block size straddles the
    seam, under probe shard_map, or in exact mode.

    ``ra``/``rb`` are the tables' real-entry counts (CloudLattice.num_valid):
    a fused table's real entries live in two runs ``[0, ra) ∪ [Ha, Ha+rb)``,
    so the windowed probe gets per-segment position caps.
    """
    ha = vwa[0].shape[0]
    hb = vwb[0].shape[0]
    b = bw[0]
    from ..ops.dispatch import exact_mode_active
    fuse = (fuse and ha % b == 0 and hb % b == 0
            and qa[0].shape[1] == ha and qb[0].shape[1] == hb
            and qa[0].shape[0] == qb[0].shape[0]
            and _PROBE_MESH.get() is None and not exact_mode_active())
    if not fuse:
        ia, fa, oa = _probe_dispatch(vwa, qa, rows_sorted=True, bw=bw)
        ib, fb, ob = _probe_dispatch(vwb, qb, rows_sorted=True, bw=bw)
        return ia, fa, ib, fb, jnp.sum(oa) + jnp.sum(ob)

    vt = tuple(jnp.concatenate([x, y]) for x, y in
               zip(_tag_words(vwa, 0), _tag_words(vwb, 1)))
    qw = tuple(jnp.concatenate([x, y], axis=1) for x, y in zip(
        _tag_words(qa, 0), _tag_words(qb, 1)))
    caps = jnp.concatenate([
        jnp.broadcast_to(ra, (ha // b,)),
        jnp.broadcast_to(ha + rb, (hb // b,))]).astype(jnp.int32)
    idx, found, oflow = _probe_dispatch(vt, qw, rows_sorted=True, bw=bw,
                                        block_caps=caps)
    return (idx[:, :ha], found[:, :ha],
            idx[:, ha:] - ha, found[:, ha:], jnp.sum(oflow))


def _neighbor_table_two(cl1: CloudLattice, cl2: CloudLattice,
                        offsets: np.ndarray, d: int, bits: int = 10,
                        fuse: bool = False):
    """Both clouds' blur-neighbor tables from one (optionally fused) probe."""
    assert not offsets[0].any(), "stencil row 0 must be the zero offset"
    deltas = _pack_deltas(offsets[1:], d, bits)

    def queries(cl):
        return _w_where(cl.vertex_valid[None, :],
                        tuple(dv[:, None] + v[None, :]
                              for dv, v in zip(deltas, cl.vkeys)),
                        _SENTINEL)

    i1, f1, i2, f2, oflow = _probe_two(
        cl1.vkeys, cl1.num_valid, queries(cl1),
        cl2.vkeys, cl2.num_valid, queries(cl2),
        _PROBE_BW_BLUR, fuse=fuse)

    def table(cl, idx, found):
        ok = found & cl.vertex_valid[None, :]
        h = cl.vkeys[0].shape[0]
        iota = jnp.arange(h, dtype=jnp.int32)
        self_row = jnp.where(cl.vertex_valid, iota, -1)[None, :]
        rest = jnp.where(ok, idx, -1).astype(jnp.int32)
        return jnp.concatenate([self_row, rest], axis=0)

    return table(cl1, i1, f1), table(cl2, i2, f2), oflow


def _corr_tables(cl1: CloudLattice, cl2: CloudLattice,
                 filter_offsets: np.ndarray, corr_offsets: np.ndarray, d: int,
                 pc1_corr: jax.Array | None = None,
                 with_inverse: bool = False, bits: int = 10,
                 fuse: bool = False):
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

    def offset_queries(offsets_np, vkeys, ok):
        deltas = _pack_deltas(offsets_np, d, bits)
        return _w_where(ok, tuple(dv[:, None] + v[None, :]
                                  for dv, v in zip(deltas, vkeys)),
                        _SENTINEL)

    if pc1_corr is None:
        cw = offset_queries(corr_offsets, cl1.vkeys, ok_v)
        idx1, found1, oflow1 = _probe_dispatch(cl1.vkeys, cw,
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

    qw = offset_queries(uniq, cl1.vkeys, ok_v)
    nf, nc = filter_offsets.shape[0], corr_offsets.shape[0]
    inverse_m = jnp.asarray(inverse.astype(np.int32).reshape(nf, nc))

    uniq_inv = jnp.zeros((1, 1), dtype=jnp.int32)
    if with_inverse:
        # fuse the forward (cloud1 keys + delta into table 2) and adjoint
        # (cloud2 keys - delta into table 1) probes: one windowed pass
        ok_v2 = cl2.vertex_valid[None, :]
        rw = offset_queries(-uniq, cl2.vkeys, ok_v2)
        idx2, found2, idx3, found3, of23 = _probe_two(
            cl2.vkeys, cl2.num_valid, qw,
            cl1.vkeys, cl1.num_valid, rw, _PROBE_BW_CORR, fuse=fuse)
        probe_overflow = probe_overflow + of23
        ok3 = found3 & ok_v2
        uniq_inv = jnp.where(ok3, idx3, -1).astype(jnp.int32)  # (U, H2)
    else:
        idx2, found2, oflow2 = _probe_dispatch(cl2.vkeys, qw,
                                               rows_sorted=True)
        probe_overflow = probe_overflow + jnp.sum(oflow2)
    ok2 = found2 & ok_v
    uniq_tab = jnp.where(ok2, idx2, -1).astype(jnp.int32)   # (U, H1)
    return pc1_corr, uniq_tab, inverse_m, uniq_inv, probe_overflow


def _next_elevated(geom: PermutohedralGeometry, cl: CloudLattice,
                   scale: float, next_scale: float, bits: int = 10):
    """Next scale's elevated coordinates, directly from the vertex keys.

    Mathematically identical to the reference's un-elevate -> re-elevate
    roundtrip (transforms.py:461-469) — the keys lie on the ``sum == 0``
    hyperplane where elevation is the inverse of un-elevation — but computed
    as a single *elementwise* product ``key * (next_scale / scale)``.  That
    keeps deeper scales bit-deterministic: vertex-derived points sit exactly
    on rounding-tie boundaries, and a matmul roundtrip would let compiler
    fusion choices flip those ties.
    """
    keys = _unpack_keys(cl.vkeys, geom.d, bits)            # (H, d1)
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

    bits = spec.coord_bits
    # DEFAULT OFF: fusing the two clouds' builds+probes halves the op count
    # but RAISES real volume — the level-1 dense bounds compare every query
    # against 2x the block-first keys, and the 2x-length sort is
    # super-linear — measured 24.7 ms fwd / 62.1 train vs 23.3 / 61.7
    # all-scales-fused vs unfused (TPU v5e, 8192-pt pairs, 2026-08-19).
    # Kept (parity-tested) behind HPL_FUSED_BUILD: "1" fuses every scale,
    # an integer fuses only capacity<=threshold scales (the coarse,
    # op-count-dominated tail) — see _fused_build_threshold.
    fuse_thr = _fused_build_threshold()
    scales_out = []
    for i, ss in enumerate(spec.scales):
        fuse_builds = ss.capacity <= fuse_thr
        if fuse_builds and elev1.shape == elev2.shape:
            # one tagged sort builds both clouds (exact; halves the
            # builder's small-op tail — see _build_two_from_elevated)
            cl1, cl2 = _build_two_from_elevated(
                geom, elev1, valid1, elev2, valid2, ss.capacity, bits)
        else:
            cl1 = _build_from_elevated(geom, elev1, valid1, ss.capacity,
                                       bits)
            cl2 = _build_from_elevated(geom, elev2, valid2, ss.capacity,
                                       bits)

        from ..ops.pallas_stencil import (BLUR_WINDOW, CORR_INV_BLOCK,
                                          CORR_INV_WINDOW, CORR_WINDOW,
                                          stencil_overflow_count)
        from ..ops.dispatch import exact_mode_active, rank_fused_enabled
        from ..ops.segment import rank_reduce_overflow
        probe_oflow = jnp.zeros((), jnp.int32)
        # count rank blocks whose sorted-stream span exceeds the fused
        # rank-reduce kernel's window (ops/segment._wr_rank_fused): their
        # beyond-window splat entries are dropped on the TPU path — a
        # counted degrade, monitored like the stencil windows.  In exact
        # mode no windowed kernel runs, so the window counters are moot.
        _window_kernels = (jax.default_backend() == "tpu"
                           and not exact_mode_active())
        if _window_kernels and rank_fused_enabled():
            stencil_oflow = (rank_reduce_overflow(cl1.splat_plan)
                             + rank_reduce_overflow(cl2.splat_plan))
        else:
            stencil_oflow = jnp.zeros((), jnp.int32)

        def _soc(table, capacity, window, **kw):
            # window spans only degrade where the windowed Pallas kernels
            # actually run; CPU/exact-mode use the exact XLA paths
            if not _window_kernels:
                return jnp.zeros((), jnp.int32)
            return stencil_overflow_count(table, capacity, window, **kw)
        if ss.blur_radius != -1:
            offs = neighborhood_offsets(ss.blur_radius, spec.d)
            if fuse_builds:
                nb1, nb2, of12 = _neighbor_table_two(cl1, cl2, offs,
                                                     spec.d, bits,
                                                     fuse=True)
                probe_oflow = probe_oflow + of12
            else:
                nb1, of1 = _neighbor_table(cl1, offs, spec.d, bits)
                nb2, of2 = _neighbor_table(cl2, offs, spec.d, bits)
                probe_oflow = probe_oflow + of1 + of2
            stencil_oflow = (stencil_oflow
                             + _soc(nb1, ss.capacity, BLUR_WINDOW)
                             + _soc(nb2, ss.capacity, BLUR_WINDOW))
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
                    with_inverse=adjoint_plans, bits=bits, fuse=fuse_builds)
            else:
                corr1, corr2u, corr2inv, corr2u_inv, of_c = _corr_tables(
                    cl1, cl2, f_offs, c_offs, spec.d,
                    with_inverse=adjoint_plans, bits=bits, fuse=fuse_builds)
            probe_oflow = probe_oflow + of_c
            stencil_oflow = (stencil_oflow
                             + _soc(corr1, ss.capacity, BLUR_WINDOW)
                             + _soc(corr2u, ss.capacity, CORR_WINDOW))
            if adjoint_plans:
                # the corr_cross adjoint runs the inverse table through the
                # same windowed kernel (ops/corr._corr_cross_bwd); count its
                # spans so gradient degradation is monitored identically
                stencil_oflow = stencil_oflow + _soc(
                    corr2u_inv, ss.capacity, CORR_INV_WINDOW,
                    block=CORR_INV_BLOCK)
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
            elev1, valid1 = _next_elevated(geom, cl1, ss.scale, next_scale,
                                           bits)
            elev2, valid2 = _next_elevated(geom, cl2, ss.scale, next_scale,
                                           bits)

    return scales_out


def default_capacities(num_points: int, scales: Sequence[Sequence[float]],
                       d: int = 3):
    """Measured static capacities per scale (see lattice/capacity.py).

    Counts are NOT monotone down the pyramid (a mild coarsening step grows
    the table — each vertex splats into d+1 coarser-simplex corners), so
    the defaults are measured on synthetic FT3D-like clouds at
    ``num_points`` rather than modeled with a decay heuristic.  Tune with
    ``tools/measure_capacities.py`` on real data.
    """
    from .capacity import measured_default_capacities
    return measured_default_capacities(num_points, scales, d=d)
