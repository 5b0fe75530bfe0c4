"""Interpret-mode correctness of the fused Pallas stencil kernel.

The TPU-compiled path is exercised by bench.py / the driver on real
hardware; here the same kernel runs under the Pallas interpreter on CPU and
must match a dense reference bit-for-bit-ish (f32 matmul tolerance), both on
the fast (windows fit) path and through the XLA fallback.
"""

import numpy as np
import jax
import jax.numpy as jnp

from hplflownet_tpu.ops.pallas_stencil import stencil_gather_matmul


def _ref(table, nb, kern):
    h, _ = table.shape
    out = np.zeros((nb.shape[1], kern.shape[2]), np.float32)
    for f in range(nb.shape[0]):
        ok = nb[f] >= 0
        out[ok] += table[nb[f][ok]] @ kern[f]
    return out


def _mk(rng, H, F, C, CO, drift):
    table = rng.randn(H, C).astype(np.float32)
    nb = np.stack([
        np.sort(np.clip(np.arange(H) + rng.randint(-drift, drift, H),
                        0, H - 1))
        for _ in range(F)]).astype(np.int32)
    nb = np.where(rng.rand(F, H) < 0.1, -1, nb).astype(np.int32)
    kern = (rng.randn(F, C, CO) * 0.1).astype(np.float32)
    return table, nb, kern


def test_stencil_kernel_tight_spans_exact():
    rng = np.random.RandomState(0)
    table, nb, kern = _mk(rng, 3000, 15, 68, 64, drift=40)
    got = np.asarray(jax.jit(
        lambda t, n, k: stencil_gather_matmul(t, n, k, interpret=True)
    )(table, nb, kern))
    np.testing.assert_allclose(got, _ref(table, nb, kern), atol=2e-3)


def test_stencil_kernel_wide_spans_degrade_to_zero_contribution():
    """Out-of-window taps must contribute exactly zero (the counted
    degrade-to-absent contract) — never a wrong row."""
    from hplflownet_tpu.ops.pallas_stencil import (
        _BLOCK, _ALIGN, stencil_overflow_count)

    rng = np.random.RandomState(1)
    h = 3000
    table, _, kern = _mk(rng, h, 15, 68, 64, drift=40)
    # bimodal rows: the transition block spans nearly the whole table,
    # far past any window
    low = rng.randint(0, 100, (15, h))
    high = rng.randint(h - 100, h, (15, h))
    nb = np.sort(np.where(rng.rand(15, h) < 0.5, low, high),
                 axis=1).astype(np.int32)
    nb[:, ::7] = -1
    nb = np.ascontiguousarray(nb)
    window = 384

    # replicate window_starts to get the expected per-tap drops; the kernel
    # pads the table height to 16 alignment, so the clip bound is
    # h_pad - window (see stencil_gather_matmul)
    nblk = -(-h // _BLOCK)
    pad = nblk * _BLOCK - h
    h_pad = max(-(-h // _ALIGN) * _ALIGN, window)
    nbp = np.concatenate([nb, np.full((15, pad), -1, np.int32)], axis=1)
    blk = nbp.reshape(15, nblk, _BLOCK)
    valid = blk >= 0
    lo = np.where(valid, blk, h_pad).min(axis=2)
    starts = np.clip(np.where(lo >= h_pad, 0, lo) & ~(_ALIGN - 1),
                     0, max(h_pad - window, 0))
    in_win = valid & (blk - starts[:, :, None] < window)
    eff_nb = np.where(in_win, blk, -1).reshape(15, -1)[:, :h]

    got = np.asarray(jax.jit(
        lambda t, n, k: stencil_gather_matmul(t, n, k, window=window,
                                              interpret=True)
    )(table, nb, kern))
    np.testing.assert_allclose(got, _ref(table, eff_nb, kern), atol=2e-3)
    # and the builder-side counter flags the drops
    assert int(np.asarray(
        stencil_overflow_count(nb, h, window))) > 0


def test_stencil_kernel_small_table():
    rng = np.random.RandomState(2)
    table, nb, kern = _mk(rng, 200, 15, 20, 16, drift=10)
    got = np.asarray(jax.jit(
        lambda t, n, k: stencil_gather_matmul(t, n, k, interpret=True)
    )(table, nb, kern))
    np.testing.assert_allclose(got, _ref(table, nb, kern), atol=2e-3)


def test_stencil_kernel_fused_epilogue():
    """bias + leaky-ReLU + bf16 cast inside the kernel == applying them
    outside the plain kernel."""
    rng = np.random.RandomState(3)
    table, nb, kern = _mk(rng, 1500, 15, 36, 24, drift=30)
    bias = rng.randn(24).astype(np.float32)
    got = np.asarray(jax.jit(
        lambda t, n, k, b: stencil_gather_matmul(
            t, n, k, bias=b, act_slope=0.1, out_dtype=jnp.bfloat16,
            interpret=True)
    )(table, nb, kern, bias).astype(jnp.float32))
    pre = _ref(table, nb, kern) + bias
    want = np.where(pre >= 0, pre, 0.1 * pre).astype(
        jnp.bfloat16).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_stencil_dkernel_matches_spread_form():
    """dW[f] = sum_v table[nb[f, v]]^T g[v] — the windowed weight-gradient
    kernel equals the dense spread contraction."""
    from hplflownet_tpu.ops.pallas_stencil import stencil_dkernel

    rng = np.random.RandomState(4)
    table, nb, _ = _mk(rng, 2000, 15, 36, 0, drift=30)
    g = rng.randn(nb.shape[1], 24).astype(np.float32)
    got = np.asarray(jax.jit(
        lambda t, n, gg: stencil_dkernel(t, n, gg, interpret=True)
    )(table, nb, g))
    want = np.zeros((15, 36, 24), np.float32)
    for f in range(15):
        ok = nb[f] >= 0
        want[f] = table[nb[f][ok]].T @ g[ok]
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_stencil_tap_tables_sum_matches_gather_sum():
    """out[v] = sum_f tables[nb[f, v], f-th column group]."""
    from hplflownet_tpu.ops.pallas_stencil import stencil_tap_tables_sum

    rng = np.random.RandomState(5)
    f, h, hout, c = 10, 1800, 1500, 128
    tables = rng.randn(h, f * c).astype(np.float32)
    nb = np.stack([
        np.sort(np.clip(np.arange(hout) * h // hout
                        + rng.randint(-30, 30, hout), 0, h - 1))
        for _ in range(f)]).astype(np.int32)
    nb = np.where(rng.rand(f, hout) < 0.1, -1, nb).astype(np.int32)
    got = np.asarray(jax.jit(
        lambda t, n: stencil_tap_tables_sum(t, c, n, group=4,
                                            interpret=True)
    )(tables, nb))
    want = np.zeros((hout, c), np.float32)
    for k in range(f):
        ok = nb[k] >= 0
        want[ok] += tables[nb[k][ok], k * c:(k + 1) * c]
    np.testing.assert_allclose(got, want, atol=5e-3)

    # pre-padded producer contract (tap_tables_layout): tables emitted at
    # (h_pad, f_pad*c) with zero pad rows/columns give identical results
    # with no wrapper-side concatenation (the hot path's pad-copy fix)
    from hplflownet_tpu.ops.pallas_stencil import tap_tables_layout
    h_pad, f_pad, group = tap_tables_layout(f, h, group=3)
    assert f_pad > f, "pick a group that does not divide f for this test"
    got3 = np.asarray(jax.jit(
        lambda t, n: stencil_tap_tables_sum(t, c, n, group=3,
                                            interpret=True)
    )(tables, nb))
    pre = np.zeros((h_pad, f_pad * c), np.float32)
    pre[:h, :f * c] = tables
    got_pre = np.asarray(jax.jit(
        lambda t, n: stencil_tap_tables_sum(t, c, n, group=3,
                                            interpret=True)
    )(pre, nb))
    np.testing.assert_allclose(got_pre, got3, atol=0.0)


def test_blocked_rank_partial_matches_xla_stage():
    """The fused splat partial-stage kernel == the XLA one-hot matmul."""
    from hplflownet_tpu.ops.pallas_stencil import blocked_rank_partial
    from hplflownet_tpu.ops.segment import (_partial_blocks_xla, local_ranks,
                                            _BLOCK)

    rng = np.random.RandomState(6)
    n, c, r = 700, 20, 4
    m = n * r
    rows = rng.randn(n, c).astype(np.float32)
    weights = rng.rand(n, r).astype(np.float32)
    perm = rng.permutation(m).astype(np.int32)
    same = rng.rand(m) < 0.6
    same[0] = False
    lrank = np.asarray(local_ranks(jnp.asarray(same)))
    pid, rid = perm // r, perm % r

    cat = np.concatenate([rows, weights], axis=1)
    g = cat[pid]
    w = weights[pid, rid]
    for with_w in (False, True):
        sv = g[:, :c] * w[:, None]
        if with_w:
            sv = np.concatenate([sv, w[:, None]], axis=1)
        want = np.asarray(_partial_blocks_xla(jnp.asarray(lrank),
                                              jnp.asarray(sv)))
        meta = (lrank | (rid << 16)).astype(np.int32)
        got = np.asarray(jax.jit(
            lambda gg, mm: blocked_rank_partial(gg, mm, c, r, with_w,
                                                interpret=True)
        )(g, meta))
        np.testing.assert_allclose(got[:want.shape[0]], want, atol=1e-4)
        np.testing.assert_allclose(got[want.shape[0]:], 0.0, atol=0)

    # plain-rows mode (r=0): partials of the stream itself
    want = np.asarray(_partial_blocks_xla(jnp.asarray(lrank),
                                          jnp.asarray(g)))
    got = np.asarray(jax.jit(
        lambda gg, mm: blocked_rank_partial(gg, mm, c + r, 0,
                                            interpret=True)
    )(g, jnp.asarray(lrank)))
    np.testing.assert_allclose(got[:want.shape[0]], want, atol=1e-4)


def _mk_rank_plan(rng, t, m_real, m, r):
    """Synthetic rank-mode ReducePlan pieces + a sorted stream.

    Dense ranks with random run lengths over the first ``m_real`` entries;
    the tail is sentinel (rank sticks at the last real one, zero values —
    the rank-mode contract).  Returns (plan, g, rid, dense_ref_ids).
    """
    from hplflownet_tpu.ops.segment import ReducePlan, local_ranks

    # random run lengths >= 1 until m_real is exhausted
    ranks = []
    cur = 0
    while len(ranks) < m_real and cur < t:
        ln = int(rng.randint(1, 7))
        ranks.extend([cur] * min(ln, m_real - len(ranks)))
        cur += 1
    nuniq = ranks[-1] + 1
    ranks = np.asarray(ranks + [nuniq - 1] * (m - len(ranks)), np.int32)
    valid = np.arange(m) < m_real

    same = np.concatenate([[False], ranks[1:] == ranks[:-1]])
    # sentinel tail: key changes once at the real->sentinel boundary
    if m > m_real:
        same[m_real] = False
        same[m_real + 1:] = True
    lrank = np.asarray(local_ranks(jnp.asarray(same)))
    start = np.searchsorted(ranks[:m_real], np.arange(t)).astype(np.int32)
    end = np.searchsorted(ranks[:m_real], np.arange(t), "right").astype(
        np.int32)
    dead = np.arange(t) >= nuniq
    start = np.where(dead, m_real, start).astype(np.int32)
    end = np.where(dead, m_real, end).astype(np.int32)
    r0 = np.where(valid[::128], ranks[::128], nuniq - 1).astype(np.int32)
    plan = ReducePlan(
        ids=jnp.asarray(np.where(valid, ranks, -1)),
        perm=jnp.arange(m, dtype=jnp.int32),
        start=jnp.asarray(start), end=jnp.asarray(end),
        lrank=jnp.asarray(lrank), r0=jnp.asarray(ranks[::128]))
    return plan, ranks, valid


def test_blocked_rank_reduce_matches_dense_segment_sum():
    """The fused rank-mode reduction == a dense numpy segment sum."""
    from hplflownet_tpu.ops.segment import _wr_rank_fused

    rng = np.random.RandomState(11)
    t, m_real, m, c, r = 640, 1500, 1600, 20, 4
    plan, ranks, valid = _mk_rank_plan(rng, t, m_real, m, r)
    g = rng.randn(m, c + r).astype(np.float32)
    g[~valid] = 0.0                       # rank-mode zero-sentinel contract
    rid = rng.randint(0, r, m).astype(np.int32)

    w = np.take_along_axis(g[:, c:], rid[:, None], axis=1)[:, 0]
    sv = g[:, :c] * w[:, None]
    want = np.zeros((t, c + 1), np.float32)
    np.add.at(want[:, :c], ranks[valid], sv[valid])
    np.add.at(want[:, c], ranks[valid], w[valid])

    for with_w in (False, True):
        got = np.asarray(jax.jit(
            lambda gg, rr: _wr_rank_fused(plan, gg, rr, c, r, with_w,
                                          interpret=True))(g, rid))
        cols = c + 1 if with_w else c
        np.testing.assert_allclose(got, want[:, :cols], atol=1e-4)

    # plain-rows mode (r=0)
    got = np.asarray(jax.jit(
        lambda gg: _wr_rank_fused(plan, gg, jnp.zeros((m,), jnp.int32),
                                  c + r, 0, False, interpret=True))(g))
    want0 = np.zeros((t, c + r), np.float32)
    np.add.at(want0, ranks[valid], g[valid])
    np.testing.assert_allclose(got, want0, atol=1e-4)


def test_blocked_rank_reduce_overflow_degrades_and_is_counted():
    """Entries past the 2-block window are dropped; the builder-side
    counter flags exactly the affected rank blocks."""
    from hplflownet_tpu.ops.segment import (_wr_rank_fused,
                                            rank_reduce_overflow,
                                            rank_reduce_window)

    rng = np.random.RandomState(12)
    # one giant run (rank 3) makes super-block 0's span blow past the
    # window (many single-entry ranks keep the M/T-scaled window small)
    t, c, r = 8192, 8, 4
    runs = [5, 2, 3, 40000, 2, 3] + [1] * 8000
    ranks = np.concatenate([np.full(ln, i, np.int32)
                            for i, ln in enumerate(runs)])
    m = m_real = len(ranks)
    same = np.concatenate([[False], ranks[1:] == ranks[:-1]])
    from hplflownet_tpu.ops.segment import ReducePlan, local_ranks
    lrank = np.asarray(local_ranks(jnp.asarray(same)))
    start = np.searchsorted(ranks, np.arange(t)).astype(np.int32)
    end = np.searchsorted(ranks, np.arange(t), "right").astype(np.int32)
    nuniq = len(runs)
    dead = np.arange(t) >= nuniq
    start = np.where(dead, m, start).astype(np.int32)
    end = np.where(dead, m, end).astype(np.int32)
    plan = ReducePlan(ids=jnp.asarray(ranks),
                      perm=jnp.arange(m, dtype=jnp.int32),
                      start=jnp.asarray(start), end=jnp.asarray(end),
                      lrank=jnp.asarray(lrank),
                      r0=jnp.asarray(ranks[::128]))

    from hplflownet_tpu.ops.pallas_stencil import rank_reduce_geometry
    w2, bo = rank_reduce_geometry(m, t)
    assert 2 * w2 < 40000, "test needs the giant run to overflow coverage"
    n_over = int(np.asarray(rank_reduce_overflow(plan)))
    assert n_over >= 1

    g = rng.randn(m, c + r).astype(np.float32)
    rid = rng.randint(0, r, m).astype(np.int32)
    got = np.asarray(jax.jit(
        lambda gg, rr: _wr_rank_fused(plan, gg, rr, c, r, False,
                                      interpret=True))(g, rid))

    # reference restricted to each super-block's true 2-window coverage,
    # mirroring the kernel's chunk targeting: a chunk contributes to output
    # rows [k0 * 128, k0 * 128 + 256) with k0 clamped into the super-block
    w = np.take_along_axis(g[:, c:], rid[:, None], axis=1)[:, 0]
    sv = g[:, :c] * w[:, None]
    n_w = (-(-m // w2) + 1) * w2
    step = bo * 128
    want = np.zeros((t, c), np.float32)
    for i in range(-(-t // step)):
        base = i * step
        bs = min(max(start[base] // w2, 0), n_w // w2 - 2)
        for cc in range(2 * w2 // 128):
            lo = bs * w2 + cc * 128
            hi = min(lo + 128, m)
            if lo >= m:
                continue
            rk = ranks[lo:hi]
            k0 = min(max((int(rk[0]) - base) >> 7, 0), max(bo - 2, 0))
            osz = 256 if bo >= 2 else 128
            r_lo = base + k0 * 128
            sel = (rk >= r_lo) & (rk < min(r_lo + osz, base + step))
            # rows of other super-blocks also miss: rank one-hot window
            sel &= (rk >= base) & (rk < base + step)
            np.add.at(want, rk[sel], sv[lo:hi][sel])
    # the giant run sums many f32 terms in a different association order
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=5e-3)


def test_rank_fused_matches_weighted_reduce_on_builder_plan():
    """Compose the fused rank-mode kernel with a REAL builder splat plan
    (not a synthetic one): _wr_rank_fused in interpret mode must equal the
    exact weighted_reduce path (CPU: blocked partials + combine) on the
    plan produced by _build_from_elevated, verifying the
    r0 + lrank == global-rank identity and start/window coverage against
    actual builder output."""
    from hplflownet_tpu.lattice import build_pyramid
    from hplflownet_tpu.pipeline import make_lattice_spec
    from hplflownet_tpu.ops.segment import (_wr_rank_fused, weighted_reduce,
                                            rank_reduce_overflow)

    rng = np.random.RandomState(7)
    n, d1, c = 256, 4, 12
    pc1 = rng.randn(n, 3).astype(np.float32) * 3.0
    pc2 = pc1 + 0.1 * rng.randn(n, 3).astype(np.float32)
    spec = make_lattice_spec(
        [[1.0, 1, 1, 1], [0.5, 1, 1, 1]], capacities=[1024, 1024])
    scales = jax.jit(lambda a, b: build_pyramid(spec, a, b))(pc1, pc2)

    for sp in scales:
        for plan, bary in ((sp.pc1_splat_plan, sp.pc1_barycentric),
                           (sp.pc2_splat_plan, sp.pc2_barycentric)):
            assert int(np.asarray(rank_reduce_overflow(plan))) == 0
            weights = np.asarray(bary).astype(np.float32)
            # deeper scales splat the previous scale's vertex rows, so the
            # row count follows the plan (N = M / d1), not the point count
            rows = rng.randn(weights.shape[0], c).astype(np.float32)
            r = weights.shape[1]
            assert r == d1
            for with_w in (False, True):
                want = np.asarray(weighted_reduce(
                    with_w, plan, jnp.asarray(rows), jnp.asarray(weights)))
                # mirror _wr_forward's stream construction, then run the
                # fused kernel on it in interpret mode
                pid = np.asarray(plan.perm) // r
                rid = np.asarray(plan.perm % r).astype(np.int32)
                cat = np.concatenate([rows, weights], axis=1)
                g = cat[pid]
                got = np.asarray(jax.jit(
                    lambda gg, rr: _wr_rank_fused(
                        plan, gg, rr, c, r, with_w, interpret=True)
                )(g, rid))
                np.testing.assert_allclose(got, want, atol=2e-4)
