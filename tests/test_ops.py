"""BCL / correlation op tests against loop oracles + adjoint parity.

Every op here is scatter-free in both directions (ops/segment.py); the
gradient tests compare the custom VJPs against plain-AD reference
implementations built on jax.ops.segment_sum (fine on CPU).
"""

import numpy as np
import jax
import jax.numpy as jnp

from hplflownet_tpu.lattice import LatticeSpec, ScaleSpec, build_pyramid
from hplflownet_tpu.lattice.offsets import tap_negation
from hplflownet_tpu.ops import splat, blur_matmul, slice_to_points
from hplflownet_tpu.ops.bcl import BilateralConv
from hplflownet_tpu.ops.corr import BilateralCorrelation, gather_rows, corr_cross
from tests.oracle import ops_oracle as oracle

NEG15 = tap_negation(1, 3)


def make_scale(n=96, seed=0, capacity=512):
    rng = np.random.RandomState(seed)
    pts1 = (rng.randn(n, 3) * 2.5).astype(np.float32)
    pts2 = (rng.randn(n, 3) * 2.5).astype(np.float32)
    spec = LatticeSpec(d=3, scales=(ScaleSpec(1.0, 1, 1, 1, capacity=capacity),))
    sp = build_pyramid(spec, jnp.asarray(pts1), jnp.asarray(pts2))[0]
    return sp, rng


def test_splat_matches_oracle_and_conserves_mass():
    sp, rng = make_scale()
    n = sp.pc1_barycentric.shape[0]
    feats = rng.randn(n, 8).astype(np.float32)
    cap = sp.pc1_blur_neighbors.shape[1]

    got_raw = splat(jnp.asarray(feats), sp.pc1_barycentric,
                    sp.pc1_splat_plan, normalize=False)
    want_raw = oracle.splat_np(feats, np.asarray(sp.pc1_barycentric),
                               np.asarray(sp.pc1_lattice_offset), cap,
                               normalize=False)
    np.testing.assert_allclose(np.asarray(got_raw), want_raw, atol=1e-4)
    # sentinel row zero; total mass preserved (barycentric sums to 1)
    np.testing.assert_allclose(np.asarray(got_raw)[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_raw).sum(0), feats.sum(0),
                               rtol=1e-4)

    got = splat(jnp.asarray(feats), sp.pc1_barycentric,
                sp.pc1_splat_plan, normalize=True)
    want = oracle.splat_np(feats, np.asarray(sp.pc1_barycentric),
                           np.asarray(sp.pc1_lattice_offset), cap,
                           normalize=True)
    # near-empty vertices amplify fp noise by 1/(density + 1e-5) ~ 1e5 — in
    # the reference exactly as here — so gate the tight comparison on density
    density = oracle.splat_np(np.ones((n, 1), np.float32),
                              np.asarray(sp.pc1_barycentric),
                              np.asarray(sp.pc1_lattice_offset), cap,
                              normalize=False)[:, 0]
    meaningful = density > 5e-2
    np.testing.assert_allclose(np.asarray(got)[meaningful],
                               want[meaningful], atol=3e-4)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-3)


def test_splat_grad_matches_segment_sum_reference():
    sp, rng = make_scale(seed=9, n=64, capacity=320)
    n = sp.pc1_barycentric.shape[0]
    cap = sp.pc1_blur_neighbors.shape[1]
    feats = jnp.asarray(rng.randn(n, 6).astype(np.float32))
    bary = sp.pc1_barycentric
    ids = (sp.pc1_lattice_offset + 1).reshape(-1)

    def ref_splat(f):
        vals = (f[:, None, :] * bary[:, :, None]).reshape(-1, 6)
        out = jax.ops.segment_sum(vals, ids, num_segments=cap + 1)
        dens = jax.ops.segment_sum(bary.reshape(-1), ids, num_segments=cap + 1)
        out = out * (1.0 / (dens + 1e-5))[:, None]
        return out.at[0].set(0.0)

    def ours(f):
        return splat(f, bary, sp.pc1_splat_plan, normalize=True)

    # prefix-sum density error is amplified by 1/(density+eps) on
    # near-empty vertices (the reference computes exact sums there)
    np.testing.assert_allclose(np.asarray(ours(feats)),
                               np.asarray(ref_splat(feats)), atol=5e-3)
    g_ref = jax.grad(lambda f: jnp.sum(jnp.sin(ref_splat(f))))(feats)
    g_ours = jax.grad(lambda f: jnp.sum(jnp.sin(ours(f))))(feats)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                               atol=5e-3)


def test_blur_matches_oracle_and_identity_filter():
    sp, rng = make_scale(seed=1)
    cap = sp.pc1_blur_neighbors.shape[1]
    c_in, c_out = 6, 5
    splatted = rng.randn(cap + 1, c_in).astype(np.float32)
    splatted[0] = 0.0
    kernel = rng.randn(15, c_in, c_out).astype(np.float32) * 0.2
    bias = rng.randn(c_out).astype(np.float32)

    got = blur_matmul(NEG15, None, "float32", jnp.asarray(splatted), sp.pc1_blur_neighbors,
                      jnp.asarray(kernel), jnp.asarray(bias))
    # oracle expects vertex-major (H, F) neighbors
    want = oracle.blur_np(splatted, np.asarray(sp.pc1_blur_neighbors).T,
                          kernel, bias)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    # identity: center-tap-only square kernel reproduces the input
    # (on valid vertices; padded rows have no self-neighbor and yield zero)
    ident = np.zeros((15, c_in, c_in), dtype=np.float32)
    ident[0] = np.eye(c_in)
    got_id = np.asarray(blur_matmul(NEG15, None, "float32", jnp.asarray(splatted),
                                    sp.pc1_blur_neighbors,
                                    jnp.asarray(ident), jnp.zeros(c_in)))
    valid = np.asarray(sp.pc1_blur_neighbors)[0] >= 0
    np.testing.assert_allclose(got_id[valid], splatted[1:][valid], atol=1e-5)
    np.testing.assert_allclose(got_id[~valid], 0.0, atol=1e-6)


def test_blur_grad_matches_plain_ad():
    """The negated-tap adjoint equals AD through a gather implementation."""
    sp, rng = make_scale(seed=2, n=48, capacity=256)
    nb = sp.pc1_blur_neighbors
    cap = nb.shape[1]
    c_in, c_out = 5, 4
    splatted = jnp.asarray(rng.randn(cap + 1, c_in).astype(np.float32))
    splatted = splatted.at[0].set(0.0)
    kernel = jnp.asarray(rng.randn(15, c_in, c_out).astype(np.float32))
    bias = jnp.asarray(rng.randn(c_out).astype(np.float32))

    def ref_blur(s, k, b):
        gathered = s[nb + 1]                      # (F, H, C_in)
        return jnp.einsum("fhc,fco->ho", gathered, k) + b

    def ours(s, k, b):
        return blur_matmul(NEG15, None, "float32", s, nb, k, b)

    np.testing.assert_allclose(np.asarray(ours(splatted, kernel, bias)),
                               np.asarray(ref_blur(splatted, kernel, bias)),
                               atol=1e-4)

    def loss(fn):
        return lambda s, k, b: jnp.sum(jnp.tanh(fn(s, k, b)))

    g_ref = jax.grad(loss(ref_blur), argnums=(0, 1, 2))(splatted, kernel, bias)
    g_our = jax.grad(loss(ours), argnums=(0, 1, 2))(splatted, kernel, bias)
    # row 0 cotangent is defined as zero in our adjoint (constant sentinel)
    np.testing.assert_allclose(np.asarray(g_our[0])[1:],
                               np.asarray(g_ref[0])[1:], atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_our[1]), np.asarray(g_ref[1]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_our[2]), np.asarray(g_ref[2]),
                               atol=1e-4)


def test_slice_matches_oracle_and_grads():
    sp, rng = make_scale(seed=2)
    cap = sp.pc1_blur_neighbors.shape[1]
    blurred = jnp.asarray(rng.randn(cap, 7).astype(np.float32))
    got = slice_to_points(blurred, sp.pc1_barycentric,
                          sp.pc1_lattice_offset, sp.pc1_splat_plan)
    want = oracle.slice_np(np.asarray(blurred),
                           np.asarray(sp.pc1_barycentric),
                           np.asarray(sp.pc1_lattice_offset))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    # adjoint parity vs plain AD through the gather
    def ref_slice(b):
        safe = jnp.clip(sp.pc1_lattice_offset, 0, cap - 1)
        return jnp.einsum("nr,nrc->nc", sp.pc1_barycentric, b[safe])

    def ours(b):
        return slice_to_points(b, sp.pc1_barycentric,
                               sp.pc1_lattice_offset, sp.pc1_splat_plan)

    g_ref = jax.grad(lambda b: jnp.sum(jnp.sin(ref_slice(b))))(blurred)
    g_our = jax.grad(lambda b: jnp.sum(jnp.sin(ours(b))))(blurred)
    np.testing.assert_allclose(np.asarray(g_our), np.asarray(g_ref), atol=1e-5)


def test_splat_blur_slice_roundtrip_constant():
    """Splatting a constant field, identity blur, slicing back: constant."""
    sp, _ = make_scale(seed=3)
    n = sp.pc1_barycentric.shape[0]
    feats = jnp.ones((n, 4))
    sp_pad = splat(feats, sp.pc1_barycentric, sp.pc1_splat_plan)
    sliced = slice_to_points(sp_pad[1:], sp.pc1_barycentric,
                             sp.pc1_lattice_offset, sp.pc1_splat_plan)
    np.testing.assert_allclose(np.asarray(sliced), 1.0, atol=1e-3)


def test_gather_rows_and_corr_cross_grads():
    sp, rng = make_scale(seed=7, n=64, capacity=320)
    cap = sp.pc1_blur_neighbors.shape[1]
    c, w = 6, 5
    pad2 = jnp.asarray(rng.randn(cap + 1, c).astype(np.float32))
    pad2 = pad2.at[0].set(0.0)
    k_cross = jnp.asarray(rng.randn(15, c, w).astype(np.float32))
    uniq = sp.pc2_corr_uniq                       # (U, H1)
    inv = sp.pc2_corr_inverse                     # (F, Cc)
    idx_full = sp.pc2_corr_indices_full()         # (F, Cc, H1)
    n_uniq = uniq.shape[0]

    def k2_of(k):
        onehot = jax.nn.one_hot(inv, n_uniq, dtype=k.dtype)
        return jnp.einsum("fku,kcw->ucfw", onehot, k)

    def ref(p2, k):
        sp2 = p2[idx_full + 1]                    # (F, Cc, H1, C)
        return jnp.einsum("fkhc,kcw->hfw", sp2, k)

    def ours(p2, k):
        return corr_cross(p2, uniq, k2_of(k), sp.pc2_corr_uniq_inv)

    np.testing.assert_allclose(np.asarray(ours(pad2, k_cross)),
                               np.asarray(ref(pad2, k_cross)), atol=1e-4)
    g_ref = jax.grad(lambda p, k: jnp.sum(jnp.tanh(ref(p, k))),
                     argnums=(0, 1))(pad2, k_cross)
    g_our = jax.grad(lambda p, k: jnp.sum(jnp.tanh(ours(p, k))),
                     argnums=(0, 1))(pad2, k_cross)
    np.testing.assert_allclose(np.asarray(g_our[0])[1:],
                               np.asarray(g_ref[0])[1:], atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_our[1]), np.asarray(g_ref[1]),
                               atol=1e-4)

    # gather_rows adjoint
    tbl = jnp.asarray(rng.randn(cap + 1, c).astype(np.float32)).at[0].set(0.0)

    def ref_g(t):
        return t[sp.pc1_corr_indices + 1]

    from hplflownet_tpu.ops.segment import make_reduce_plan
    plan = make_reduce_plan(sp.pc1_corr_indices, cap)

    def ours_g(t):
        return gather_rows(t, sp.pc1_corr_indices, plan)

    np.testing.assert_allclose(np.asarray(ours_g(tbl)),
                               np.asarray(ref_g(tbl)), atol=0)
    gr = jax.grad(lambda t: jnp.sum(jnp.sin(ref_g(t))))(tbl)
    go = jax.grad(lambda t: jnp.sum(jnp.sin(ours_g(t))))(tbl)
    np.testing.assert_allclose(np.asarray(go)[1:], np.asarray(gr)[1:],
                               atol=2e-4)


def test_corr_self_forward_and_grads():
    """corr_self fwd + negation-permuted adjoint vs plain AD (round-2
    advisor: the corr_self adjoint had no unit test, and the default
    corr_tap_negation=() only crashed once a gradient was taken)."""
    from hplflownet_tpu.ops.corr import corr_self

    sp, rng = make_scale(seed=9, n=64, capacity=320)
    cap = sp.pc1_blur_neighbors.shape[1]
    c, w = 6, 5
    pad1 = jnp.asarray(rng.randn(cap + 1, c).astype(np.float32))
    pad1 = pad1.at[0].set(0.0)
    k_self = jnp.asarray(rng.randn(15, c, w).astype(np.float32))
    idx = sp.pc1_corr_indices                      # (Cc, H1)

    def ref(p, k):
        return jnp.einsum("khc,kcw->hw", p[idx + 1], k)

    def ours(p, k):
        return corr_self(NEG15, p, idx, k, jnp.zeros(k.shape[-1]))

    np.testing.assert_allclose(np.asarray(ours(pad1, k_self)),
                               np.asarray(ref(pad1, k_self)), atol=1e-4)
    g_ref = jax.grad(lambda p, k: jnp.sum(jnp.tanh(ref(p, k))),
                     argnums=(0, 1))(pad1, k_self)
    g_our = jax.grad(lambda p, k: jnp.sum(jnp.tanh(ours(p, k))),
                     argnums=(0, 1))(pad1, k_self)
    np.testing.assert_allclose(np.asarray(g_our[0])[1:],
                               np.asarray(g_ref[0])[1:], atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_our[1]), np.asarray(g_ref[1]),
                               atol=1e-4)


def test_corr_module_rejects_missing_tap_negation():
    """The () default must fail fast at call time, not deep inside the
    first backward pass."""
    import pytest
    sp, rng = make_scale(seed=3, n=48, capacity=256)
    cap = sp.pc1_blur_neighbors.shape[1]
    f1 = jnp.asarray(rng.randn(cap, 4).astype(np.float32))
    f2 = jnp.asarray(rng.randn(cap, 4).astype(np.float32))
    mod = BilateralCorrelation(corr_widths=(5,), widths=(6,), corr_size=15,
                               filter_size=15)  # corr_tap_negation left ()
    with pytest.raises(AssertionError, match="corr_tap_negation"):
        mod.init(jax.random.PRNGKey(0), f1, f2, None, None, None,
                 sp.pc1_corr_indices, sp.pc2_corr_uniq,
                 sp.pc2_corr_inverse, sp.pc2_corr_uniq_inv)


def test_bilateral_conv_module_matches_oracle():
    sp, rng = make_scale(seed=4)
    n = sp.pc1_barycentric.shape[0]
    cap = sp.pc1_blur_neighbors.shape[1]
    feats = rng.randn(n, 10).astype(np.float32)

    mod = BilateralConv(widths=(12, 9), filter_size=15, do_splat=True,
                        do_slice=True, tap_negation=NEG15, last_relu=False)
    kw = dict(in_barycentric=sp.pc1_barycentric,
              splat_plan=sp.pc1_splat_plan,
              blur_neighbors=sp.pc1_blur_neighbors,
              out_barycentric=sp.pc1_barycentric,
              out_lattice_offset=sp.pc1_lattice_offset,
              out_splat_plan=sp.pc1_splat_plan)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(feats), **kw)
    got = mod.apply(params, jnp.asarray(feats), **kw)

    p = params["params"]
    splatted = oracle.splat_np(feats, np.asarray(sp.pc1_barycentric),
                               np.asarray(sp.pc1_lattice_offset), cap)
    x = oracle.blur_np(splatted, np.asarray(sp.pc1_blur_neighbors).T,
                       np.asarray(p["conv0_kernel"]), np.asarray(p["conv0_bias"]))
    x = oracle.leaky(x)
    x = x @ np.asarray(p["conv1_kernel"]) + np.asarray(p["conv1_bias"])
    want = oracle.slice_np(x, np.asarray(sp.pc1_barycentric),
                           np.asarray(sp.pc1_lattice_offset))
    want = want + np.asarray(p["slice_bias"])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3)


def test_bilateral_correlation_matches_oracle():
    sp, rng = make_scale(seed=5, n=64, capacity=320)
    cap = sp.pc1_blur_neighbors.shape[1]
    c = 6
    prev_dim = 3
    n_in = sp.pc1_barycentric.shape[0]
    feat1 = rng.randn(cap, c).astype(np.float32)
    feat2 = rng.randn(cap, c).astype(np.float32)
    prev = rng.randn(n_in, prev_dim).astype(np.float32)

    mod = BilateralCorrelation(corr_widths=(5, 4), widths=(7, 6),
                               corr_size=15, filter_size=15,
                               corr_tap_negation=NEG15,
                               prev_corr_dim=prev_dim, last_relu=False)
    args = dict(
        prev_corr_feat=jnp.asarray(prev),
        barycentric1=sp.pc1_barycentric,
        splat_plan1=sp.pc1_splat_plan,
        pc1_corr_indices=sp.pc1_corr_indices,
        pc2_corr_uniq=sp.pc2_corr_uniq,
        pc2_corr_inverse=sp.pc2_corr_inverse,
        pc2_corr_uniq_inv=sp.pc2_corr_uniq_inv,
    )
    params = mod.init(jax.random.PRNGKey(1), jnp.asarray(feat1),
                      jnp.asarray(feat2), **args)
    got = mod.apply(params, jnp.asarray(feat1), jnp.asarray(feat2), **args)

    p = params["params"]
    prev_pad = oracle.splat_np(prev, np.asarray(sp.pc1_barycentric),
                               np.asarray(sp.pc1_lattice_offset), cap)
    want = oracle.corr_np(
        feat1, feat2, prev_pad,
        np.asarray(sp.pc1_corr_indices).T,
        np.asarray(sp.pc2_corr_indices_full()).transpose(0, 2, 1),
        np.asarray(p["corr0_kernel"]), np.asarray(p["corr0_bias"]),
        [(np.asarray(p["corr1_kernel"]), np.asarray(p["corr1_bias"]))],
        np.asarray(p["blur0_kernel"]), np.asarray(p["blur0_bias"]),
        [(np.asarray(p["blur1_kernel"]), np.asarray(p["blur1_bias"]))],
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3)


def test_ops_differentiable():
    sp, rng = make_scale(seed=6, n=48, capacity=256)
    n = sp.pc1_barycentric.shape[0]
    feats = jnp.asarray(rng.randn(n, 8).astype(np.float32))
    mod = BilateralConv(widths=(8,), filter_size=15, do_splat=True,
                        do_slice=True, tap_negation=NEG15, last_relu=False)
    kw = dict(in_barycentric=sp.pc1_barycentric,
              splat_plan=sp.pc1_splat_plan,
              blur_neighbors=sp.pc1_blur_neighbors,
              out_barycentric=sp.pc1_barycentric,
              out_lattice_offset=sp.pc1_lattice_offset,
              out_splat_plan=sp.pc1_splat_plan)
    params = mod.init(jax.random.PRNGKey(2), feats, **kw)

    def loss(p, f):
        return jnp.sum(mod.apply(p, f, **kw) ** 2)

    g_params, g_feats = jax.grad(loss, argnums=(0, 1))(params, feats)
    flat = jax.tree_util.tree_leaves(g_params)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    assert np.isfinite(np.asarray(g_feats)).all()
    assert float(jnp.abs(g_feats).sum()) > 0


def test_slice_overflow_vertices_contribute_zero():
    """A valid point whose vertex overflowed capacity (offset -1, nonzero
    barycentric) must not alias onto row 0 of the blurred table (a real
    vertex).  Reference has no overflow concept (bilateralNN.py:223-238);
    our capacity padding introduces it, so slice must mask it out."""
    cap, c = 16, 5
    rng = np.random.RandomState(11)
    blurred = jnp.asarray(rng.randn(cap, c).astype(np.float32))
    # point 0: fully valid; point 1: one overflowed vertex; point 2: all
    # overflowed (pathological); all with NONZERO barycentric weights
    offsets = jnp.asarray([[0, 1, 2, 3], [4, -1, 5, 6], [-1, -1, -1, -1]],
                          dtype=jnp.int32)
    bary = jnp.asarray(rng.rand(3, 4).astype(np.float32)) + 0.1

    out = np.asarray(slice_to_points(blurred, bary, offsets, None))
    b = np.asarray(blurred)
    w = np.asarray(bary)
    want0 = w[0] @ b[[0, 1, 2, 3]]
    want1 = w[1, 0] * b[4] + w[1, 2] * b[5] + w[1, 3] * b[6]  # tap 1 dropped
    np.testing.assert_allclose(out[0], want0, rtol=1e-5)
    np.testing.assert_allclose(out[1], want1, rtol=1e-5)
    np.testing.assert_allclose(out[2], 0.0, atol=0.0)  # no row-0 pollution


def test_model_forward_finite_under_capacity_overflow():
    """Undersized capacities => builder drops vertices (offset -1 with real
    barycentric weight); the full shallow forward must stay finite and the
    overflow must actually occur for the test to mean anything."""
    from hplflownet_tpu.models import HPLFlowNetShallow
    from hplflownet_tpu.pipeline import make_lattice_spec
    from hplflownet_tpu.lattice import build_pyramid

    sfm5 = [[1.0, 1, 1, 1], [0.5, 1, 1, 1], [0.25, 1, 1, 1],
            [0.125, 1, 1, 1], [0.0625, 1, 1, 1]]
    rng = np.random.RandomState(5)
    n = 128
    pc1 = jnp.asarray((rng.randn(n, 3) * 4.0).astype(np.float32))
    pc2 = jnp.asarray((rng.randn(n, 3) * 4.0).astype(np.float32))

    # deliberately too small at the finest scale
    spec = make_lattice_spec(sfm5, capacities=[48, 160, 128, 96, 64])
    scales = build_pyramid(spec, pc1, pc2)
    assert int(np.asarray(scales[0].pc1_overflow)) > 0

    model = HPLFlowNetShallow(scales_filter_map=sfm5)
    params = model.init(jax.random.PRNGKey(0), pc1, pc2, scales)
    out = np.asarray(model.apply(params, pc1, pc2, scales))
    assert out.shape == (n, 3)
    assert np.isfinite(out).all()


def test_reduce_plan_long_runs_span_many_blocks():
    """Combine correctness when single targets own runs spanning 3+ 128-entry
    blocks (heavy id duplication) plus empty targets and sentinels.

    Locks the prefix-difference assembly (segment._combine): a run's
    beyond-first-block share is csum0[b_hi+1] - csum0[b_lo+1], exact in
    f64 terms up to prefix cancellation, so compare against a numpy f64
    segment sum at a tolerance scaled to the prefix magnitude."""
    from hplflownet_tpu.ops.segment import (apply_reduce_plan,
                                            make_reduce_plan,
                                            weighted_reduce)

    rng = np.random.RandomState(11)
    t = 37
    # runs of wildly mixed lengths: several span 3-9 blocks, many are
    # empty, and ~5% of entries are sentinel (-1)
    lens = rng.choice([0, 0, 1, 2, 7, 130, 400, 1200], size=t,
                      p=[.25, .15, .2, .15, .1, .06, .05, .04])
    ids = np.repeat(np.arange(t, dtype=np.int32), lens)
    rng.shuffle(ids)
    ids[rng.rand(ids.shape[0]) < 0.05] = -1
    m = ids.shape[0]
    vals = rng.randn(m, 5).astype(np.float32)

    plan = make_reduce_plan(jnp.asarray(ids), t)
    got = np.asarray(apply_reduce_plan(plan, jnp.asarray(vals)))

    want = np.zeros((t, 5), np.float64)
    np.add.at(want, ids[ids >= 0], vals[ids >= 0].astype(np.float64))
    scale = np.abs(vals).sum(0).max() + 1.0   # prefix-cancellation bound
    np.testing.assert_allclose(got, want, atol=1e-5 * scale)
    assert np.all(got[lens == 0] == 0.0)

    # the weighted (splat-pattern) path over the same plan shape: ids as
    # (n, r) with r weight lanes, f32 stream (XLA partial path on CPU)
    r = 4
    n = m // r
    ids_nr = ids[:n * r].reshape(n, r)
    plan_w = make_reduce_plan(jnp.asarray(ids_nr), t)
    rows = rng.randn(n, 5).astype(np.float32)
    w = rng.rand(n, r).astype(np.float32)
    got_w = np.asarray(weighted_reduce(True, plan_w, jnp.asarray(rows),
                                       jnp.asarray(w)))
    want_w = np.zeros((t, 6), np.float64)
    for k in range(r):
        ok = ids_nr[:, k] >= 0
        np.add.at(want_w[:, :5], ids_nr[ok, k],
                  w[ok, k, None].astype(np.float64) * rows[ok])
        np.add.at(want_w[:, 5], ids_nr[ok, k], w[ok, k].astype(np.float64))
    np.testing.assert_allclose(got_w, want_w, atol=1e-5 * scale)
