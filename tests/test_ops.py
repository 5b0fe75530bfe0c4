"""BCL / correlation op tests against loop oracles + properties."""

import numpy as np
import jax
import jax.numpy as jnp

from hplflownet_tpu.lattice import LatticeSpec, ScaleSpec, build_pyramid
from hplflownet_tpu.ops import splat, blur_matmul, slice_to_points
from hplflownet_tpu.ops.bcl import BilateralConv
from hplflownet_tpu.ops.corr import BilateralCorrelation
from tests.oracle import ops_oracle as oracle


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
                    sp.pc1_lattice_offset, cap, normalize=False)
    want_raw = oracle.splat_np(feats, np.asarray(sp.pc1_barycentric),
                               np.asarray(sp.pc1_lattice_offset), cap,
                               normalize=False)
    np.testing.assert_allclose(np.asarray(got_raw), want_raw, atol=1e-4)
    # sentinel row zero; total mass preserved (barycentric sums to 1)
    np.testing.assert_allclose(np.asarray(got_raw)[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_raw).sum(0), feats.sum(0),
                               rtol=1e-4)

    got = splat(jnp.asarray(feats), sp.pc1_barycentric,
                sp.pc1_lattice_offset, cap, normalize=True)
    want = oracle.splat_np(feats, np.asarray(sp.pc1_barycentric),
                           np.asarray(sp.pc1_lattice_offset), cap,
                           normalize=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_blur_matches_oracle_and_identity_filter():
    sp, rng = make_scale(seed=1)
    cap = sp.pc1_blur_neighbors.shape[1]
    c_in, c_out = 6, 5
    splatted = rng.randn(cap + 1, c_in).astype(np.float32)
    splatted[0] = 0.0
    kernel = rng.randn(15, c_in, c_out).astype(np.float32) * 0.2
    bias = rng.randn(c_out).astype(np.float32)

    got = blur_matmul(jnp.asarray(splatted), sp.pc1_blur_neighbors,
                      jnp.asarray(kernel), jnp.asarray(bias))
    # oracle expects vertex-major (H, F) neighbors
    want = oracle.blur_np(splatted, np.asarray(sp.pc1_blur_neighbors).T,
                          kernel, bias)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    # identity: center-tap-only square kernel reproduces the input
    # (on valid vertices; padded rows have no self-neighbor and yield zero)
    ident = np.zeros((15, c_in, c_in), dtype=np.float32)
    ident[0] = np.eye(c_in)
    got_id = np.asarray(blur_matmul(jnp.asarray(splatted), sp.pc1_blur_neighbors,
                                    jnp.asarray(ident), jnp.zeros(c_in)))
    valid = np.asarray(sp.pc1_blur_neighbors)[0] >= 0
    np.testing.assert_allclose(got_id[valid], splatted[1:][valid], atol=1e-5)
    np.testing.assert_allclose(got_id[~valid], 0.0, atol=1e-6)


def test_slice_matches_oracle():
    sp, rng = make_scale(seed=2)
    cap = sp.pc1_blur_neighbors.shape[1]
    blurred = rng.randn(cap, 7).astype(np.float32)
    got = slice_to_points(jnp.asarray(blurred), sp.pc1_barycentric,
                          sp.pc1_lattice_offset)
    want = oracle.slice_np(blurred, np.asarray(sp.pc1_barycentric),
                           np.asarray(sp.pc1_lattice_offset))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_splat_blur_slice_roundtrip_constant():
    """Splatting a constant field, identity blur, slicing back: constant."""
    sp, _ = make_scale(seed=3)
    n = sp.pc1_barycentric.shape[0]
    cap = sp.pc1_blur_neighbors.shape[1]
    feats = jnp.ones((n, 4))
    # normalized splat of a constant field gives ~1 at every hit vertex
    sp_pad = splat(feats, sp.pc1_barycentric, sp.pc1_lattice_offset, cap)
    sliced = slice_to_points(sp_pad[1:], sp.pc1_barycentric,
                             sp.pc1_lattice_offset)
    np.testing.assert_allclose(np.asarray(sliced), 1.0, atol=1e-3)


def test_bilateral_conv_module_matches_oracle():
    sp, rng = make_scale(seed=4)
    n = sp.pc1_barycentric.shape[0]
    cap = sp.pc1_blur_neighbors.shape[1]
    feats = rng.randn(n, 10).astype(np.float32)

    mod = BilateralConv(widths=(12, 9), filter_size=15, do_splat=True,
                        do_slice=True, last_relu=False)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                      in_barycentric=sp.pc1_barycentric,
                      in_lattice_offset=sp.pc1_lattice_offset,
                      blur_neighbors=sp.pc1_blur_neighbors,
                      out_barycentric=sp.pc1_barycentric,
                      out_lattice_offset=sp.pc1_lattice_offset)
    got = mod.apply(params, jnp.asarray(feats),
                    in_barycentric=sp.pc1_barycentric,
                    in_lattice_offset=sp.pc1_lattice_offset,
                    blur_neighbors=sp.pc1_blur_neighbors,
                    out_barycentric=sp.pc1_barycentric,
                    out_lattice_offset=sp.pc1_lattice_offset)

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
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


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
                               prev_corr_dim=prev_dim, last_relu=False)
    args = dict(
        prev_corr_feat=jnp.asarray(prev),
        barycentric1=sp.pc1_barycentric,
        lattice_offset1=sp.pc1_lattice_offset,
        pc1_corr_indices=sp.pc1_corr_indices,
        pc2_corr_indices=sp.pc2_corr_indices,
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
        np.asarray(sp.pc2_corr_indices).transpose(0, 2, 1),
        np.asarray(p["corr0_kernel"]), np.asarray(p["corr0_bias"]),
        [(np.asarray(p["corr1_kernel"]), np.asarray(p["corr1_bias"]))],
        np.asarray(p["blur0_kernel"]), np.asarray(p["blur0_bias"]),
        [(np.asarray(p["blur1_kernel"]), np.asarray(p["blur1_bias"]))],
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_ops_differentiable():
    sp, rng = make_scale(seed=6, n=48, capacity=256)
    n = sp.pc1_barycentric.shape[0]
    feats = jnp.asarray(rng.randn(n, 8).astype(np.float32))
    mod = BilateralConv(widths=(8,), filter_size=15, do_splat=True,
                        do_slice=True, last_relu=False)
    kw = dict(in_barycentric=sp.pc1_barycentric,
              in_lattice_offset=sp.pc1_lattice_offset,
              blur_neighbors=sp.pc1_blur_neighbors,
              out_barycentric=sp.pc1_barycentric,
              out_lattice_offset=sp.pc1_lattice_offset)
    params = mod.init(jax.random.PRNGKey(2), feats, **kw)

    def loss(p, f):
        return jnp.sum(mod.apply(p, f, **kw) ** 2)

    g_params, g_feats = jax.grad(loss, argnums=(0, 1))(params, feats)
    flat = jax.tree_util.tree_leaves(g_params)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    assert np.isfinite(np.asarray(g_feats)).all()
    assert float(jnp.abs(g_feats).sum()) > 0
