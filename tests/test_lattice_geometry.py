"""Parity + property tests for the lattice geometry core."""

import numpy as np
import pytest

import jax.numpy as jnp

from hplflownet_tpu.lattice import (
    PermutohedralGeometry,
    elevation_matrix,
    neighborhood_offsets,
    filter_size,
)
from tests.oracle import lattice_oracle as oracle


def random_cloud(n, seed=0, scale=10.0):
    rng = np.random.RandomState(seed)
    return (rng.randn(n, 3) * scale).astype(np.float32)


def test_elevation_matrix_columns_orthogonal_zero_sum():
    E = elevation_matrix(3)
    assert E.shape == (4, 3)
    # columns span the sum==0 hyperplane
    np.testing.assert_allclose(E.sum(axis=0), 0.0, atol=1e-6)
    np.testing.assert_allclose(E, oracle.elevation_matrix_np(3), atol=0)


@pytest.mark.parametrize("radius,d", [(1, 3), (2, 3), (1, 2)])
def test_stencil_matches_recursive_walk(radius, d):
    ours = neighborhood_offsets(radius, d)
    ref = oracle.stencil_np(radius, d)
    assert ours.shape[0] == filter_size(radius, d)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("scale", [3.0, 1.0, 0.0625])
def test_keys_and_barycentric_parity(scale):
    pts = random_cloud(512, seed=3)
    geom = PermutohedralGeometry(3)
    got = geom.keys_and_barycentric(jnp.asarray(pts), scale)
    want_keys, want_bary, want_el = oracle.keys_and_barycentric_np(pts, scale)

    np.testing.assert_array_equal(np.asarray(got.keys), want_keys)
    np.testing.assert_allclose(np.asarray(got.barycentric), want_bary, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.el_minus_gr), want_el, atol=1e-4)


def test_barycentric_properties():
    pts = random_cloud(1024, seed=7)
    geom = PermutohedralGeometry(3)
    got = geom.keys_and_barycentric(jnp.asarray(pts), 1.0)
    bary = np.asarray(got.barycentric)
    keys = np.asarray(got.keys)

    # weights are a convex combination
    np.testing.assert_allclose(bary.sum(axis=1), 1.0, atol=1e-4)
    assert (bary > -1e-4).all()
    # every key lies on the lattice hyperplane and has the right remainder
    np.testing.assert_array_equal(keys.sum(axis=-1), 0)
    rem = np.sort(np.asarray(keys) % 4, axis=-1)
    # vertex with remainder r has all coords == r mod d1
    for r in range(4):
        col = keys[:, r, :] % 4
        assert (col == col[:, :1]).all()


def test_reconstruction_roundtrip():
    """Barycentric combo of simplex vertices reproduces the elevated point."""
    pts = random_cloud(256, seed=11)
    geom = PermutohedralGeometry(3)
    got = geom.keys_and_barycentric(jnp.asarray(pts), 1.0)
    elevated = np.asarray(geom.elevate(jnp.asarray(pts), 1.0))
    recon = np.einsum("nr,nrc->nc", np.asarray(got.barycentric),
                      np.asarray(got.keys).astype(np.float64))
    np.testing.assert_allclose(recon, elevated, atol=5e-3)
