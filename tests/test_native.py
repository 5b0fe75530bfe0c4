"""Native C++ host builder vs the on-device (jax) builder and the oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

pytest.importorskip("ctypes")

from hplflownet_tpu.native.bindings import native_available
from hplflownet_tpu.lattice import neighborhood_offsets
from hplflownet_tpu.lattice.build import build_cloud_lattice, _unpack_keys
from hplflownet_tpu.lattice.geometry import PermutohedralGeometry
from tests.oracle import lattice_oracle as oracle

needs_native = pytest.mark.skipif(not native_available(),
                                  reason="native builder not built")


def random_cloud(n, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randn(n, 3) * 3.0).astype(np.float32)


@needs_native
def test_native_matches_jax_builder():
    from hplflownet_tpu.native.bindings import HostLatticeBuilder

    pts = random_cloud(256, seed=1)
    cap = 1500
    keys, _, _ = oracle.keys_and_barycentric_np(pts, 1.0)

    hb = HostLatticeBuilder(d=3)
    unique, ids, total = hb.build_cloud(keys, cap)
    geom = PermutohedralGeometry(3)
    cl = build_cloud_lattice(geom, jnp.asarray(pts), jnp.ones(256, bool),
                             1.0, cap)

    assert total == int(cl.num_valid)
    # both assign ids in sorted-key order -> identical dense ids
    np.testing.assert_array_equal(ids, np.asarray(cl.lattice_offset))

    # unique key sets agree
    jk = np.asarray(_unpack_keys(cl.vkeys, 3, 10))[:total]
    from hplflownet_tpu.native.bindings import pack_keys_i64
    np.testing.assert_array_equal(pack_keys_i64(jk, 3), unique[:total])

    # neighbor tables agree
    offs = neighborhood_offsets(1, 3)
    nb = hb.neighbor_table(unique, total, offs)
    # jax table: need to rebuild via the pyramid; use _neighbor_table
    from hplflownet_tpu.lattice.build import _neighbor_table
    jnb = np.asarray(_neighbor_table(cl, offs, 3)[0])
    np.testing.assert_array_equal(nb, jnb)


@needs_native
def test_native_corr_tables_match_jax():
    from hplflownet_tpu.native.bindings import HostLatticeBuilder
    from hplflownet_tpu.lattice.build import _corr_tables

    pts1, pts2 = random_cloud(128, 2), random_cloud(128, 3)
    cap = 800
    geom = PermutohedralGeometry(3)
    cl1 = build_cloud_lattice(geom, jnp.asarray(pts1), jnp.ones(128, bool),
                              1.0, cap)
    cl2 = build_cloud_lattice(geom, jnp.asarray(pts2), jnp.ones(128, bool),
                              1.0, cap)

    k1, _, _ = oracle.keys_and_barycentric_np(pts1, 1.0)
    k2, _, _ = oracle.keys_and_barycentric_np(pts2, 1.0)
    hb = HostLatticeBuilder(d=3)
    u1, _, n1 = hb.build_cloud(k1, cap)
    u2, _, n2 = hb.build_cloud(k2, cap)

    offs = neighborhood_offsets(1, 3)
    pc1c, pc2c = hb.corr_tables(u1, n1, u2, n2, offs, offs)
    j1, j2u, j2inv, _, _ = _corr_tables(cl1, cl2, offs, offs, 3)
    j2 = np.asarray(j2u)[np.asarray(j2inv)]       # dense (F, Cc, H)
    np.testing.assert_array_equal(pc1c, np.asarray(j1))
    np.testing.assert_array_equal(pc2c, j2)


@needs_native
def test_native_overflow_semantics():
    from hplflownet_tpu.native.bindings import HostLatticeBuilder

    pts = random_cloud(128, seed=4)
    keys, _, _ = oracle.keys_and_barycentric_np(pts, 1.0)
    hb = HostLatticeBuilder(d=3)
    unique, ids, total = hb.build_cloud(keys, 32)
    assert total > 32          # overflowed
    assert ids.max() < 32
    assert (ids == -1).any()   # dropped vertices yield -1
