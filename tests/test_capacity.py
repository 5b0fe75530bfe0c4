"""Measured default capacities (lattice/capacity.py): must model the
NON-monotone vertex-count shape (scale 3->2 grows the table) and cover
real builder counts with margin."""

import numpy as np
import jax
import jax.numpy as jnp

from hplflownet_tpu.lattice import build_pyramid, default_capacities
from hplflownet_tpu.lattice.capacity import (count_vertices_np,
                                             synthetic_frustum_clouds)
from hplflownet_tpu.pipeline import make_lattice_spec

SFM7 = [[3.0, 1, -1, -1], [2.0, 1, -1, -1], [1.0, 1, 1, 1],
        [0.5, 1, 1, 1], [0.25, 1, 1, 1], [0.125, 1, 1, 1],
        [0.0625, 1, 1, 1]]

# worst-of-8-seeds counts on the bench distribution at 8192 pts (bench.py;
# re-measure with `python bench.py --measure`)
BENCH_COUNTS_8192 = [22797, 28410, 11485, 3182, 739, 213, 87]


def test_default_capacities_cover_bench_counts():
    caps = default_capacities(8192, SFM7)
    assert len(caps) == 7
    for cap, count in zip(caps, BENCH_COUNTS_8192):
        assert cap >= count * 1.05, (cap, count)
    # non-monotone: the scale-3 -> scale-2 step (ratio 1.5) GROWS the table
    assert caps[1] > caps[0], caps
    # and not absurdly padded (<= 2x the measured counts at the big scales)
    for cap, count in zip(caps[:4], BENCH_COUNTS_8192[:4]):
        assert cap <= 2 * count, (cap, count)


def test_default_capacities_sparse_cloud_growth():
    """At 64 points the ratio-1.5 growth is ~2.1x (252 -> 521 measured);
    a decay heuristic would guarantee scale-1 overflow."""
    caps = default_capacities(64, SFM7[:5])
    assert caps[1] >= 512, caps


def test_count_vertices_np_matches_builder():
    """The numpy count chain must track the jitted device builder exactly
    (guards drift between capacity.py's geometry and lattice/build.py)."""
    pc1, pc2 = synthetic_frustum_clouds(1, 192, seed=3)
    scales_f = [row[0] for row in SFM7]
    want1 = count_vertices_np(pc1[0], scales_f)
    want2 = count_vertices_np(pc2[0], scales_f)

    spec = make_lattice_spec(SFM7, capacities=[2048] * 7)
    scales = jax.jit(lambda a, b: build_pyramid(spec, a, b))(
        jnp.asarray(pc1[0]), jnp.asarray(pc2[0]))
    got1 = [int(sp.pc1_num_valid) for sp in scales]
    got2 = [int(sp.pc2_num_valid) for sp in scales]
    assert got1 == want1, (got1, want1)
    assert got2 == want2, (got2, want2)
    assert all(int(sp.pc1_overflow) == 0 and int(sp.pc2_overflow) == 0
               for sp in scales)


def test_no_overflow_under_default_capacities():
    """A full pyramid built with the measured defaults must not overflow on
    the distribution they were measured on (different seed than measured)."""
    n = 512
    caps = default_capacities(n, SFM7)
    spec = make_lattice_spec(SFM7, capacities=caps)
    pc1, pc2 = synthetic_frustum_clouds(1, n, seed=17)
    scales = jax.jit(lambda a, b: build_pyramid(spec, a, b))(
        jnp.asarray(pc1[0]), jnp.asarray(pc2[0]))
    assert all(int(sp.pc1_overflow) == 0 and int(sp.pc2_overflow) == 0
               for sp in scales)
