"""On-device permutohedral lattice construction (static shapes, jittable)."""

from .geometry import (  # noqa: F401
    PermutohedralGeometry,
    elevation_matrix,
    canonical_matrix,
    expected_std,
)
from .offsets import neighborhood_offsets, filter_size  # noqa: F401
from .build import (  # noqa: F401
    CloudLattice,
    ScalePair,
    LatticeSpec,
    ScaleSpec,
    build_cloud_lattice,
    build_pyramid,
    default_capacities,
    probe_sharding,
)
