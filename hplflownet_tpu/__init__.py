"""hplflownet_tpu — a TPU-native scene-flow framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
HPLFlowNet (CVPR 2019, reference: laoreja/HPLFlowNet): permutohedral-lattice
scene flow estimation between two point clouds.

Key architectural departures from the reference (see SURVEY.md):

* The permutohedral lattice is built **on device** with static shapes
  (sort-based dedup + binary-search probes) instead of a host-side C hash
  table driven from Numba (reference: transforms/transforms.py:133-261,
  models/khash.h). The whole pipeline — lattice build, forward, loss — runs
  under one ``jax.jit``.
* Splat/blur/slice are expressed as segment-sum, gather + MXU matmul and
  gather + barycentric contraction; no chunking loops
  (reference: models/bilateralNN.py:199-221).
* batch_size > 1 is a plain leading vmap/pjit axis (the reference is limited
  to batch_size=1, README.md:57).
* Multi-chip scaling via ``jax.sharding.Mesh`` + data/lattice sharding.
"""

__version__ = "0.1.0"

from . import lattice, ops, models  # noqa: F401
