"""Multi-chip scaling: device meshes, data-parallel steps, lattice sharding.

The reference has no distribution layer at all (inert DataParallel at
batch_size=1, main.py:104); here scaling is native:

* **data parallel** — batch axis sharded over the ``data`` mesh axis via
  pjit shardings; gradient reduction is an XLA collective over ICI.
* **lattice parallel** (the SP/CP analog for point clouds) — the vertex axis
  of the lattice is sharded over the ``lattice`` mesh axis with GSPMD
  sharding constraints inside the BCL ops, for the 32k-100k point regime.
"""

from .mesh import make_mesh  # noqa: F401
from .distributed import (initialize, global_mesh,  # noqa: F401
                          process_local_batch_slice)
from .data_parallel import make_dp_train_step, shard_batch  # noqa: F401
from .lattice_parallel import lattice_sharded_forward  # noqa: F401
