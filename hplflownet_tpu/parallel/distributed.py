"""Multi-host (multi-process) initialization and mesh construction.

The reference is strictly single-process/single-GPU — its only multi-device
construct is an inert ``torch.nn.DataParallel`` (/root/reference/main.py:104,
README.md:57).  This module supplies the TPU-native distribution layer the
reference never had:

* :func:`initialize` wraps ``jax.distributed.initialize`` so a v5e pod slice
  (or any multi-host topology) can run one process per host; XLA then sees
  the global device set and GSPMD emits collectives over ICI within a slice
  and DCN across slices automatically.
* :func:`global_mesh` builds the standard ``(data, lattice)`` mesh over ALL
  global devices, keeping each host's local devices contiguous on the
  ``data`` axis so per-host input batches shard locally (no cross-host
  scatter of input data).
* :func:`process_local_batch_slice` maps the global batch index range owned
  by this process — the host-side data loader feeds only that slice.

Single-process use (tests, the 1-chip tunnel, CPU meshes) never needs to
call :func:`initialize`; every helper degrades to the local device set.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["initialize", "global_mesh", "process_local_batch_slice"]


def _distributed_client_active() -> bool:
    """Whether jax.distributed.initialize has already run, WITHOUT touching
    any backend (jax.process_count() would instantiate the local XLA client,
    after which distributed init is illegal — jax requires it to be the
    first jax call)."""
    try:
        from jax._src import distributed as _dist
        return _dist.global_state.client is not None
    except Exception:  # pragma: no cover - private API moved
        return False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Start JAX's multi-process runtime (one call per host, before any
    other jax use).

    With no arguments, TPU pod environments auto-discover the coordinator
    from the TPU metadata (the call degrades to a no-op single-process run
    when no cluster environment is detected).  Explicit coordinator
    arguments support CPU/GPU clusters — errors are NOT swallowed in that
    case: a host that cannot join the job must fail loudly rather than
    silently train a private single-process copy.
    """
    if _distributed_client_active():
        return  # already initialized
    if coordinator_address is not None:
        # explicit multi-process request: let failures propagate
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return
    # auto-discovery path: only attempt when a known cluster environment is
    # present (TPU pod metadata / SLURM / user-exported coordinator); a
    # plain single-host run must not pay a discovery timeout or error
    import os
    multi_worker_tpu = "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
    cluster_env = multi_worker_tpu or any(os.environ.get(k) for k in (
        "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS",
        "SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE"))
    if not cluster_env:
        return
    jax.distributed.initialize()


def global_mesh(data_axis: int | None = None,
                lattice_axis: int = 1) -> Mesh:
    """(data, lattice) mesh over all global devices.

    Defaults to pure data parallelism over every chip in the job.  Devices
    are laid out so that each process's local chips are adjacent on the
    ``data`` axis: per-host batch shards stay on-host, and the gradient
    psum rides ICI inside a slice before crossing DCN once per host.
    """
    devs = jax.devices()
    n = len(devs)
    if data_axis is None:
        assert n % lattice_axis == 0, (n, lattice_axis)
        data_axis = n // lattice_axis
    assert data_axis * lattice_axis == n, (data_axis, lattice_axis, n)
    # jax.devices() orders by (process, local id): a row-major reshape keeps
    # local devices contiguous along the flattened (data, lattice) order
    arr = np.asarray(devs).reshape(data_axis, lattice_axis)
    return Mesh(arr, axis_names=("data", "lattice"))


def process_local_batch_slice(global_batch: int) -> slice:
    """The [start, stop) range of the global batch this process should load.

    With B global samples over P processes each hosting L of the mesh's
    data-axis entries, process p owns samples [p*B/P, (p+1)*B/P).
    """
    p = jax.process_index()
    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    per = global_batch // n
    return slice(p * per, (p + 1) * per)
