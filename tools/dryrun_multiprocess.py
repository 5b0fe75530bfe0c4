#!/usr/bin/env python3
"""2-process x 4-virtual-device DP dry run through parallel.distributed.

Validates the multi-HOST layer beyond single-process unit scope: two OS
processes join one JAX job via ``parallel.distributed.initialize`` (explicit
coordinator, gloo CPU collectives), build the global (data, lattice) mesh,
each loads only its ``process_local_batch_slice`` of the global batch, and
one DP training step runs with the gradient psum crossing the process
boundary.  Both workers must report the identical finite loss.

The reference has no distributed layer at all (SURVEY.md section 2:
torch.nn.DataParallel wrapped but inert, /root/reference/main.py:104); this
exercises the path a real v5e pod slice (one process per host) would take.

Usage:
    python tools/dryrun_multiprocess.py            # parent: spawns 2 workers
    (workers are spawned internally with --worker I --port P)

Writes MULTIPROC.json at the repo root on success.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import socket
import subprocess
import sys
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
N_PROCS = 2
DEVS_PER_PROC = 4
GLOBAL_BATCH = 4

SFM5 = [[1.0, 1, 1, 1], [0.5, 1, 1, 1], [0.25, 1, 1, 1],
        [0.125, 1, 1, 1], [0.0625, 1, 1, 1]]
CAPS = [128, 128, 128, 96, 64]
N_POINTS = 32


def worker(pid: int, port: int) -> None:
    # virtual CPU devices + the raised rendezvous timeouts a 1-core host
    # needs (devices' programs run serialized, so collective participants
    # can arrive far apart)
    flags = os.environ.get("XLA_FLAGS", "")
    flags += f" --xla_force_host_platform_device_count={DEVS_PER_PROC}"
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=240"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
              " --xla_cpu_collective_timeout_seconds=1200")
    os.environ["XLA_FLAGS"] = flags.strip()

    import numpy as np
    import jax

    # the site config presets jax_platforms=axon,cpu: force CPU before any
    # backend exists so neither worker touches the 1-chip TPU tunnel
    jax.config.update("jax_platforms", "cpu")
    from hplflownet_tpu.parallel.distributed import (
        initialize, global_mesh, process_local_batch_slice)
    initialize(coordinator_address=f"127.0.0.1:{port}",
               num_processes=N_PROCS, process_id=pid)
    assert jax.process_count() == N_PROCS, jax.process_count()
    assert len(jax.devices()) == N_PROCS * DEVS_PER_PROC

    import jax.numpy as jnp
    from hplflownet_tpu.lattice import build_pyramid
    from hplflownet_tpu.models import HPLFlowNetShallow
    from hplflownet_tpu.pipeline import make_lattice_spec
    from hplflownet_tpu.parallel import make_dp_train_step, shard_batch

    mesh = global_mesh(data_axis=GLOBAL_BATCH,
                       lattice_axis=N_PROCS * DEVS_PER_PROC // GLOBAL_BATCH)
    spec = make_lattice_spec(SFM5, capacities=CAPS)
    model = HPLFlowNetShallow(scales_filter_map=SFM5)

    # identical global data on every process; each loads only its slice
    rng = np.random.RandomState(0)
    pc1 = rng.randn(GLOBAL_BATCH, N_POINTS, 3).astype(np.float32) * 2.0
    pc2 = pc1 + 0.05 * rng.randn(GLOBAL_BATCH, N_POINTS, 3).astype(np.float32)
    sl = process_local_batch_slice(GLOBAL_BATCH)
    local = {
        "pc1": pc1[sl], "pc2": pc2[sl], "sf": (pc2 - pc1)[sl],
        "valid1": np.ones((sl.stop - sl.start, N_POINTS), bool),
        "valid2": np.ones((sl.stop - sl.start, N_POINTS), bool),
    }

    a1, a2 = jnp.asarray(pc1[0]), jnp.asarray(pc2[0])
    scales = jax.jit(lambda a, b: build_pyramid(spec, a, b))(a1, a2)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), a1, a2, scales)

    init_state, dp_step = make_dp_train_step(model, spec, mesh,
                                             learning_rate=1e-3)
    state = init_state(params)
    state, loss = dp_step(state, shard_batch(local, mesh))
    # fully-replicated output: every process holds the complete value
    print(f"WORKER {pid} loss {float(loss):.10f} "
          f"procs {jax.process_count()} mesh {dict(mesh.shape)}", flush=True)


def main() -> int:
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]),
               int(sys.argv[sys.argv.index("--port") + 1]))
        return 0

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    t0 = time.time()
    env = dict(os.environ, PYTHONPATH=REPO)
    procs = [subprocess.Popen(
        [sys.executable, osp.abspath(__file__),
         "--worker", str(i), "--port", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for i in range(N_PROCS)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=3600)
        outs.append(out)
        if p.returncode != 0:
            print(out[-4000:])
            print(f"FAILED: worker exited {p.returncode}")
            return 1

    losses = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("WORKER"):
                toks = line.split()
                losses[int(toks[1])] = float(toks[3])
    assert sorted(losses) == list(range(N_PROCS)), outs
    vals = [losses[i] for i in range(N_PROCS)]
    assert all(v == vals[0] for v in vals), vals
    import math
    assert math.isfinite(vals[0]), vals

    result = {
        "ok": True,
        "n_processes": N_PROCS,
        "devices_per_process": DEVS_PER_PROC,
        "global_batch": GLOBAL_BATCH,
        "loss": vals[0],
        "elapsed_s": round(time.time() - t0, 1),
    }
    with open(osp.join(REPO, "MULTIPROC.json"), "w") as fd:
        json.dump(result, fd, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
