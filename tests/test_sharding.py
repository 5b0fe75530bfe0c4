"""Multi-device tests on the 8-virtual-CPU-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hplflownet_tpu.models import HPLFlowNetShallow
from hplflownet_tpu.pipeline import make_lattice_spec, flow_forward
from hplflownet_tpu.lattice import build_pyramid
from hplflownet_tpu.parallel import (
    make_mesh, make_dp_train_step, shard_batch, lattice_sharded_forward)
from hplflownet_tpu.train.step import make_train_step

SFM5 = [[1.0, 1, 1, 1], [0.5, 1, 1, 1], [0.25, 1, 1, 1],
        [0.125, 1, 1, 1], [0.0625, 1, 1, 1]]


def setup(b=8, n=48, seed=0):
    rng = np.random.RandomState(seed)
    pc1 = rng.randn(b, n, 3).astype(np.float32) * 2.0
    pc2 = pc1 + 0.05 * rng.randn(b, n, 3).astype(np.float32)
    batch = {
        "pc1": pc1, "pc2": pc2, "sf": pc2 - pc1,
        "valid1": np.ones((b, n), bool), "valid2": np.ones((b, n), bool),
    }
    spec = make_lattice_spec(SFM5, capacities=[256, 256, 256, 128, 128])
    model = HPLFlowNetShallow(scales_filter_map=SFM5)
    scales = build_pyramid(spec, jnp.asarray(pc1[0]), jnp.asarray(pc2[0]))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(pc1[0]),
                        jnp.asarray(pc2[0]), scales)
    return model, spec, params, batch


def test_eight_devices_available():
    assert jax.device_count() >= 8


@pytest.mark.slow
def test_dp_step_matches_single_device():
    model, spec, params, batch = setup()
    mesh = make_mesh(axis_names=("data",))

    params_copy = jax.tree_util.tree_map(np.asarray, params)

    init_dp, dp_step = make_dp_train_step(model, spec, mesh,
                                          learning_rate=1e-3)
    state_dp = init_dp(params)
    sharded = shard_batch(batch, mesh)
    state_dp, loss_dp = dp_step(state_dp, sharded)

    init_1, step_1 = make_train_step(model, spec, learning_rate=1e-3)
    state_1 = init_1(jax.tree_util.tree_map(jnp.asarray, params_copy))
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    state_1, loss_1 = step_1(state_1, jbatch)

    np.testing.assert_allclose(float(loss_dp), float(loss_1), rtol=1e-5)
    # cross-device psum reduction order differs from the single-device sum;
    # Adam can amplify that noise up to ~2*lr on low-second-moment params
    for a, b in zip(jax.tree_util.tree_leaves(state_dp.params),
                    jax.tree_util.tree_leaves(state_1.params)):
        diff = np.abs(np.asarray(a) - np.asarray(b))
        assert diff.max() <= 2.5e-3, diff.max()
        assert (diff > 1e-4).mean() < 1e-3


def test_lattice_sharded_forward_matches_unsharded():
    model, spec, params, batch = setup(b=1, n=64, seed=3)
    pc1 = jnp.asarray(batch["pc1"][0])
    pc2 = jnp.asarray(batch["pc2"][0])

    mesh = make_mesh(axis_names=("lattice",))
    fwd = lattice_sharded_forward(model, spec, mesh)
    out_sharded = fwd(params, pc1, pc2)
    out_plain = flow_forward(model, params, spec, pc1, pc2)
    np.testing.assert_allclose(np.asarray(out_sharded),
                               np.asarray(out_plain), atol=1e-4)


@pytest.mark.slow
def test_two_axis_mesh_dp_plus_lattice_compiles():
    """(4 data x 2 lattice) mesh: DP step with vertex constraints compiles."""
    model, spec, params, batch = setup(b=4)
    mesh = make_mesh((4, 2), axis_names=("data", "lattice"))
    init_dp, dp_step = make_dp_train_step(model, spec, mesh,
                                          learning_rate=1e-3)
    state = init_dp(params)
    sharded = shard_batch(batch, mesh)
    state, loss = dp_step(state, sharded)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_lattice_sharding_partitions_compute():
    """Evidence that lattice sharding shards real WORK, not just storage:
    the compiled per-device SPMD module of the 8-way lattice-sharded forward
    must execute a fraction of the replicated forward's FLOPs.  Covers both
    mechanisms: tap-sharded pyramid probes (shard_map) and GSPMD-partitioned
    blur/corr matmuls (vertex constraints)."""
    model, spec, params, batch = setup(b=1, n=256, seed=5)
    pc1 = jnp.asarray(batch["pc1"][0])
    pc2 = jnp.asarray(batch["pc2"][0])

    mesh = make_mesh(axis_names=("lattice",))
    fwd = lattice_sharded_forward(model, spec, mesh)
    sharded_flops = fwd.lower(params, pc1, pc2).compile().cost_analysis()[
        "flops"]

    plain = jax.jit(lambda p, a, b: flow_forward(model, p, spec, a, b))
    plain_flops = plain.lower(params, pc1, pc2).compile().cost_analysis()[
        "flops"]

    # the model's dense matmuls partition 8-way, the probes ~8-way; head
    # MLPs and the replicated build sorts keep the ratio well above 1/8
    assert sharded_flops < 0.5 * plain_flops, (sharded_flops, plain_flops)

    # and it still computes the right thing
    out_sharded = np.asarray(fwd(params, pc1, pc2))
    out_plain = np.asarray(plain(params, pc1, pc2))
    np.testing.assert_allclose(out_sharded, out_plain, atol=1e-4)


def test_initialize_runs_before_any_backend_use():
    """jax.distributed.initialize must be the FIRST jax runtime touch: the
    guard in initialize() may not instantiate a backend (jax.process_count
    would), and explicit coordinator args must reach jax.distributed.

    Runs in a fresh subprocess so this test's own jax state can't mask the
    ordering bug (round-2 advisor finding: the old process_count() guard
    initialized the local backend, making distributed init impossible)."""
    import subprocess
    import sys
    script = r"""
import sys
sys.path.insert(0, "/root/repo")
import jax
from jax._src import xla_bridge
import hplflownet_tpu.parallel.distributed as dist

seen = {}
def fake_init(**kw):
    seen["kw"] = kw
    seen["backends_before"] = bool(xla_bridge._backends)
jax.distributed.initialize = fake_init

# 1. no coordinator + no cluster env: must not attempt distributed init
dist.initialize()
assert "kw" not in seen, "auto-discovery attempted outside a cluster env"

# 2. explicit coordinator: must call through BEFORE any backend exists
dist.initialize(coordinator_address="127.0.0.1:9999",
                num_processes=2, process_id=0)
assert seen["kw"]["num_processes"] == 2, seen
assert seen["backends_before"] is False, (
    "XLA backend was instantiated before jax.distributed.initialize")
print("OK")
"""
    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "OK" in out.stdout


def test_initialize_propagates_explicit_coordinator_errors():
    """A host that cannot join an explicitly requested multi-process job
    must fail loudly, not silently degrade to single-process (round-2
    advisor: the old blanket except swallowed the RuntimeError)."""
    import subprocess
    import sys
    script = r"""
import sys
sys.path.insert(0, "/root/repo")
import jax
import hplflownet_tpu.parallel.distributed as dist

def fake_init(**kw):
    raise RuntimeError("cannot reach coordinator")
jax.distributed.initialize = fake_init

try:
    dist.initialize(coordinator_address="127.0.0.1:9999",
                    num_processes=2, process_id=0)
except RuntimeError:
    print("RAISED")
"""
    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "RAISED" in out.stdout


@pytest.mark.slow
def test_driver_dryrun_multichip_under_deadline():
    """The driver's 8-device dryrun must finish inside its ~540 s window.

    Round 3 regressed this silently (eager setup + uncached GSPMD compile
    blew the budget; then the 1-core host tripped XLA's 40 s collective-
    rendezvous termination).  Fresh subprocess exactly like the driver runs
    it; the persistent compile cache keeps repeats fast."""
    import subprocess
    import sys
    script = r"""
import sys
sys.path.insert(0, "/root/repo")
from __graft_entry__ import dryrun_multichip
dryrun_multichip(8)
"""
    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=540)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "dryrun_multichip ok" in out.stdout, out.stdout[-2000:]


def test_distributed_helpers_single_process():
    """Multi-host helpers degrade cleanly to the single-process 8-CPU mesh."""
    from hplflownet_tpu.parallel import (
        initialize, global_mesh, process_local_batch_slice)
    initialize()          # no coordinator: must no-op, not raise
    mesh = global_mesh(lattice_axis=2)
    assert dict(mesh.shape) == {"data": 4, "lattice": 2}
    assert process_local_batch_slice(8) == slice(0, 8)
    mesh_dp = global_mesh()
    assert dict(mesh_dp.shape) == {"data": 8, "lattice": 1}


@pytest.mark.slow
def test_two_process_dp_dryrun():
    """Multi-HOST layer: 2 OS processes x 4 virtual devices join one JAX job
    through parallel.distributed.initialize (explicit coordinator, gloo) and
    take a DP step with the grad psum crossing the process boundary — both
    workers must report the identical finite loss (tools/dryrun_multiprocess
    asserts this and exits nonzero otherwise)."""
    import json
    import os.path as osp
    import subprocess
    import sys
    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, osp.join(repo, "tools", "dryrun_multiprocess.py")],
        capture_output=True, text=True, timeout=3600, cwd=repo)
    assert proc.returncode == 0, proc.stdout[-3000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["ok"] and result["n_processes"] == 2
