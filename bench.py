"""Benchmark: end-to-end scene-flow inference throughput on one TPU chip.

Measures 8192-point pairs/sec through the full pipeline — on-device lattice
pyramid construction + HPLFlowNet forward — matching the reference's eval
protocol (8192 points, full model).  Prints one JSON line.

Timing protocol: the TPU tunnel in this environment does not synchronize on
``block_until_ready``, so throughput is measured by enqueueing K forward
launches (the device executes them in order) and synchronizing once via
``np.asarray`` of the final output; the marginal time between two queue
depths removes the round-trip overhead.  Capacities are fixed constants
(measured on the synthetic distribution via --measure) so the persistent
compile cache hits across runs.

Baseline: the reference publishes no throughput; the north-star target is
>= 50 pairs/sec/chip (BASELINE.md), so vs_baseline = pairs_per_sec / 50.
"""

import json
import sys
import time

import numpy as np

NUM_POINTS = 8192
BATCH = 1
TARGET = 50.0  # pairs/sec/chip north star (BASELINE.md)

SFM7 = [[3.0, 1, -1, -1], [2.0, 1, -1, -1], [1.0, 1, 1, 1],
        [0.5, 1, 1, 1], [0.25, 1, 1, 1], [0.125, 1, 1, 1],
        [0.0625, 1, 1, 1]]

# measured on synthetic_frustum_clouds over 8 seeds (worst counts:
# 22.8k/28.4k/11.5k/3.2k/739/213/87), padded 1.12x and aligned to 128
CAPACITIES = [25600, 31872, 12928, 3584, 896, 256, 128]


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


# FT3D-like clouds: points on surfaces inside a 35 m camera frustum.
# flow_scale is the per-axis std of the patchwise rigid motion; the
# learnability harness (tools/train_synthetic.py) uses ~1.0 (around one
# lattice cell at its finest scale — sub-cell flows are invisible to the
# correlation's displacement taps), while the bench keeps the default.
# patches=300 (the bench default) gives FT3D-like *surface density* but a
# spatially incoherent flow field; the harness uses a handful so motion is
# piecewise-rigid over object-sized regions like real scene flow.
from hplflownet_tpu.lattice.capacity import synthetic_frustum_clouds


def measure_capacities(spec_rows, pc1, pc2, slack=1.15, align=256):
    """Probe true per-scale vertex counts, return padded static capacities."""
    import jax
    import jax.numpy as jnp
    from hplflownet_tpu.pipeline import make_lattice_spec
    from hplflownet_tpu.lattice import build_pyramid

    n = pc1.shape[1]
    generous = [4 * n] * 3 + [2 * n] * 2 + [n] * (len(spec_rows) - 5)
    spec = make_lattice_spec(spec_rows, capacities=generous)

    @jax.jit
    def counts(a, b):
        def single(x, y):
            scales = build_pyramid(spec, x, y)
            return ([jnp.maximum(sp.pc1_num_valid, sp.pc2_num_valid)
                     for sp in scales],
                    [jnp.maximum(sp.pc1_overflow, sp.pc2_overflow)
                     for sp in scales])
        return jax.vmap(single)(a, b)

    per_scale, overflow = counts(jnp.asarray(pc1), jnp.asarray(pc2))
    assert all(int(np.asarray(o).max()) == 0 for o in overflow)
    worst = [int(np.asarray(c).max()) for c in per_scale]
    _log(f"measured vertex counts: {worst}")
    return [int(-(-int(w * slack) // align) * align) for w in worst]


def main():
    import jax

    # persistent compile cache: first run pays XLA compilation, reruns don't
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from hplflownet_tpu.models import HPLFlowNet
    from hplflownet_tpu.pipeline import make_lattice_spec, flow_forward
    from hplflownet_tpu.lattice import build_pyramid

    pc1, pc2 = synthetic_frustum_clouds(BATCH, NUM_POINTS)
    if "--measure" in sys.argv:
        caps = measure_capacities(SFM7, pc1, pc2)
        _log(f"capacities: {caps}")
    else:
        caps = CAPACITIES

    spec = make_lattice_spec(SFM7, capacities=caps)
    # bf16 MXU/gather path with f32 accumulation (config: compute_dtype)
    model = HPLFlowNet(scales_filter_map=SFM7, compute_dtype="bfloat16")

    a, b = jnp.asarray(pc1), jnp.asarray(pc2)
    t = time.perf_counter()
    scales = jax.jit(lambda x, y: build_pyramid(spec, x, y))(a[0], b[0])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), a[0], b[0], scales)
    _log(f"init in {time.perf_counter() - t:.1f}s")

    @jax.jit
    def fwd(params, a, b):
        # single-sample graph: vmap'd sorts/gathers lower poorly on TPU
        return flow_forward(model, params, spec, a[0], b[0],
                            adjoint_plans=False)[None]

    t = time.perf_counter()
    np.asarray(fwd(params, a, b))
    _log(f"fwd compile+first in {time.perf_counter() - t:.1f}s")

    # device executes enqueued launches in order; np.asarray of the last
    # output synchronizes the whole queue (block_until_ready is a no-op on
    # the tunnel used in this environment)
    t = time.perf_counter()
    np.asarray(fwd(params, a, b))
    t_one = time.perf_counter() - t
    # three passes of the queue-depth ladder, min marginal: single-pass
    # marginals through the tunnel jitter by a few ms (measured 62.1 vs
    # 65.8 on identical code); the min over passes is robust to one-off
    # host/tunnel interference while never under-reporting device time
    marginals = []
    for rep in range(3):
        times = {}
        for iters in (8, 24):
            t = time.perf_counter()
            for _ in range(iters):
                out = fwd(params, a, b)
            np.asarray(out)
            times[iters] = time.perf_counter() - t
            _log(f"iters={iters}: {times[iters]:.3f}s")
        marginals.append((times[24] - times[8]) / 16)
    per_batch = min(marginals)
    _log(f"single-call {t_one:.3f}s, marginal {per_batch * 1000:.1f} ms/batch")
    pairs_per_sec = BATCH / per_batch

    # training-step throughput: full pipeline + backward + Adam, batch 1
    # (the reference trains at batch 1; configs/train_ours.yaml:17)
    from hplflownet_tpu.train.step import make_train_step
    init_state, train_step = make_train_step(model, spec)
    batch = {
        "pc1": a, "pc2": b, "sf": b - a,
        "valid1": jnp.ones(a.shape[:2], bool),
        "valid2": jnp.ones(b.shape[:2], bool),
    }
    t = time.perf_counter()
    state = init_state(params)
    state, loss = train_step(state, batch)
    _log(f"train compile+first in {time.perf_counter() - t:.1f}s "
         f"(loss {float(loss):.4f})")
    tmarginals = []
    for rep in range(3):
        ttimes = {}
        for iters in (8, 24):
            t = time.perf_counter()
            for _ in range(iters):
                state, loss = train_step(state, batch)
            np.asarray(loss)
            ttimes[iters] = time.perf_counter() - t
            _log(f"train iters={iters}: {ttimes[iters]:.3f}s")
        tmarginals.append((ttimes[24] - ttimes[8]) / 16 * 1000)
    train_ms = min(tmarginals)
    _log(f"train marginal {train_ms:.1f} ms/step")

    print(json.dumps({
        "metric": "pairs_per_sec",
        "value": round(pairs_per_sec, 3),
        "unit": f"{NUM_POINTS}-pt pairs/sec/chip (fwd incl. lattice build)",
        "vs_baseline": round(pairs_per_sec / TARGET, 4),
        "train_step_ms": round(train_ms, 2),
        "train_pairs_per_sec": round(BATCH / (train_ms / 1000), 3),
    }))


if __name__ == "__main__":
    main()
