#!/usr/bin/env python3
"""Large-cloud single-chip capability check (the reference caps at 8192).

For each requested point count: measure per-scale capacities on the
synthetic frustum distribution (lattice/capacity.py), build the full
7-scale pyramid + HPLFlowNet forward under one jit, verify ZERO overflow
(capacity, probe-window and stencil-window counters all silent), and
report the queue-depth marginal ms/pair (bench.py protocol — axon's
block_until_ready is a no-op).

Usage (TPU):  python tools/large_cloud_bench.py [--sizes 32768,98304]
Prints one JSON line per size.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import SFM7, _log
from hplflownet_tpu.lattice.capacity import (measured_default_capacities,
                                             synthetic_frustum_clouds)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="32768,98304")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from hplflownet_tpu.models import HPLFlowNet
    from hplflownet_tpu.pipeline import make_lattice_spec
    from hplflownet_tpu.lattice import build_pyramid

    for n in sizes:
        caps = measured_default_capacities(n, SFM7, seeds=(0, 1, 2),
                                           slack=1.25)
        _log(f"n={n}: capacities {caps}")
        spec = make_lattice_spec(SFM7, capacities=caps)
        model = HPLFlowNet(scales_filter_map=SFM7, compute_dtype="bfloat16")
        pc1, pc2 = synthetic_frustum_clouds(1, n, seed=7)
        a, b = jnp.asarray(pc1[0]), jnp.asarray(pc2[0])

        t0 = time.perf_counter()
        scales = jax.jit(lambda x, y: build_pyramid(spec, x, y))(a, b)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), a, b, scales)
        _log(f"init in {time.perf_counter() - t0:.1f}s")

        @jax.jit
        def fwd(params, x, y):
            sc = build_pyramid(spec, x, y, adjoint_plans=False)
            flow = model.apply(params, x, y, sc)
            oflow = sum(s.pc1_overflow + s.pc2_overflow + s.probe_overflow
                        + s.stencil_overflow for s in sc)
            return flow, oflow

        t0 = time.perf_counter()
        flow, oflow = fwd(params, a, b)
        flow_np = np.asarray(flow)
        _log(f"compile+first in {time.perf_counter() - t0:.1f}s")
        assert np.isfinite(flow_np).all()
        n_oflow = int(oflow)

        marginals = []
        for _ in range(3):
            times = {}
            for iters in (4, 12):
                t = time.perf_counter()
                for _ in range(iters):
                    out, _ = fwd(params, a, b)
                np.asarray(out)
                times[iters] = time.perf_counter() - t
            marginals.append((times[12] - times[4]) / 8)
        ms = min(marginals) * 1000
        print(json.dumps({"points": n, "ms_per_pair": round(ms, 1),
                          "overflow": n_oflow,
                          "capacities": caps}), flush=True)


if __name__ == "__main__":
    main()
