"""Phase breakdown of the 8192-pt inference pair on the real TPU.

Times, via the queue-depth marginal protocol (block_until_ready is a no-op
on the axon tunnel — see bench.py):
  * pyramid  : build_pyramid alone (adjoint_plans=False)
  * model    : HPLFlowNet forward on prebuilt scales
  * full     : pyramid + model under one jit (what bench.py measures)
plus optional finer slices. Usage: python tools/profile_breakdown.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import CAPACITIES, NUM_POINTS, SFM7, synthetic_frustum_clouds, _log


def _sync(out):
    import jax
    np.asarray(jax.tree_util.tree_leaves(out)[0])


def marginal_ms(fn, args, lo=8, hi=24):
    """Marginal ms/launch between queue depths lo and hi."""
    _sync(fn(*args))
    times = {}
    for iters in (lo, hi):
        t = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        times[iters] = time.perf_counter() - t
    return (times[hi] - times[lo]) / (hi - lo) * 1000


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from hplflownet_tpu.models import HPLFlowNet
    from hplflownet_tpu.pipeline import make_lattice_spec, flow_forward
    from hplflownet_tpu.lattice import build_pyramid

    pc1, pc2 = synthetic_frustum_clouds(1, NUM_POINTS)
    a, b = jnp.asarray(pc1[0]), jnp.asarray(pc2[0])
    spec = make_lattice_spec(SFM7, capacities=CAPACITIES)
    model = HPLFlowNet(scales_filter_map=SFM7, compute_dtype="bfloat16")

    t = time.perf_counter()
    pyr = jax.jit(lambda x, y: build_pyramid(spec, x, y,
                                             adjoint_plans=False))
    scales = pyr(a, b)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), a, b, scales)
    _log(f"init {time.perf_counter()-t:.1f}s")

    # 1. pyramid alone
    ms_pyr = marginal_ms(pyr, (a, b))
    _log(f"pyramid (no adjoint plans): {ms_pyr:.2f} ms")

    # pyramid with adjoint plans (training path)
    pyr_adj = jax.jit(lambda x, y: build_pyramid(spec, x, y,
                                                 adjoint_plans=True))
    ms_pyr_adj = marginal_ms(pyr_adj, (a, b))
    _log(f"pyramid (with adjoint plans): {ms_pyr_adj:.2f} ms")

    # 2. model alone on prebuilt scales
    fwd_model = jax.jit(lambda p, s, x, y: model.apply(p, x, y, s))
    ms_model = marginal_ms(fwd_model, (params, scales, a, b))
    _log(f"model on prebuilt scales: {ms_model:.2f} ms")

    # 3. full fused (bench.py protocol)
    full = jax.jit(lambda p, x, y: flow_forward(
        model, p, spec, x, y, adjoint_plans=False))
    ms_full = marginal_ms(full, (params, a, b))
    _log(f"full (pyramid+model one jit): {ms_full:.2f} ms")

    print(f"SUMMARY pyramid={ms_pyr:.2f} pyramid_adj={ms_pyr_adj:.2f} "
          f"model={ms_model:.2f} full={ms_full:.2f}")


if __name__ == "__main__":
    main()
