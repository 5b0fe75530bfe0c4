"""Gather-strategy experiments on the real TPU for the blur/corr hot path.

Questions:
  1. Does per-tap (monotone-index) gather beat the h-major 2D gather?
  2. Does a Pallas kernel with in-VMEM jnp.take work on this stack at all?
  3. What does a fused windowed gather+matmul kernel achieve vs XLA?
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import CAPACITIES, NUM_POINTS, SFM7, synthetic_frustum_clouds, _log
from tools.profile_breakdown import marginal_ms
from tools.microbench import repeated, REPS


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from hplflownet_tpu.pipeline import make_lattice_spec
    from hplflownet_tpu.lattice import build_pyramid

    pc1, pc2 = synthetic_frustum_clouds(1, NUM_POINTS)
    a, b = jnp.asarray(pc1[0]), jnp.asarray(pc2[0])
    spec = make_lattice_spec(SFM7, capacities=CAPACITIES)
    scales = jax.jit(lambda x, y: build_pyramid(spec, x, y,
                                                adjoint_plans=False))(a, b)
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16

    def bench(name, fn, *args):
        jfn = jax.jit(repeated(fn))
        ms = marginal_ms(jfn, args, lo=2, hi=6) / REPS
        _log(f"{name:52s} {ms:8.3f} ms")
        return ms

    sp0 = scales[0]
    nb = sp0.pc1_blur_neighbors                   # (15, 26624)
    h = nb.shape[1]

    for c_in in (68, 580):
        table = jnp.asarray(rng.randn(h + 1, c_in), dt)

        # current: h-major 2D gather
        bench(f"gather hmajor (H,F,{c_in})",
              lambda t, n=nb: t[n.T + 1].sum(axis=1), table)
        # per-tap, monotone index runs (f-major)
        bench(f"gather fmajor (F,H,{c_in})",
              lambda t, n=nb: t[n + 1].sum(axis=0), table)
        # per-tap via a scan (one tap at a time, monotone)
        def tap_scan(t, n=nb):
            def body(acc, idx):
                return acc + t[idx + 1], None
            acc, _ = jax.lax.scan(body, jnp.zeros((h, t.shape[1]), t.dtype), n)
            return acc
        bench(f"gather tapscan (F,H,{c_in})", tap_scan, table)

    # Pallas: does an in-VMEM take/gather compile at all?
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        c_in = 128
        table = jnp.asarray(rng.randn(h + 1, c_in), dt)
        idx = nb[3] + 1                                  # (H,) monotone

        def take_kernel(idx_ref, t_ref, o_ref):
            o_ref[:] = jnp.take(t_ref[:], idx_ref[:], axis=0)

        def pallas_take(t, i):
            return pl.pallas_call(
                take_kernel,
                out_shape=jax.ShapeDtypeStruct((h, c_in), t.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(i, t)

        out = pallas_take(table, idx)
        ref = np.asarray(table)[np.asarray(idx)]
        ok = np.allclose(np.asarray(out), ref)
        _log(f"pallas take(axis=0) compiles, correct={ok}")
        bench("pallas take (26624,128) single tap",
              lambda t, i=idx: pallas_take(t, i), table)
    except Exception as e:
        _log(f"pallas take failed: {type(e).__name__}: {str(e)[:300]}")

    # Pallas: dynamic_gather primitive if present
    try:
        from jax.experimental.pallas import tpu as pltpu
        names = [n for n in dir(pltpu) if "gather" in n.lower()]
        _log(f"pltpu gather-ish symbols: {names}")
    except Exception:
        pass


if __name__ == "__main__":
    main()
