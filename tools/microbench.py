"""Op-level TPU microbenchmarks at the real model shapes.

Times each op class (blur gather+matmul, pure matmul, corr, splat, slice,
pyramid per-scale) via the queue-depth marginal protocol.  Guides kernel
work: compare each op against its speed-of-light (MXU flops / HBM bytes).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import CAPACITIES, NUM_POINTS, SFM7, synthetic_frustum_clouds, _log
from tools.profile_breakdown import marginal_ms


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from hplflownet_tpu.pipeline import make_lattice_spec
    from hplflownet_tpu.lattice import build_pyramid, LatticeSpec
    from hplflownet_tpu.lattice.offsets import tap_negation
    from hplflownet_tpu.ops.bcl import blur_matmul, splat, slice_to_points
    from hplflownet_tpu.ops.corr import corr_cross, gather_rows

    pc1, pc2 = synthetic_frustum_clouds(1, NUM_POINTS)
    a, b = jnp.asarray(pc1[0]), jnp.asarray(pc2[0])
    spec = make_lattice_spec(SFM7, capacities=CAPACITIES)

    t0 = time.perf_counter()
    pyr = jax.jit(lambda x, y: build_pyramid(spec, x, y, adjoint_plans=False))
    scales = pyr(a, b)
    _log(f"pyramid built in {time.perf_counter()-t0:.1f}s")
    neg = tap_negation(1, 3)
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16

    results = {}

    def bench(name, fn, *args):
        jfn = jax.jit(fn)
        ms = marginal_ms(jfn, args)
        results[name] = ms
        _log(f"{name:42s} {ms:8.3f} ms")

    # ---- blur shapes: down path (68->64) and fattest up path (580->1024)
    for name, h_idx, c_in, c_out in (
        ("blur_down_s0 (26624,68->64)", 0, 68, 64),
        ("blur_down_s1 (32768,68->64)", 1, 68, 64),
        ("blur_up_s0 (26624,580->1024)", 0, 580, 1024),
        ("blur_up_s1 (32768,324->512)", 1, 324, 512),
        ("blur_up_s2 (13312,388->256)", 2, 388, 256),
    ):
        sp = scales[h_idx]
        h = sp.pc1_blur_neighbors.shape[1]
        table = jnp.asarray(rng.randn(h + 1, c_in), dt)
        kern = jnp.asarray(rng.randn(15, c_in, c_out), dt)
        bias = jnp.asarray(np.zeros(c_out), jnp.float32)
        nb = sp.pc1_blur_neighbors
        bench(name, lambda t, n, k, bi: blur_matmul(neg, t, n, k, bi),
              table, nb, kern, bias)

    # ---- pure matmul of the same shape (speed-of-light reference)
    for name, h, fc_in, c_out in (
        ("matmul (26624,1020)@(1020,64)", 26624, 15 * 68, 64),
        ("matmul (26624,8700)@(8700,1024)", 26624, 15 * 580, 1024),
    ):
        x = jnp.asarray(rng.randn(h, fc_in), dt)
        w = jnp.asarray(rng.randn(fc_in, c_out), dt)
        bench(name, lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32), x, w)

    # ---- pure gather of the blur pattern (isolate gather cost)
    for name, h_idx, c_in in (
        ("gather15 (26624,68)", 0, 68),
        ("gather15 (26624,580)", 0, 580),
    ):
        sp = scales[h_idx]
        h = sp.pc1_blur_neighbors.shape[1]
        table = jnp.asarray(rng.randn(h + 1, c_in), dt)
        nb = sp.pc1_blur_neighbors
        bench(name, lambda t, n: t[n.T + 1].reshape(h, -1).sum(axis=1),
              table, nb)

    # ---- corr ops at scale 2 (the biggest corr)
    sp2 = scales[2]
    h2 = sp2.pc1_corr_indices.shape[-1]
    pad2 = jnp.asarray(rng.randn(h2 + 1, 64), dt)
    kc = jnp.asarray(rng.randn(15, 64, 32), dt)
    bench("corr_cross_s2 (15,15,13312,64)",
          lambda p, i, k: corr_cross(p, i, k, None),
          pad2, sp2.pc2_corr_indices, kc)
    bench("corr_gather1_s2 (15,13312,64)",
          lambda p, i: gather_rows(p, i, None).sum(axis=0),
          pad2, sp2.pc1_corr_indices)

    # ---- splat + slice at scale 0
    sp0 = scales[0]
    n = sp0.pc1_barycentric.shape[0]
    feats = jnp.asarray(rng.randn(n, 68), jnp.float32)
    bench("splat_s0 (8192x4 -> 26624, 68ch)",
          lambda f: splat(f, sp0.pc1_barycentric, sp0.pc1_splat_plan), feats)
    blurred = jnp.asarray(rng.randn(CAPACITIES[0], 1024), jnp.float32)
    bench("slice_s0 (26624 -> 8192, 1024ch)",
          lambda bl: slice_to_points(bl, sp0.pc1_barycentric,
                                     sp0.pc1_lattice_offset,
                                     sp0.pc1_splat_plan), blurred)

    # ---- pyramid cumulative per-scale cost
    prev = 0.0
    for k in range(1, 8):
        sub = LatticeSpec(d=3, scales=spec.scales[:k])
        fn = jax.jit(lambda x, y, s=sub: build_pyramid(s, x, y,
                                                       adjoint_plans=False))
        ms = marginal_ms(fn, (a, b))
        _log(f"pyramid scales[0:{k}]: {ms:8.2f} ms (marginal {ms-prev:+.2f})")
        prev = ms

    print("RESULTS", results)


if __name__ == "__main__":
    main()
