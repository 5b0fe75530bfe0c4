"""Op-level TPU microbenchmarks at the real model shapes.

Each op is repeated REPS times *inside one jit* via lax.scan with a scalar
carry perturbing an input (prevents CSE/hoisting), so one launch amortizes
dispatch overhead; the marginal launch time over queue depths then divides
by REPS.  (Per-launch timing of sub-ms ops through the axon tunnel was
noise — it measured negative marginals.)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import CAPACITIES, NUM_POINTS, SFM7, synthetic_frustum_clouds, _log
from tools.profile_breakdown import marginal_ms

REPS = 16


def repeated(fn, perturb_idx=0):
    """Wrap fn(*args) -> scan of REPS applications, carry perturbs one arg."""
    import jax
    import jax.numpy as jnp

    def wrapped(*args):
        def body(carry, _):
            a = list(args)
            x = a[perturb_idx]
            a[perturb_idx] = x + carry.astype(x.dtype)
            out = fn(*a)
            # consume EVERY output element: carrying only out[0,0] lets XLA
            # dead-code-eliminate most of a pure matmul/gather under test
            # (a 474 GFLOP matmul "measured" 0.028 ms that way)
            leaves = jax.tree_util.tree_leaves(out)
            new_carry = sum(jnp.sum(l.astype(jnp.float32))
                            for l in leaves) * 1e-30
            return new_carry, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return c
    return wrapped


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

    def bench(name, fn, *args, perturb_idx=0):
        jfn = jax.jit(repeated(fn, perturb_idx))
        ms = marginal_ms(jfn, args, lo=2, hi=6) / REPS
        results[name] = round(ms, 4)
        _log(f"{name:44s} {ms:8.3f} ms")

    # ---- blur shapes: down path (68->64) and the up path
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
        bench(name, lambda t, n, k, bi: blur_matmul(neg, None, "float32", t, n, k, bi),
              table, nb, kern, bias)

    # ---- pure matmul of the same shape (speed-of-light reference)
    for name, h, fc_in, c_out in (
        ("matmul (26624,1020)@(1020,64)", 26624, 15 * 68, 64),
        ("matmul (26624,8700)@(8700,1024)", 26624, 15 * 580, 1024),
    ):
        x = jnp.asarray(rng.randn(h, fc_in), dt)
        w = jnp.asarray(rng.randn(fc_in, c_out), dt)
        bench(name, lambda x, w: jnp.dot(x, w,
                                         preferred_element_type=jnp.float32),
              x, w)

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

    # ---- corr ops at scale 2 (the biggest corr); k2 layout is (U, C, F, W)
    from hplflownet_tpu.ops.corr import corr_self
    sp2 = scales[2]
    h2 = sp2.pc1_corr_indices.shape[-1]
    pad2 = jnp.asarray(rng.randn(h2 + 1, 64), dt)
    n_uniq = sp2.pc2_corr_uniq.shape[0]
    k2 = jnp.asarray(rng.randn(n_uniq, 64, 15, 32), dt)
    bench(f"corr_cross_s2 ({n_uniq},{h2},64 uniq)",
          lambda p, u, k: corr_cross(p, u, k, None),
          pad2, sp2.pc2_corr_uniq, k2)
    k_self = jnp.asarray(rng.randn(15, 64, 32), dt)
    bench(f"corr_self_s2 (15,{h2},64->32)",
          lambda p, i, k: corr_self(neg, p, i, k),
          pad2, sp2.pc1_corr_indices, k_self)
    bench("corr_gather1_s2 (15,13312,64)",
          lambda p, i: gather_rows(p, i, None).sum(axis=0),
          pad2, sp2.pc1_corr_indices)

    # ---- splat + slice at scale 0
    sp0 = scales[0]
    n = sp0.pc1_barycentric.shape[0]
    feats = jnp.asarray(rng.randn(n, 68), jnp.float32)
    bench("splat_s0 (8192x4 -> 26624, 68ch)",
          lambda f: splat(f, sp0.pc1_barycentric, sp0.pc1_splat_plan), feats)
    for cdt, tag in ((jnp.float32, "f32"), (dt, "bf16")):
        blurred = jnp.asarray(rng.randn(CAPACITIES[0], 1024), cdt)
        bench(f"slice_s0 (26624 -> 8192, 1024ch {tag})",
              lambda bl: slice_to_points(bl, sp0.pc1_barycentric,
                                         sp0.pc1_lattice_offset,
                                         sp0.pc1_splat_plan), blurred)

    # ---- raw 4-key sort at probe scale (probe cost model)
    for m in (131072, 425984, 880000):
        hi = jnp.asarray(rng.randint(-3000, 3000, m), jnp.int32)
        lo = jnp.asarray(rng.randint(0, 2**30, m), jnp.int32)
        tg = jnp.asarray(rng.randint(0, 2, m), jnp.int32)
        ps = jnp.arange(m, dtype=jnp.int32)
        bench(f"sort4x{m}",
              lambda a, b, c, d: jax.lax.sort((a, b, c, d), num_keys=3)[0],
              hi, lo, tg, ps)
        bench(f"sort2x{m}",
              lambda a, b: jax.lax.sort((a, b), num_keys=1)[0],
              hi, ps)

    print("RESULTS", results)


if __name__ == "__main__":
    main()
