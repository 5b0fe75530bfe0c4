"""Quick TPU experiments for the wide-C stencil kernel design (round 3).

Honest timing: the scan carry consumes a full reduction of the output so
XLA cannot dead-code-eliminate any part of the computation (the old
microbench carried only out[0,0], which let XLA slice pure-matmul
baselines down to one row — measured 0.028 ms for a 474 GFLOP matmul).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import CAPACITIES, NUM_POINTS, SFM7, synthetic_frustum_clouds, _log

REPS = 8


def repeated(fn, perturb_idx=0):
    import jax
    import jax.numpy as jnp

    def wrapped(*args):
        def body(carry, _):
            a = list(args)
            x = a[perturb_idx]
            if jnp.issubdtype(x.dtype, jnp.floating):
                a[perturb_idx] = x + carry.astype(x.dtype)
            else:
                # int inputs: add a data-dependent (but always-zero) bump so
                # XLA can't hoist the loop-invariant stage out of the scan
                a[perturb_idx] = x + (carry > 1e30).astype(x.dtype)
            out = fn(*a)
            leaves = jax.tree_util.tree_leaves(out)
            new_carry = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves) * 1e-30
            return new_carry, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return c
    return wrapped


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from tools.profile_breakdown import marginal_ms
    from hplflownet_tpu.pipeline import make_lattice_spec
    from hplflownet_tpu.lattice import build_pyramid

    pc1, pc2 = synthetic_frustum_clouds(1, NUM_POINTS)
    a, b = jnp.asarray(pc1[0]), jnp.asarray(pc2[0])
    spec = make_lattice_spec(SFM7, capacities=CAPACITIES)
    pyr = jax.jit(lambda x, y: build_pyramid(spec, x, y, adjoint_plans=False))
    scales = pyr(a, b)
    _log("pyramid ready")
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    results = {}

    def bench(name, fn, *args):
        try:
            jfn = jax.jit(repeated(fn))
            ms = marginal_ms(jfn, args, lo=2, hi=6) / REPS
        except Exception as e:
            _log(f"{name:48s} FAILED: {str(e)[:160]}")
            results[name] = None
            return
        results[name] = round(ms, 4)
        _log(f"{name:48s} {ms:8.3f} ms")

    # neighbor presence ratio per scale (how much work absent taps could save)
    for i in (0, 1, 2):
        nb = np.asarray(scales[i].pc1_blur_neighbors)
        nv = int(scales[i].pc1_num_valid)
        pres = (nb[:, :nv] >= 0).mean()
        blocks = nb.reshape(nb.shape[0], -1, 128)
        block_any = (blocks >= 0).any(axis=2).mean()
        _log(f"scale{i}: tap presence {pres:.3f}, block-nonempty {block_any:.3f}")

    sp0 = scales[0]
    h = sp0.pc1_blur_neighbors.shape[1]
    nb0 = sp0.pc1_blur_neighbors

    # ---- honest pure-matmul baselines (speed-of-light reference)
    for name, m, k, n in (
        ("matmul 26624x8700x1024", 26624, 8700, 1024),
        ("matmul 26624x1020x64", 26624, 1020, 64),
    ):
        x = jnp.asarray(rng.randn(m, k), dt)
        w = jnp.asarray(rng.randn(k, n), dt)
        bench(name, lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32), x, w)

    # ---- wide blur (580->1024) variants
    c_in, c_out = 580, 1024
    table = jnp.asarray(rng.randn(h + 1, c_in), dt)
    kern = jnp.asarray(rng.randn(15, c_in, c_out), dt)

    from hplflownet_tpu.ops.bcl import _stencil_xla
    bench("blur_up_s0 XLA (580->1024)",
          lambda t, n, k: _stencil_xla(t, n, k), table, nb0, kern)

    # Pallas full-table with raised scoped-VMEM limit
    import hplflownet_tpu.ops.pallas_stencil as ps

    def pallas_raised(limit_mb):
        def fn(t, n, k):
            return ps.stencil_gather_matmul(
                t[1:], n, k, window=384,
                vmem_limit_bytes=limit_mb * 2**20)
        return fn

    if hasattr(ps, "_HAS_VMEM_ARG"):
        pass
    for limit in (64, 100):
        bench(f"blur_up_s0 pallas vmem={limit}M",
              pallas_raised(limit), table, nb0, kern)

    # mid layer 324->512 at 32768
    sp1 = scales[1]
    h1 = sp1.pc1_blur_neighbors.shape[1]
    t1 = jnp.asarray(rng.randn(h1 + 1, 324), dt)
    k1 = jnp.asarray(rng.randn(15, 324, 512), dt)
    bench("blur_up_s1 XLA (324->512)",
          lambda t, n, k: _stencil_xla(t, n, k), t1, sp1.pc1_blur_neighbors, k1)
    for limit in (64,):
        bench(f"blur_up_s1 pallas vmem={limit}M",
              lambda t, n, k: ps.stencil_gather_matmul(
                  t[1:], n, k, window=384, vmem_limit_bytes=limit * 2**20),
              t1, sp1.pc1_blur_neighbors, k1)

    print("RESULTS", results)


if __name__ == "__main__":
    main()
