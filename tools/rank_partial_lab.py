"""TPU lab: blocked_rank_partial variants (the splat partial stage).

The fwd profile shows 4 instances of this kernel totalling ~1.5 ms
(f32[128000,69] x2, f32[102400,69] x2) while the bandwidth roofline is
~75 us each — latency-bound on tiny per-block VPU+MXU ops.  Variants:

  v0  current kernel (bo=8, per-block select+mult+onehot+dot)
  v1  bo sweep (16, 32): fewer program boundaries
  v2  vectorized pre-pass: sv for the whole (step, C+R) program block in
      one shot, loop only the rank dots
  v3  bf16 partials out (halves the write traffic; partials are combined
      downstream in f32 either way)

Honest timing per tools/kernel_lab.py: scan-carried output reduction so
XLA cannot DCE, marginal over queue depth.
"""

import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import _log

REPS = 8


def repeated(fn, n_args):
    import jax
    import jax.numpy as jnp

    def wrapped(*args):
        def body(carry, _):
            a = list(args)
            x = a[0]
            a[0] = x + carry.astype(x.dtype)
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from tools.profile_breakdown import marginal_ms
    import hplflownet_tpu.ops.pallas_stencil as ps

    _BLOCK = 128
    rng = np.random.RandomState(0)
    results = {}

    def bench(name, fn, *args):
        try:
            jfn = jax.jit(repeated(fn, len(args)))
            ms = marginal_ms(jfn, args, lo=2, hi=6) / REPS
        except Exception as e:
            _log(f"{name:52s} FAILED: {str(e)[:200]}")
            results[name] = None
            return
        results[name] = round(ms, 4)
        _log(f"{name:52s} {ms:8.3f} ms")

    # ---- variant kernel: parameterized bo, vectorized pre-pass, out dtype
    def _v2_kernel(meta_ref, g_ref, out_ref, *, c, r, with_weights, bo,
                   vec_prepass):
        i = pl.program_id(0)
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, _BLOCK), 1)
        if vec_prepass and r:
            step = bo * _BLOCK
            meta_all = meta_ref[pl.ds(i * bo, bo), :].reshape(step)
            rid = meta_all >> 16
            iota_r = jax.lax.broadcasted_iota(jnp.int32, (step, r), 1)
            sel = (rid[:, None] == iota_r).astype(g_ref.dtype)
            gb_all = g_ref[:, :]
            w_all = jnp.sum(gb_all[:, c:c + r] * sel, axis=1)
            sv_all = gb_all[:, :c] * w_all[:, None]
            if with_weights:
                sv_all = jnp.concatenate([sv_all, w_all[:, None]], axis=1)
        for k in range(bo):
            meta = meta_ref[pl.ds(i * bo + k, 1), :].reshape(_BLOCK)
            lrank = meta & 0xFFFF
            if vec_prepass and r:
                sv = sv_all[k * _BLOCK:(k + 1) * _BLOCK, :]
            elif r:
                gb = g_ref[k * _BLOCK:(k + 1) * _BLOCK, :]
                rid = meta >> 16
                iota_r = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, r), 1)
                sel = (rid[:, None] == iota_r).astype(gb.dtype)
                w = jnp.sum(gb[:, c:c + r] * sel, axis=1)
                sv = gb[:, :c] * w[:, None]
                if with_weights:
                    sv = jnp.concatenate([sv, w[:, None]], axis=1)
            else:
                sv = g_ref[k * _BLOCK:(k + 1) * _BLOCK, :c]
            onehot = (lrank[:, None] == iota_b).astype(sv.dtype)
            out_ref[k * _BLOCK:(k + 1) * _BLOCK, :] = jax.lax.dot_general(
                onehot, sv, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(out_ref.dtype)

    def variant(g, meta, c, r, with_weights, *, bo, vec_prepass=False,
                out_dtype=jnp.float32):
        m, cr = g.shape
        step = bo * _BLOCK
        mp = -(-m // step) * step
        if mp != m:
            g = jnp.concatenate([g, jnp.zeros((mp - m, cr), g.dtype)], axis=0)
            meta = jnp.concatenate(
                [meta, jnp.zeros((mp - m,), jnp.int32)], axis=0)
        c_out = c + 1 if with_weights else c
        nb = mp // _BLOCK
        return pl.pallas_call(
            functools.partial(_v2_kernel, c=c, r=r,
                              with_weights=with_weights, bo=bo,
                              vec_prepass=vec_prepass),
            grid=(mp // step,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((step, cr), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((step, c_out), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((mp, c_out), out_dtype),
        )(meta.reshape(nb, _BLOCK), g)

    for m in (128000, 102400):
        c, r = 68, 4
        g = jnp.asarray(rng.randn(m, c + r), jnp.bfloat16)
        # realistic meta: sorted ranks within blocks, random corner ids
        lrank = np.minimum(np.sort(rng.randint(0, 128, (m // 128, 128)),
                                   axis=1), 127).astype(np.int32)
        rid = rng.randint(0, 4, (m // 128, 128)).astype(np.int32)
        meta = jnp.asarray((lrank | (rid << 16)).reshape(m))

        for rep in (0, 1):
            bench(f"M={m} v0 current bo=8 rep{rep}",
                  lambda g, meta: ps.blocked_rank_partial(g, meta, 68, 4,
                                                          True),
                  g, meta)
        for bo in (8,):
            bench(f"M={m} v2 bo={bo} vec_prepass",
                  lambda g, meta, bo=bo: variant(g, meta, 68, 4, True, bo=bo,
                                                 vec_prepass=True),
                  g, meta)
        bench(f"M={m} v3 bo=8 vec bf16-out",
              lambda g, meta: variant(g, meta, 68, 4, True, bo=8,
                                      vec_prepass=True,
                                      out_dtype=jnp.bfloat16),
              g, meta)

    print("RESULTS", results)


if __name__ == "__main__":
    main()
