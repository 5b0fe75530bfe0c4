"""Phase breakdown of the on-device lattice pyramid build (round 3).

Times each builder stage per scale on the real TPU: _build_from_elevated
(sort + dedup + splat plan), _neighbor_table (blur probes) and _corr_tables
(correlation probes).  Honest scan-carry protocol (tools/kernel_lab.py):
every output element feeds the carry so XLA can't DCE or hoist the stage.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import CAPACITIES, NUM_POINTS, SFM7, synthetic_frustum_clouds, _log


REPS = 8


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from tools.profile_breakdown import marginal_ms
    from tools.kernel_lab import repeated
    from hplflownet_tpu.lattice import build as B
    from hplflownet_tpu.lattice.geometry import PermutohedralGeometry
    from hplflownet_tpu.lattice.offsets import neighborhood_offsets
    from hplflownet_tpu.pipeline import make_lattice_spec

    pc1, _ = synthetic_frustum_clouds(1, NUM_POINTS)
    a = jnp.asarray(pc1[0])
    spec = make_lattice_spec(SFM7, capacities=CAPACITIES)
    geom = PermutohedralGeometry(3)
    results = {}

    def bench(name, fn, *args, perturb_idx=0):
        try:
            jfn = jax.jit(repeated(fn, perturb_idx))
            ms = marginal_ms(jfn, args, lo=2, hi=6) / REPS
        except Exception as e:
            _log(f"{name:44s} FAILED: {str(e)[:200]}")
            return
        results[name] = round(ms, 4)
        _log(f"{name:44s} {ms:8.3f} ms")

    elev = geom.elevate(a, spec.scales[0].scale)
    valid = jnp.ones(a.shape[0], bool)
    offs = neighborhood_offsets(1, 3)

    for i, ss in enumerate(spec.scales):
        m = elev.shape[0] * 4
        if i <= 3:
            bench(f"build_s{i} (m={m}, cap={ss.capacity})",
                  lambda e, v, cap=ss.capacity:
                  B._build_from_elevated(geom, e, v, cap),
                  elev, valid)
        cl = jax.jit(lambda e, v, cap=ss.capacity:
                     B._build_from_elevated(geom, e, v, cap))(elev, valid)
        def with_w0(cl, w0):
            return cl._replace(vkeys=(w0,) + cl.vkeys[1:])

        if ss.blur_radius != -1 and i <= 3:
            bench(f"nbtable_s{i} (14x{ss.capacity})",
                  lambda w0, cl=cl: B._neighbor_table(
                      with_w0(cl, w0), offs, 3)[0],
                  cl.vkeys[0])
        if ss.corr_filter_radius != -1 and i <= 4:
            nb = jax.jit(lambda w0, cl=cl: B._neighbor_table(
                with_w0(cl, w0), offs, 3)[0])(cl.vkeys[0])
            bench(f"corrtables_s{i} (65x{ss.capacity})",
                  lambda w0, cl=cl, nb=nb: B._corr_tables(
                      with_w0(cl, w0), cl, offs, offs, 3,
                      pc1_corr=nb, with_inverse=False)[1],
                  cl.vkeys[0])
            bench(f"corrtables_inv_s{i} (65x{ss.capacity})",
                  lambda w0, cl=cl, nb=nb: B._corr_tables(
                      with_w0(cl, w0), cl, offs, offs, 3,
                      pc1_corr=nb, with_inverse=True)[3],
                  cl.vkeys[0])
        if i + 1 < len(spec.scales):
            elev, valid = jax.jit(
                lambda cl, s=ss.scale, ns=spec.scales[i + 1].scale:
                B._next_elevated(geom, cl, s, ns))(cl)

    print("RESULTS", results)


if __name__ == "__main__":
    main()
