"""Op-level device profile of the full forward (top self-time HLO ops).

Captures a jax.profiler trace around a queue of forward launches and prints
the per-op breakdown parsed straight from the Chrome-trace export (the
tensorboard_plugin_profile converter is broken by a protobuf version skew
in this image, so we read the "XLA Ops" lane of trace.json.gz ourselves
and normalise by the number of module executions seen in "XLA Modules").
Usage: python tools/op_profile.py [--train]
"""

import glob
import gzip
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import CAPACITIES, NUM_POINTS, SFM7, synthetic_frustum_clouds, _log


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from hplflownet_tpu.models import HPLFlowNet
    from hplflownet_tpu.pipeline import make_lattice_spec, flow_forward
    from hplflownet_tpu.train.step import make_train_step

    pc1, pc2 = synthetic_frustum_clouds(1, NUM_POINTS)
    a, b = jnp.asarray(pc1[0]), jnp.asarray(pc2[0])
    spec = make_lattice_spec(SFM7, capacities=CAPACITIES)
    model = HPLFlowNet(scales_filter_map=SFM7, compute_dtype="bfloat16")

    train = "--train" in sys.argv
    from hplflownet_tpu.lattice import build_pyramid
    scales = jax.jit(lambda x, y: build_pyramid(spec, x, y))(a, b)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), a, b, scales)

    if train:
        init_state, train_step = make_train_step(model, spec)
        state = init_state(params)
        batch = {
            "pc1": a[None], "pc2": b[None], "sf": (b - a)[None],
            "valid1": jnp.ones((1, a.shape[0]), bool),
            "valid2": jnp.ones((1, a.shape[0]), bool),
        }
        state, loss = train_step(state, batch)
        np.asarray(loss)

        def launch():
            nonlocal state
            state, loss = train_step(state, batch)
            return loss
    else:
        fwd = jax.jit(lambda p, x, y: flow_forward(
            model, p, spec, x, y, adjoint_plans=False))
        np.asarray(fwd(params, a, b))

        def launch():
            return fwd(params, a, b)

    logdir = "/tmp/jax_op_profile"
    jax.profiler.start_trace(logdir)
    out = None
    for _ in range(8):
        out = launch()
    np.asarray(out)
    jax.profiler.stop_trace()
    _log("trace captured")

    files = glob.glob(logdir + "/**/*.trace.json.gz", recursive=True)
    if not files:
        _log("no trace.json.gz captured")
        return
    import os
    path = max(files, key=os.path.getmtime)   # newest capture, not largest
    with gzip.open(path) as f:
        data = json.load(f)
    events = data["traceEvents"]
    lanes = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            lanes[(e["pid"], e["tid"])] = e["args"].get("name", "")
    ops_lanes = {k for k, n in lanes.items() if n == "XLA Ops"}
    mod_lanes = {k for k, n in lanes.items() if n == "XLA Modules"}
    n_mods = sum(1 for e in events
                 if e.get("ph") == "X"
                 and (e["pid"], e.get("tid")) in mod_lanes)
    mod_wall = sum(e["dur"] for e in events
                   if e.get("ph") == "X"
                   and (e["pid"], e.get("tid")) in mod_lanes)
    n_mods = max(n_mods, 1)
    seen = {}
    for e in events:
        if e.get("ph") == "X" and (e["pid"], e.get("tid")) in ops_lanes:
            n = e["name"]
            d, a = seen.get(n, (0.0, None))
            seen[n] = (d + e["dur"], a or e.get("args", {}))
    rows = sorted(((d, n, a) for n, (d, a) in seen.items()), reverse=True)
    tot = sum(r[0] for r in rows)
    _log(f"{n_mods} module executions, {mod_wall/n_mods/1000:.2f} ms wall "
         f"each; op self time {tot/n_mods/1000:.2f} ms/launch "
         f"over {len(rows)} distinct ops")
    for dur, name, args in rows[:45]:
        src = (args or {}).get("source_info", "") or ""
        print(f"{dur/n_mods/1000:8.3f} ms  {100*dur/tot:5.1f}%  "
              f"{name[:70]:70s} {src[:60]}")

    # family rollup: strip trailing .N / numeric suffixes so the long tail
    # of per-instance fusions aggregates into attributable groups
    import re
    fam = {}
    for name, (d, a) in seen.items():
        base = re.sub(r"[.\d]+$", "", name)
        t, cnt, src = fam.get(base, (0.0, 0, ""))
        fam[base] = (t + d, cnt + 1,
                     src or ((a or {}).get("source_info", "") or ""))
    print("\n-- families --")
    for t, cnt, base, src in sorted(((t, c, b, s) for b, (t, c, s)
                                     in fam.items()), reverse=True)[:30]:
        print(f"{t/n_mods/1000:8.3f} ms  {100*t/tot:5.1f}%  x{cnt:4d}  "
              f"{base[:50]:50s} {src[:50]}")


if __name__ == "__main__":
    main()
