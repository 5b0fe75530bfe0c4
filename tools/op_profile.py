"""Op-level device profile of the full forward (top self-time HLO ops).

Captures a jax.profiler trace around a queue of forward launches and prints
the per-op breakdown via tensorboard_plugin_profile's raw converter.
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

    files = glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
    if not files:
        _log("no xplane captured (tracing unsupported through the tunnel?)")
        return
    xspace = max(files, key=lambda f: len(open(f, "rb").read()))
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data([xspace], "hlo_op_profile", {})
    try:
        payload = json.loads(data)
    except Exception:
        payload = json.loads(gzip.decompress(data))
    # byProgram -> children tree; walk two levels and collect leaves
    def walk(node, depth=0):
        name = node.get("name", "?")
        metrics = node.get("metrics", {})
        self_t = metrics.get("selfTimePs", 0)
        total_t = metrics.get("timePs", 0)
        yield name, self_t, total_t
        for ch in node.get("children", []):
            yield from walk(ch, depth + 1)

    rows = []
    for name, self_t, _ in walk(payload):
        if self_t:
            rows.append((self_t, name))
    rows.sort(reverse=True)
    tot = sum(r[0] for r in rows)
    _log(f"total self time {tot/1e12*1000:.2f} ms over {len(rows)} ops")
    for self_t, name in rows[:40]:
        print(f"{self_t/1e12*1000/8:9.3f} ms/launch  {100*self_t/tot:5.1f}%  "
              f"{name[:110]}")


if __name__ == "__main__":
    main()
