"""Learnability proof-of-life: train HPLFlowNetShallow on synthetic flow.

The reference's only evidence that the training stack works is its full
800-epoch FT3D recipe (/root/reference/main.py:154-189) — unavailable here
(no dataset, zero egress).  This script supplies the equivalent evidence on
generated data: a seeded FT3D-like set (bench.synthetic_frustum_clouds
surfaces + rigid-ish patch flows), a held-out split, and a logged EPE3D
curve.  A gradient bug that merely *slows* learning (rather than stopping
it) shows up here as a flat curve.

Writes training_runs/synthetic_curve.json; run on the TPU:
    python tools/train_synthetic.py [--steps 3000]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import _log, synthetic_frustum_clouds

SFM5 = [[1.0, 1, 1, 1], [0.5, 1, 1, 1], [0.25, 1, 1, 1],
        [0.125, 1, 1, 1], [0.0625, 1, 1, 1]]
NUM_POINTS = 1024
TRAIN_PAIRS = 512
VAL_PAIRS = 64


def make_dataset(n_pairs, n_points, seed, patches=300):
    """Pairs with patchwise flows: the task is recover sf from (pc1, pc2).

    flow_scale 1.0 puts the motion around one lattice cell at the finest
    scale — sub-cell flows (the bench default 0.1) are invisible to the
    correlation's displacement taps and the learnable optimum degenerates
    to predicting zero flow (EPE plateau at 0.1 * E||N(0,I3)|| = 0.16).
    ``patches`` controls flow coherence: at the bench's 300 patches and
    1024 points each independently-moving patch has ~3 points — a nearly
    pointwise correspondence problem no scene-flow net solves; a dozen
    patches gives piecewise-rigid motion over object-sized regions like
    FT3D/KITTI.
    """
    pc1, pc2 = synthetic_frustum_clouds(n_pairs, n_points, seed=seed,
                                        flow_scale=1.0, patches=patches)
    return pc1, pc2, pc2 - pc1


def resample_overflowing(spec, pc1, pc2, seed, patches=300):
    """Replace pairs whose lattice build degrades (any overflow counter).

    Mirrors the dataset layer's degenerate-sample resampling
    (data/datasets.py): static capacities + probe/stencil windows are
    budgets, and inputs that bust them are detected (counted, never
    silently wrong) and resampled here so the training evidence carries
    zero degradation.  ~1 in 600 synthetic pairs trips the scale-1 probe
    window at flow_scale 1.0.
    """
    import jax
    import jax.numpy as jnp
    from hplflownet_tpu.lattice import build_pyramid

    @jax.jit
    def overflow(a, b):
        scales = build_pyramid(spec, a, b)
        return sum(sp.pc1_overflow + sp.pc2_overflow + sp.probe_overflow
                   + sp.stencil_overflow for sp in scales)

    n, pts = pc1.shape[0], pc1.shape[1]
    replaced = 0
    for i in range(n):
        draw = 0
        while int(overflow(jnp.asarray(pc1[i]), jnp.asarray(pc2[i]))):
            draw += 1
            if draw > 20:
                # every redraw busts the budget too: the capacities are
                # wrong for the distribution, not the pair — re-measure
                raise RuntimeError(
                    f"pair {i}: 20 redraws all overflow the lattice "
                    "budgets; capacities/windows too small for this "
                    "distribution")
            a, b = synthetic_frustum_clouds(
                1, pts, seed=seed + 7919 * (i + 1) + draw, flow_scale=1.0,
                patches=patches)
            pc1[i], pc2[i] = a[0], b[0]
            replaced += 1
    if replaced:
        _log(f"resampled {replaced} overflowing pair(s)")
    return pc1, pc2, pc2 - pc1


def nn_oracle_epe(pc1, pc2, sf):
    """EPE3D of the nearest-neighbor oracle: predict flow = displacement to
    the closest pc2 point.

    A non-learned reference point: the best HARD-correspondence matcher
    (gt-informed: snap each true target to its closest pc2 point) pays
    exactly the point-density gap between pc1+sf and pc2.  On this
    generator it measures 0.0 — synthetic_frustum_clouds moves the SAME
    surface samples (point identity preserved, unlike the reference's
    uncorrelated NO_CORR sampling, transforms.py:517-533) — so the task's
    matching floor is zero and any held-out plateau is a model-capacity /
    optimization effect, not a correspondence-ambiguity ceiling."""
    tot = 0.0
    n = pc1.shape[1]
    chunk = max(1, (1 << 22) // n)   # keep the (chunk, N, 3) block ~100 MB
    for i in range(pc1.shape[0]):
        mins = []
        tgt = pc1[i] + sf[i]
        for s in range(0, n, chunk):
            d = np.linalg.norm(tgt[s:s + chunk, None, :]
                               - pc2[i, None, :, :], axis=-1)
            mins.append(d.min(axis=1))
        tot += float(np.concatenate(mins).mean())
    return tot / pc1.shape[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--eval-every", type=int, default=250)
    # reference trains Adam at 1e-4 (main.py:138-140); 1e-3 measurably
    # traps this model at the predict-zero saddle (flat EPE for 2000
    # steps, learning starts the moment the rate decays under ~3e-4)
    ap.add_argument("--lr", type=float, default=2e-4)
    # same code path either way; "cpu" gives learnability evidence when
    # the axon tunnel is down (site config ignores JAX_PLATFORMS=cpu env)
    ap.add_argument("--platform", default=None,
                    choices=(None, "cpu", "tpu"))
    ap.add_argument("--out", default=
                    "/root/repo/training_runs/synthetic_curve.json")
    # piecewise = the reference's decay style (main.py:156); cosine adds a
    # linear warmup + cosine floor for the longer TPU runs
    ap.add_argument("--schedule", default="piecewise",
                    choices=("piecewise", "cosine"))
    ap.add_argument("--warmup", type=int, default=500)
    ap.add_argument("--patches", type=int, default=300)
    # chunked long runs: --save-params at the end, --init-params to resume
    # (fresh Adam state; fine for the proof-of-life curves)
    ap.add_argument("--save-params", default=None)
    ap.add_argument("--init-params", default=None)
    # gradient-quality probe: train AND eval on the same N pairs; a healthy
    # training stack drives EPE to ~0 (memorization), any failure to do so
    # indicates a gradient defect rather than a task ceiling
    ap.add_argument("--overfit", type=int, default=0, metavar="N_PAIRS")
    ap.add_argument("--num-points", type=int, default=NUM_POINTS)
    # held-out-task scaling knobs (the 512-pair default plateaued at 0.54
    # on the 12-patch task; more data + a longer schedule push past it)
    ap.add_argument("--train-pairs", type=int, default=TRAIN_PAIRS)
    ap.add_argument("--val-pairs", type=int, default=VAL_PAIRS)
    # the flagship 7-scale model (SFM7 + bench capacities at 8192 points,
    # reusing the bench graph's compile cache; measured capacities
    # otherwise)
    ap.add_argument("--arch", default="HPLFlowNetShallow",
                    choices=("HPLFlowNetShallow", "HPLFlowNet"))
    args = ap.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from hplflownet_tpu.models import HPLFlowNet, HPLFlowNetShallow
    from hplflownet_tpu.pipeline import make_lattice_spec
    from hplflownet_tpu.lattice import build_pyramid
    from hplflownet_tpu.train.step import (make_train_step, make_eval_step,
                                           set_learning_rate)

    n_pts = args.num_points
    n_train = args.overfit or args.train_pairs
    tr1, tr2, trf = make_dataset(n_train, n_pts, seed=100,
                                 patches=args.patches)

    if args.arch == "HPLFlowNet":
        from bench import CAPACITIES as BENCH_CAPS, SFM7
        sfm = SFM7
        if n_pts == 8192:
            caps = BENCH_CAPS  # identical spec to bench => compile-cache hit
        else:
            from hplflownet_tpu.lattice.capacity import (
                measured_default_capacities)
            caps = measured_default_capacities(n_pts, SFM7)
    else:
        sfm = SFM5
        # capacities: measured worst counts on this distribution over both
        # splits at 1024 points (2853/2186/644/202/87), padded 1.2x and
        # 128-aligned; scaled proportionally for other point counts (vertex
        # count grows ~linearly in points on these surface clouds); the
        # per-step overflow counter in the log confirms zero degradation
        base_caps = [3456, 2688, 896, 256, 128]
        caps = [max(128, -(-int(c * n_pts / NUM_POINTS) // 128) * 128)
                for c in base_caps]
    spec = make_lattice_spec(sfm, capacities=caps)
    tr1, tr2, trf = resample_overflowing(spec, tr1, tr2, seed=100,
                                         patches=args.patches)
    if args.overfit:
        # memorization probe: evaluate on the training pairs themselves
        va1, va2, vaf = tr1, tr2, trf
        n_val = n_train
    else:
        va1, va2, vaf = make_dataset(args.val_pairs, n_pts, seed=999,
                                     patches=args.patches)
        va1, va2, vaf = resample_overflowing(spec, va1, va2, seed=999,
                                             patches=args.patches)
        n_val = args.val_pairs
    model_cls = HPLFlowNet if args.arch == "HPLFlowNet" else HPLFlowNetShallow
    model = model_cls(scales_filter_map=sfm, compute_dtype="bfloat16")

    ones = jnp.ones((1, n_pts), bool)
    # jitted setup: eager op-by-op dispatch through the axon tunnel is
    # pathologically slow (see __graft_entry__.entry)
    scales = jax.jit(lambda a, b: build_pyramid(spec, a, b))(
        jnp.asarray(tr1[0]), jnp.asarray(tr2[0]))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(tr1[0]),
                                 jnp.asarray(tr2[0]), scales)
    if args.init_params:
        import pickle
        with open(args.init_params, "rb") as fd:
            loaded = pickle.load(fd)
        params = jax.tree_util.tree_map(jnp.asarray, loaded)
        _log(f"resumed params from {args.init_params}")
    init_state, train_step = make_train_step(model, spec,
                                             learning_rate=args.lr)
    eval_step = make_eval_step(model, spec)
    state = init_state(params)

    def batch_of(a, b, f, i):
        return {"pc1": jnp.asarray(a[i:i + 1]), "pc2": jnp.asarray(b[i:i + 1]),
                "sf": jnp.asarray(f[i:i + 1]), "valid1": ones,
                "valid2": ones}

    def val_epe(params):
        tot = 0.0
        for i in range(n_val):
            loss, _ = eval_step(params, batch_of(va1, va2, vaf, i))
            tot += float(loss)
        return tot / n_val

    oracle = nn_oracle_epe(va1, va2, vaf)
    _log(f"NN-oracle EPE3D on the val split: {oracle:.4f}")
    t0 = time.time()
    epe0 = val_epe(state.params)
    _log(f"initial held-out EPE3D {epe0:.4f} "
         f"(eval compile {time.time() - t0:.0f}s)")
    curve = [{"step": 0, "val_epe3d": epe0}]

    rng = np.random.RandomState(0)
    order = rng.permutation(n_train)
    t0 = time.time()
    overflow_total = 0
    for step in range(1, args.steps + 1):
        i = int(order[step % n_train])
        state, loss, oflow = train_step.with_overflow(
            state, batch_of(tr1, tr2, trf, i))
        if step == 1:
            _log(f"train compile {time.time() - t0:.0f}s")
            t0 = time.time()
        overflow_total += int(oflow)
        if args.schedule == "cosine":
            t = min(1.0, step / args.warmup)
            frac = max(0.0, (step - args.warmup)
                       / max(args.steps - args.warmup, 1))
            lr = args.lr * t * (0.05 + 0.95 * 0.5
                                * (1 + np.cos(np.pi * frac)))
            state = set_learning_rate(state, float(lr))
        elif step in (3 * args.steps // 5, 4 * args.steps // 5):
            # piecewise decay keeps the tail converging (reference trains
            # with a piecewise-decaying schedule, main.py:156)
            state = set_learning_rate(
                state, args.lr * (0.3 if step == 3 * args.steps // 5
                                  else 0.1))
        if step % args.eval_every == 0:
            epe = val_epe(state.params)
            rate = args.eval_every / max(time.time() - t0, 1e-9)
            curve.append({"step": step, "val_epe3d": epe})
            _log(f"step {step:5d}  val EPE3D {epe:.4f} "
                 f"({epe / epe0:.3f}x initial)  {rate:.1f} steps/s  "
                 f"overflow {overflow_total}")
            t0 = time.time()

    os.makedirs("/root/repo/training_runs", exist_ok=True)
    out = {
        "model": args.arch, "platform": jax.default_backend(),
        "points": n_pts, "overfit": bool(args.overfit),
        "train_pairs": n_train, "val_pairs": n_val,
        "lr": args.lr, "steps": args.steps, "patches": args.patches,
        "schedule": args.schedule,
        "overflow_total": overflow_total,
        "nn_oracle_epe3d": oracle,
        "initial_val_epe3d": epe0,
        "final_val_epe3d": curve[-1]["val_epe3d"],
        "final_over_initial": curve[-1]["val_epe3d"] / epe0,
        "curve": curve,
    }
    if args.save_params:
        import pickle
        with open(args.save_params, "wb") as fd:
            pickle.dump(jax.tree_util.tree_map(np.asarray, state.params), fd)
        _log(f"params saved to {args.save_params}")
    path = args.out
    with open(path, "w") as fd:
        json.dump(out, fd, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("initial_val_epe3d", "final_val_epe3d",
                       "final_over_initial", "overflow_total")}))
    _log(f"curve written to {path}")


if __name__ == "__main__":
    main()
