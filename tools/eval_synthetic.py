#!/usr/bin/env python3
"""Evaluate saved params through the REAL driver eval path on synthetic data.

Bridges a `tools/train_synthetic.py --save-params` pickle into the full
config-driven evaluation stack (`train/driver.py:evaluate` — the reference's
evaluation_bnn.py protocol): writes a synthetic val set in the on-disk
FT3D-subset layout, converts the params into an Orbax checkpoint, and runs
`driver.run` with `evaluate: true`, producing all 6 metrics
(EPE3D/ACC3DS/ACC3DR/Outliers3D/EPE2D/ACC2D) plus visu dumps.

Usage (TPU):
    python tools/eval_synthetic.py --params training_runs/full7_params.pkl \
        [--arch HPLFlowNet] [--num-points 8192] [--pairs 32] [--patches 12]

Writes the metrics JSON to training_runs/<out>.
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import pickle
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import CAPACITIES, SFM7, synthetic_frustum_clouds, _log

SFM5 = [[1.0, 1, 1, 1], [0.5, 1, 1, 1], [0.25, 1, 1, 1],
        [0.125, 1, 1, 1], [0.0625, 1, 1, 1]]


def write_ft3d_layout(root, n_pairs, n_points, seed, patches):
    """Synthetic val pairs in the processed-FT3D on-disk layout; the loader
    flips x/z signs (data/datasets.py), so pre-flip like the reference's
    preprocessing output."""
    base = osp.join(root, "FlyingThings3D_subset_processed_35m")
    pc1, pc2 = synthetic_frustum_clouds(n_pairs, n_points, seed=seed,
                                        flow_scale=1.0, patches=patches)
    for split, count in (("train", 1), ("val", n_pairs)):
        for i in range(count):
            d = osp.join(base, split, f"{i:07d}")
            os.makedirs(d, exist_ok=True)
            for pc, name in ((pc1[i], "pc1"), (pc2[i], "pc2")):
                out = pc.copy()
                out[:, 0] *= -1
                out[:, 2] *= -1
                np.save(osp.join(d, f"{name}.npy"), out)
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", required=True)
    ap.add_argument("--arch", default="HPLFlowNet",
                    choices=("HPLFlowNet", "HPLFlowNetShallow"))
    ap.add_argument("--num-points", type=int, default=8192)
    ap.add_argument("--pairs", type=int, default=32)
    ap.add_argument("--patches", type=int, default=12)
    ap.add_argument("--workdir", default="/tmp/eval_synth")
    ap.add_argument("--out", default="training_runs/full7_eval_metrics.json")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from hplflownet_tpu.utils.config import Config, postprocess
    from hplflownet_tpu.train.checkpoint import CheckpointIO
    from hplflownet_tpu.train.step import create_train_state
    from hplflownet_tpu.train import driver

    os.makedirs(args.workdir, exist_ok=True)
    data_root = osp.join(args.workdir, "data")
    write_ft3d_layout(data_root, args.pairs, args.num_points, seed=999,
                      patches=args.patches)
    _log(f"wrote {args.pairs} val pairs under {data_root}")

    with open(args.params, "rb") as fd:
        params = jax.tree_util.tree_map(jnp.asarray, pickle.load(fd))
    ckpt_src = osp.join(args.workdir, "ckpt_src")
    io = CheckpointIO(ckpt_src)
    io.save(create_train_state(params), epoch=1, min_loss=float("inf"),
            is_best=False)
    _log(f"params converted to Orbax checkpoint at {ckpt_src}")

    sfm = SFM7 if args.arch == "HPLFlowNet" else SFM5
    caps = (CAPACITIES if (args.arch == "HPLFlowNet"
                           and args.num_points == 8192)
            else None)
    cfg = Config({
        "ckpt_dir": osp.join(args.workdir, "ckpt_eval"),
        "data_root": data_root,
        "resume": ckpt_src,
        "evaluate": True,
        "arch": args.arch,
        "dataset": "FlyingThings3DSubset",
        "full": True,
        "strict": False,
        "allow_less_points": True,
        "batch_size": 1,
        "num_points": args.num_points,
        "scales_filter_map": sfm,
        "dim": 3,
        "data_process": {"DEPTH_THRESHOLD": 35.0, "NO_CORR": False},
        "compute_dtype": "bfloat16",
        "print_freq": 8,
        "workers": 2,
        "dump_visu": True,
        **({"lattice_capacities": caps} if caps else {}),
    })
    metrics = driver.run(postprocess(cfg))
    out = {"arch": args.arch, "num_points": args.num_points,
           "pairs": args.pairs, "patches": args.patches,
           "params": args.params, **metrics}
    with open(args.out, "w") as fd:
        json.dump(out, fd, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
