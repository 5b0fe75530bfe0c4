#!/usr/bin/env python3
"""Measure true per-scale lattice vertex counts on a dataset.

Static capacities trade memory for the reference's dynamic hash counts
(SURVEY.md section 7 hard part 1); this tool probes real data so configs can
set tight `lattice_capacities`.

Usage:
    python tools/measure_capacities.py configs/train_ours.yaml \
        [--num-batches 16] [--slack 1.3]
"""

from __future__ import annotations

import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--num-batches", type=int, default=16)
    ap.add_argument("--slack", type=float, default=1.3)
    ap.add_argument("--align", type=int, default=256)
    args_cli = ap.parse_args()

    from hplflownet_tpu.utils.config import parse_args_from_yaml
    from hplflownet_tpu.utils.logging import Logger
    from hplflownet_tpu.data import DATASETS, ProcessData, BatchLoader
    from hplflownet_tpu.train.driver import measure_capacities_from_loader

    args = parse_args_from_yaml(args_cli.config)
    ds_kwargs = dict(num_points=args.num_points, data_root=args.data_root)
    if args.dataset == "KITTI":
        ds_kwargs["remove_ground"] = bool(args.get_or("remove_ground", True))
    transform = ProcessData(args.data_process, args.num_points,
                            args.allow_less_points)
    dataset = DATASETS[args.dataset](train=False, transform=transform,
                                     **ds_kwargs)
    loader = BatchLoader(dataset, args.batch_size, shuffle=False,
                         drop_last=False)
    caps = measure_capacities_from_loader(
        args.scales_filter_map, loader, num_batches=args_cli.num_batches,
        slack=args_cli.slack, align=args_cli.align, dim=args.dim)
    print("lattice_capacities:", caps)
    return caps


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
