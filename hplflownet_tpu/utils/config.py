"""YAML config system (reference: cmd_args.py + utils/easydict.py).

Accepts the reference's config schema (configs/*.yaml) unchanged, plus the
TPU-specific extensions:

* ``lattice_capacities``: per-scale static vertex capacities (list[int])
* ``batch_size`` > 1 is actually supported here
* ``mesh_shape`` / ``mesh_axes`` for multi-chip sharding
* ``matmul_precision``: "default" (bf16 inputs, fastest) or "highest"
"""

from __future__ import annotations

import numpy as np
import yaml

__all__ = ["Config", "parse_args_from_yaml", "postprocess"]

MODEL_NAMES = ("HPLFlowNet", "HPLFlowNetShallow")
DATASET_NAMES = ("FlyingThings3DSubset", "KITTI")


class Config(dict):
    """Attribute-access dict; nested dicts/lists are wrapped recursively."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        d = dict(d or {}, **kwargs)
        for k, v in d.items():
            self[k] = v

    @staticmethod
    def _wrap(v):
        if isinstance(v, dict) and not isinstance(v, Config):
            return Config(v)
        if isinstance(v, (list, tuple)):
            return type(v)(Config._wrap(x) for x in v)
        return v

    def __setitem__(self, k, v):
        super().__setitem__(k, Config._wrap(v))

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    def get_or(self, k, default):
        return self[k] if k in self else default


def postprocess(args: Config) -> Config:
    """Validation + normalization (reference: cmd_args.py:23-56)."""
    args.allow_less_points = bool(args.get_or("allow_less_points", False))

    assert args.arch in MODEL_NAMES, f"unknown arch {args.arch}"
    assert args.dataset in DATASET_NAMES, f"unknown dataset {args.dataset}"
    assert "data_root" in args, "config must set data_root"

    if not args.evaluate:
        args.init = args.get_or("init", "xavier")
        args.gain = float(args.get_or("gain", 1.0))
        # honored by models.init.reinit_params (reference main_utils.py:33-50)
        assert args.init in ("normal", "xavier", "kaiming", "orthogonal"), \
            f"initialization method [{args.init}] is not implemented"

        if args.get_or("custom_lr", False):
            # reference stores these reversed; we keep ascending order
            lrs = [float(x) for x in str(args.lrs).split(",")]
            switches = [int(x) for x in str(args.lr_switch_epochs).split(",")]
            assert len(lrs) == len(switches)
            assert (np.diff(switches) > 0).all(), "switch epochs must ascend"
            args.lrs = lrs
            args.lr_switch_epochs = switches
            args.lr = lrs[0]

    if args.evaluate:
        assert args.get_or("resume", False), "evaluation requires resume"

    args.dim = int(args.get_or("dim", 3))
    args.batch_size = int(args.get_or("batch_size", 1))
    args.matmul_precision = args.get_or("matmul_precision", "default")
    return args


def parse_args_from_yaml(yaml_path: str) -> Config:
    with open(yaml_path) as fd:
        raw = yaml.safe_load(fd)
    return postprocess(Config(raw))
