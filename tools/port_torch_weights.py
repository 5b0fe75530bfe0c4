#!/usr/bin/env python3
"""Port a reference PyTorch checkpoint (ours.pth.tar) into our param pytree.

Layout mapping (channels-last, stencil-tap-major):

  torch Conv1d (out, in, 1)          -> dense{i}_kernel (in, out)
  torch Conv2d (out, in, F, 1)       -> conv0_kernel / blur0_kernel (F, in, out)
  torch Conv2d (out, in, 1, 1)       -> conv{i}_kernel (in, out)
  torch Conv3d (out, in, 1, Cc, 1)   -> corr0_kernel (Cc, in, out)
  torch Conv3d (out, in, 1, 1, 1)    -> corr{i}_kernel (in, out)
  BilateralConvFlex.bias             -> slice_bias

Module-name mapping is 1:1 (conv1..conv4, bcn1..bcn7, bcn1_..bcn7_,
corr1..corr5, corr*_refine); reference checkpoints are DataParallel-wrapped
("module." prefix, main.py:104).

Usage:
    python tools/port_torch_weights.py ours.pth.tar out_params.msgpack \
        [--arch HPLFlowNet]
"""

from __future__ import annotations

import argparse
import re

import numpy as np

SFM7 = [[3.0, 1, -1, -1], [2.0, 1, -1, -1], [1.0, 1, 1, 1],
        [0.5, 1, 1, 1], [0.25, 1, 1, 1], [0.125, 1, 1, 1],
        [0.0625, 1, 1, 1]]
SFM5 = SFM7[2:]


def convert_weight(w: np.ndarray) -> np.ndarray:
    """torch conv weight -> our kernel layout."""
    w = np.asarray(w)
    if w.ndim == 3:                       # Conv1d (out, in, 1)
        assert w.shape[2] == 1
        return w[:, :, 0].T
    if w.ndim == 4:                       # Conv2d (out, in, F, 1)
        assert w.shape[3] == 1
        if w.shape[2] == 1:
            return w[:, :, 0, 0].T
        return np.transpose(w[:, :, :, 0], (2, 1, 0))   # (F, in, out)
    if w.ndim == 5:                       # Conv3d (out, in, 1, Cc, 1)
        assert w.shape[2] == 1 and w.shape[4] == 1
        if w.shape[3] == 1:
            return w[:, :, 0, 0, 0].T
        return np.transpose(w[:, :, 0, :, 0], (2, 1, 0))  # (Cc, in, out)
    raise ValueError(f"unexpected weight shape {w.shape}")


def port_state_dict(state_dict: dict) -> dict:
    """torch state dict -> nested flax params dict {'params': {...}}."""
    params: dict = {}

    def put(path, value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value, dtype=np.float32)

    for name, tensor in state_dict.items():
        name = re.sub(r"^module\.", "", name)
        t = np.asarray(tensor)
        parts = name.split(".")
        mod = parts[0]

        if mod.startswith("conv") and "composed_module" in name:
            # convN.composed_module.0.weight  or  convN.N.composed_module...
            # point MLPs: conv1.0.composed_module.0.weight
            idx = int(parts[1]) if parts[1].isdigit() else 0
            kind = parts[-1]
            key = f"dense{idx}_{'kernel' if kind == 'weight' else 'bias'}"
            put((mod, key), convert_weight(t) if kind == "weight" else t)
        elif mod.startswith("conv") and parts[1] in ("weight", "bias"):
            # plain nn.Conv1d head (conv4)
            kind = parts[1]
            key = f"dense0_{'kernel' if kind == 'weight' else 'bias'}"
            put((mod, key), convert_weight(t) if kind == "weight" else t)
        elif "_refine" in mod:
            idx = int(parts[1])
            kind = parts[-1]
            key = f"dense{idx}_{'kernel' if kind == 'weight' else 'bias'}"
            put((mod, key), convert_weight(t) if kind == "weight" else t)
        elif mod.startswith("bcn"):
            flax_mod = mod  # bcn1 / bcn1_
            if parts[1] == "bias":
                put((flax_mod, "slice_bias"), t)
                continue
            assert parts[1] == "blur_conv"
            idx = int(parts[2])
            kind = parts[-1]
            key = f"conv{idx}_{'kernel' if kind == 'weight' else 'bias'}"
            put((flax_mod, key), convert_weight(t) if kind == "weight" else t)
        elif mod.startswith("corr"):
            stack = parts[1]          # corr_conv | blur_conv
            idx = int(parts[2])
            kind = parts[-1]
            prefix = "corr" if stack == "corr_conv" else "blur"
            key = f"{prefix}{idx}_{'kernel' if kind == 'weight' else 'bias'}"
            put((mod, key), convert_weight(t) if kind == "weight" else t)
        elif "feat_indices" in name or "out_indices" in name or \
                "feat1_indices" in name:
            continue  # index buffers, not parameters
        else:
            raise ValueError(f"unmapped parameter {name}")

    return {"params": params}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("out")
    ap.add_argument("--arch", default="HPLFlowNet")
    args = ap.parse_args()

    import torch
    from flax import serialization

    ckpt = torch.load(args.checkpoint, map_location="cpu")
    state_dict = ckpt.get("state_dict", ckpt)
    state_dict = {k: v.numpy() for k, v in state_dict.items()}
    params = port_state_dict(state_dict)

    with open(args.out, "wb") as fd:
        fd.write(serialization.to_bytes(params))
    n = sum(v.size for v in
            __import__("jax").tree_util.tree_leaves(params))
    print(f"ported {n / 1e6:.2f}M params -> {args.out}")


if __name__ == "__main__":
    main()
