"""Headless visualization export for evaluation dumps.

The reference renders with Mayavi interactively (visualization.py:25-106);
TPU hosts are headless, so this exports the same scene — pc1 (blue),
ground-truth warp pc1+sf (red), prediction pc1+flow (green), optionally pc2
(magenta) — as standard PLY point clouds any viewer (MeshLab, CloudCompare,
Open3D) can open, plus error-colored clouds.

Usage:
    python -m hplflownet_tpu.data.visualization VISU_DIR [--out-dir DIR]
(VISU_DIR = the ``visu_*`` directory written by evaluation with dump_visu.)
"""

from __future__ import annotations

import argparse
import os
import os.path as osp

import numpy as np

__all__ = ["write_ply", "export_scene", "main"]


def write_ply(path: str, points: np.ndarray, colors: np.ndarray | None = None):
    """Write an (N, 3) float cloud (+ optional (N, 3) uint8 colors) as PLY."""
    points = np.asarray(points, dtype=np.float32).reshape(-1, 3)
    n = len(points)
    has_color = colors is not None
    with open(path, "wb") as fd:
        header = ["ply", "format binary_little_endian 1.0",
                  f"element vertex {n}",
                  "property float x", "property float y", "property float z"]
        if has_color:
            header += ["property uchar red", "property uchar green",
                       "property uchar blue"]
        header.append("end_header")
        fd.write(("\n".join(header) + "\n").encode())
        if has_color:
            colors = np.asarray(colors, dtype=np.uint8).reshape(-1, 3)
            rec = np.zeros(n, dtype=[("xyz", np.float32, 3),
                                     ("rgb", np.uint8, 3)])
            rec["xyz"] = points
            rec["rgb"] = colors
            fd.write(rec.tobytes())
        else:
            fd.write(points.tobytes())


def _solid(n, rgb):
    return np.tile(np.asarray(rgb, np.uint8), (n, 1))


def export_scene(out_dir: str, idx: int, pc1, sf, flow, pc2=None):
    """Export one sample's clouds + an EPE-colored error cloud."""
    os.makedirs(out_dir, exist_ok=True)
    pc1 = np.asarray(pc1).reshape(-1, 3)
    sf = np.asarray(sf).reshape(-1, 3)
    flow = np.asarray(flow).reshape(-1, 3)

    write_ply(osp.join(out_dir, f"{idx:04d}_pc1.ply"), pc1,
              _solid(len(pc1), (64, 96, 255)))
    write_ply(osp.join(out_dir, f"{idx:04d}_gt.ply"), pc1 + sf,
              _solid(len(pc1), (255, 64, 64)))
    write_ply(osp.join(out_dir, f"{idx:04d}_pred.ply"), pc1 + flow,
              _solid(len(pc1), (64, 200, 64)))
    if pc2 is not None:
        pc2 = np.asarray(pc2).reshape(-1, 3)
        write_ply(osp.join(out_dir, f"{idx:04d}_pc2.ply"), pc2,
                  _solid(len(pc2), (200, 64, 200)))

    # error heat: green (0) -> red (>=0.3 m EPE)
    epe = np.linalg.norm(flow - sf, axis=-1)
    t = np.clip(epe / 0.3, 0, 1)
    colors = np.stack([255 * t, 255 * (1 - t), np.zeros_like(t)],
                      axis=-1).astype(np.uint8)
    write_ply(osp.join(out_dir, f"{idx:04d}_error.ply"), pc1 + flow, colors)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("visu_dir")
    ap.add_argument("--out-dir", default=None)
    args = ap.parse_args()
    out_dir = args.out_dir or osp.join(args.visu_dir, "ply")

    idx = 0
    count = 0
    while True:
        p = osp.join(args.visu_dir, f"pc1_{idx}.npy")
        if not osp.exists(p):
            break
        pc1 = np.load(p)
        sf = np.load(osp.join(args.visu_dir, f"sf_{idx}.npy"))
        flow = np.load(osp.join(args.visu_dir, f"output_{idx}.npy"))
        pc2_path = osp.join(args.visu_dir, f"pc2_{idx}.npy")
        pc2 = np.load(pc2_path) if osp.exists(pc2_path) else None
        for b in range(pc1.shape[0]):
            export_scene(out_dir, count, pc1[b], sf[b], flow[b],
                         None if pc2 is None else pc2[b])
            count += 1
        idx += 1
    print(f"exported {count} scenes to {out_dir}")


if __name__ == "__main__":
    main()
