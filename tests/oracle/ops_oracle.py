"""Loop-based numpy oracles for the BCL / correlation ops.

These implement the *semantics* of the reference ops
(/root/reference/models/bilateralNN.py, bnn_flow.py) directly from their
mathematical definition, unvectorized, as golden references for the JAX ops.
"""

from __future__ import annotations

import numpy as np


def leaky(x, rate=0.1):
    return np.where(x >= 0, x, rate * x)


def splat_np(features, bary, offsets, capacity, normalize=True, eps=1e-5):
    n, c = features.shape
    d1 = bary.shape[1]
    out = np.zeros((capacity + 1, c), dtype=np.float64)
    density = np.zeros(capacity + 1, dtype=np.float64)
    for i in range(n):
        for r in range(d1):
            j = offsets[i, r] + 1
            out[j] += features[i] * bary[i, r]
            density[j] += bary[i, r]
    if normalize:
        out = out * (1.0 / (density + eps))[:, None]
    return out


def blur_np(splatted_pad, neighbors, kernel, bias):
    h, f = neighbors.shape
    out = np.zeros((h, kernel.shape[-1]), dtype=np.float64)
    for i in range(h):
        acc = bias.astype(np.float64).copy()
        for t in range(f):
            acc = acc + splatted_pad[neighbors[i, t] + 1] @ kernel[t]
        out[i] = acc
    return out


def slice_np(blurred, bary, offsets):
    n, d1 = bary.shape
    out = np.zeros((n, blurred.shape[-1]), dtype=np.float64)
    for i in range(n):
        for r in range(d1):
            if bary[i, r] != 0.0 or offsets[i, r] >= 0:
                j = max(offsets[i, r], 0)
                out[i] += bary[i, r] * blurred[j]
    return out


def corr_np(feat1, feat2, prev_splatted_pad, pc1_corr, pc2_corr,
            corr_kernel, corr_bias, extra_corr, blur_kernel, blur_bias,
            extra_blur, last_relu=False, rate=0.1):
    """Patch correlation + displacement filtering, reference channel order.

    prev_splatted_pad: (H1+1, prev) or None.
    corr_kernel: (Cc, prev + 2C, wc0) — input channels ordered
    [prev, feat1, feat2] like the reference concat (bnn_flow.py:168,199).
    """
    h1, c = feat1.shape
    nf, _, cc = pc2_corr.shape
    pad1 = np.concatenate([np.zeros((1, c)), feat1], axis=0)
    pad2 = np.concatenate([np.zeros((1, c)), feat2], axis=0)
    if prev_splatted_pad is not None:
        combined1 = np.concatenate([prev_splatted_pad, pad1], axis=-1)
    else:
        combined1 = pad1

    wc_last = extra_corr[-1][0].shape[-1] if extra_corr else corr_kernel.shape[-1]
    correlated = np.zeros((nf, h1, wc_last), dtype=np.float64)
    for f in range(nf):
        for i in range(h1):
            acc = corr_bias.astype(np.float64).copy()
            for k in range(cc):
                patch1 = combined1[pc1_corr[i, k] + 1]
                patch2 = pad2[pc2_corr[f, i, k] + 1]
                both = np.concatenate([patch1, patch2])
                acc = acc + both @ corr_kernel[k]
            y = leaky(acc, rate)
            for wk, wb in extra_corr:
                y = leaky(y @ wk + wb, rate)
            correlated[f, i] = y

    out = np.zeros((h1, blur_kernel.shape[-1]), dtype=np.float64)
    for i in range(h1):
        acc = blur_bias.astype(np.float64).copy()
        for f in range(nf):
            acc = acc + correlated[f, i] @ blur_kernel[f]
        out[i] = acc
    nlayers = 1 + len(extra_blur)
    if nlayers > 1 or last_relu:
        out = leaky(out, rate)
    for j, (wk, wb) in enumerate(extra_blur, start=1):
        out = out @ wk + wb
        if j < nlayers - 1 or last_relu:
            out = leaky(out, rate)
    return out
