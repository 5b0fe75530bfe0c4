"""HPLFlowNet: the full 7-scale scene-flow model.

Topology-parity rebuild of /root/reference/models/HPLFlowNet.py:11-430 on the
TPU-native ops: a 3-layer point MLP, a 7-scale splat-only BCL encoder over
both clouds, correlation BCLs at scales 3..7 chained coarse-ward, a slice-only
BCL decoder with skip concatenations, and a 3-layer prediction head.

Single-sample, channels-last; batch via ``jax.vmap``.  ``scales`` is the list
of per-scale lattice tables from :func:`hplflownet_tpu.lattice.build_pyramid`.
Submodule/parameter names mirror the reference module names 1:1 so torch
checkpoints can be ported mechanically (tools/port_torch_weights.py).
"""

from __future__ import annotations

from typing import Sequence

import jax
from flax import linen as nn
import jax.numpy as jnp

from ..lattice.offsets import filter_size, tap_negation
from ..ops.bcl import BilateralConv
from ..ops.corr import BilateralCorrelation
from .layers import PointMLP

__all__ = ["HPLFlowNet"]


def _concat(*xs):
    return jnp.concatenate(xs, axis=-1)


class HPLFlowNet(nn.Module):
    """Args mirror the reference's config surface (configs/train_ours.yaml)."""

    scales_filter_map: Sequence[Sequence[float]]
    dim: int = 3
    use_leaky: bool = True
    bcn_use_bias: bool = True
    bcn_use_norm: bool = True
    last_relu: bool = False
    compute_dtype: str = "float32"

    def setup(self):
        assert len(self.scales_filter_map) == 7, "HPLFlowNet needs 7 scales"
        d, d1 = self.dim, self.dim + 1
        sfm = self.scales_filter_map

        def fs(radius):
            return filter_size(int(radius), d)

        def bcn(scale_idx, widths, do_splat, name):
            return BilateralConv(
                widths=tuple(widths),
                filter_size=fs(sfm[scale_idx][1]),
                do_splat=do_splat,
                do_slice=not do_splat,
                tap_negation=tap_negation(int(sfm[scale_idx][1]), d),
                use_norm=self.bcn_use_norm,
                use_bias=self.bcn_use_bias,
                use_leaky=self.use_leaky,
                last_relu=self.last_relu,
                compute_dtype=self.compute_dtype,
                name=name,
            )

        def corr(scale_idx, prev_dim, name):
            return BilateralCorrelation(
                corr_widths=(32, 32),
                widths=(64, 64),
                corr_size=fs(sfm[scale_idx][3]),
                filter_size=fs(sfm[scale_idx][2]),
                corr_tap_negation=tap_negation(int(sfm[scale_idx][3]), d),
                prev_corr_dim=prev_dim,
                use_norm=self.bcn_use_norm,
                use_leaky=self.use_leaky,
                last_relu=self.last_relu,
                compute_dtype=self.compute_dtype,
                name=name,
            )

        self.conv1 = PointMLP(widths=(32, 32, 64), use_leaky=self.use_leaky,
                              compute_dtype=self.compute_dtype, name="conv1")

        # encoder (splat-only) / decoder (slice-only) widths follow
        # HPLFlowNet.py:26-232
        self.bcn1 = bcn(0, (64, 64), True, "bcn1")
        self.bcn2 = bcn(1, (64, 64), True, "bcn2")
        self.bcn3 = bcn(2, (64, 64), True, "bcn3")
        self.bcn4 = bcn(3, (64, 64), True, "bcn4")
        self.bcn5 = bcn(4, (64, 64), True, "bcn5")
        self.bcn6 = bcn(5, (64, 64), True, "bcn6")
        self.bcn7 = bcn(6, (64, 64), True, "bcn7")

        self.bcn7_back = bcn(6, (128, 128), False, "bcn7_")
        self.bcn6_back = bcn(5, (128, 128), False, "bcn6_")
        self.bcn5_back = bcn(4, (128, 128), False, "bcn5_")
        self.bcn4_back = bcn(3, (256, 256), False, "bcn4_")
        self.bcn3_back = bcn(2, (256, 256), False, "bcn3_")
        self.bcn2_back = bcn(1, (512, 512), False, "bcn2_")
        self.bcn1_back = bcn(0, (1024, 1024), False, "bcn1_")

        self.corr1 = corr(2, 0, "corr1")
        self.corr2 = corr(3, 64, "corr2")
        self.corr3 = corr(4, 64, "corr3")
        self.corr4 = corr(5, 64, "corr4")
        self.corr5 = corr(6, 64, "corr5")

        self.conv2 = PointMLP(widths=(1024,), use_leaky=self.use_leaky,
                              compute_dtype=self.compute_dtype, name="conv2")
        self.conv3 = PointMLP(widths=(512,), use_leaky=self.use_leaky,
                              compute_dtype=self.compute_dtype, name="conv3")
        self.conv4 = PointMLP(widths=(3,), last_act=False,
                              compute_dtype=self.compute_dtype, name="conv4")

    def __call__(self, pc1: jax.Array, pc2: jax.Array, scales) -> jax.Array:
        """pc1, pc2: (N, dim) points; scales: list of 7 ScalePair tables.

        Returns (N, 3) scene flow for pc1.
        """
        # el_minus_gr is builder data (f32); cast once so the wide decoder
        # concats stay in the compute dtype instead of promoting to f32
        dt = jnp.dtype(self.compute_dtype)

        def emg1(sp):
            return sp.pc1_el_minus_gr.astype(dt)

        feat1 = self.conv1(pc1)
        feat2 = self.conv1(pc2)

        def down(bcn_mod, sp, f1, f2):
            o1 = bcn_mod(_concat(emg1(sp), f1),
                         in_barycentric=sp.pc1_barycentric,
                         splat_plan=sp.pc1_splat_plan,
                         blur_neighbors=sp.pc1_blur_neighbors)
            o2 = bcn_mod(_concat(sp.pc2_el_minus_gr.astype(dt), f2),
                         in_barycentric=sp.pc2_barycentric,
                         splat_plan=sp.pc2_splat_plan,
                         blur_neighbors=sp.pc2_blur_neighbors)
            return o1, o2

        def correlate(corr_mod, sp, f1, f2, prev):
            return corr_mod(
                f1, f2, prev,
                barycentric1=sp.pc1_barycentric,
                splat_plan1=sp.pc1_splat_plan,
                pc1_corr_indices=sp.pc1_corr_indices,
                pc2_corr_uniq=sp.pc2_corr_uniq,
                pc2_corr_inverse=sp.pc2_corr_inverse,
                pc2_corr_uniq_inv=sp.pc2_corr_uniq_inv)

        pc1_out1, pc2_out1 = down(self.bcn1, scales[0], feat1, feat2)
        pc1_out2, pc2_out2 = down(self.bcn2, scales[1], pc1_out1, pc2_out1)
        pc1_out3, pc2_out3 = down(self.bcn3, scales[2], pc1_out2, pc2_out2)
        corr_out1 = correlate(self.corr1, scales[2], pc1_out3, pc2_out3, None)

        pc1_out4, pc2_out4 = down(self.bcn4, scales[3], pc1_out3, pc2_out3)
        corr_out2 = correlate(self.corr2, scales[3], pc1_out4, pc2_out4,
                              corr_out1)

        pc1_out5, pc2_out5 = down(self.bcn5, scales[4], pc1_out4, pc2_out4)
        corr_out3 = correlate(self.corr3, scales[4], pc1_out5, pc2_out5,
                              corr_out2)

        pc1_out6, pc2_out6 = down(self.bcn6, scales[5], pc1_out5, pc2_out5)
        corr_out4 = correlate(self.corr4, scales[5], pc1_out6, pc2_out6,
                              corr_out3)

        pc1_out7, pc2_out7 = down(self.bcn7, scales[6], pc1_out6, pc2_out6)
        corr_out5 = correlate(self.corr5, scales[6], pc1_out7, pc2_out7,
                              corr_out4)

        def up(bcn_mod, feats, blur_sp, out_sp):
            return bcn_mod(feats,
                           blur_neighbors=blur_sp.pc1_blur_neighbors,
                           out_barycentric=out_sp.pc1_barycentric,
                           out_lattice_offset=out_sp.pc1_lattice_offset,
                           out_splat_plan=out_sp.pc1_splat_plan)

        # decoder with skip concats (HPLFlowNet.py:372-423); blur happens on
        # scale s's lattice, slice lands on scale s's points (= scale s-1's
        # vertices)
        # emg1 casts to the compute dtype so these wide concats don't promote
        # their (bf16) feature inputs into f32 intermediates — BilateralConv
        # re-casts to dt first thing, so the rounding is identical either way
        out = up(self.bcn7_back, _concat(corr_out5, pc1_out7),
                 scales[6], scales[6])
        out = up(self.bcn6_back,
                 _concat(emg1(scales[6]), out, corr_out4, pc1_out6),
                 scales[5], scales[5])
        out = up(self.bcn5_back,
                 _concat(emg1(scales[5]), out, corr_out3, pc1_out5),
                 scales[4], scales[4])
        out = up(self.bcn4_back,
                 _concat(emg1(scales[4]), out, corr_out2, pc1_out4),
                 scales[3], scales[3])
        out = up(self.bcn3_back,
                 _concat(emg1(scales[3]), out, corr_out1, pc1_out3),
                 scales[2], scales[2])
        out = up(self.bcn2_back,
                 _concat(emg1(scales[2]), out, pc1_out2),
                 scales[1], scales[1])
        out = up(self.bcn1_back,
                 _concat(emg1(scales[1]), out, pc1_out1),
                 scales[0], scales[0])

        res = self.conv2(out)
        res = self.conv3(res)
        return self.conv4(res)
