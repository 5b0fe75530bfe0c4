"""Learnability-harness pieces that are cheap enough for the fast tier.

The 6000-step run itself is an offline artifact (training_runs/); here we
cover the input-validation logic: pairs whose lattice build would degrade
(any overflow counter nonzero) are resampled, and impossible budgets fail
loudly instead of spinning.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from hplflownet_tpu.pipeline import make_lattice_spec
from tools.train_synthetic import SFM5, make_dataset, resample_overflowing


def test_resample_passes_clean_pairs_through():
    spec = make_lattice_spec(SFM5, capacities=[3456, 2688, 896, 256, 128])
    pc1, pc2, _ = make_dataset(4, 256, seed=5, patches=12)
    keep1, keep2 = pc1.copy(), pc2.copy()
    out1, out2, flow = resample_overflowing(spec, pc1, pc2, seed=5,
                                            patches=12)
    np.testing.assert_array_equal(out1, keep1)
    np.testing.assert_array_equal(out2, keep2)
    np.testing.assert_allclose(flow, out2 - out1)


def test_resample_raises_on_impossible_budgets():
    # 256 points cannot fit scale-0 capacity 128 vertices at patches=300
    # (spread-out clouds occupy >1 vertex per ~2 points): every redraw
    # overflows and the guard must fire rather than loop forever
    spec = make_lattice_spec(SFM5, capacities=[128, 128, 128, 128, 128])
    pc1, pc2, _ = make_dataset(1, 256, seed=3, patches=300)
    with pytest.raises(RuntimeError, match="redraws all overflow"):
        resample_overflowing(spec, pc1, pc2, seed=3, patches=300)
