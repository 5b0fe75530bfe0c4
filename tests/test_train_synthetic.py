"""Learnability-harness pieces that are cheap enough for the fast tier.

The 6000-step run itself is an offline artifact (training_runs/); here we
cover the input-validation logic: pairs whose lattice build would degrade
(any overflow counter nonzero) are resampled, and impossible budgets fail
loudly instead of spinning.  The slow tier adds a miniature memorization
probe: overfitting a couple of pairs must drive EPE far toward zero — a
gradient-quality defect that merely *slows* learning fails this hard bar
(the full-scale evidence is training_runs/synthetic_overfit12.json:
12 pairs -> EPE < 0.02 absolute on the TPU).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from hplflownet_tpu.pipeline import make_lattice_spec
from tools.train_synthetic import SFM5, make_dataset, resample_overflowing

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_resample_passes_clean_pairs_through():
    spec = make_lattice_spec(SFM5, capacities=[3456, 2688, 896, 256, 128])
    pc1, pc2, _ = make_dataset(4, 256, seed=5, patches=12)
    keep1, keep2 = pc1.copy(), pc2.copy()
    out1, out2, flow = resample_overflowing(spec, pc1, pc2, seed=5,
                                            patches=12)
    np.testing.assert_array_equal(out1, keep1)
    np.testing.assert_array_equal(out2, keep2)
    np.testing.assert_allclose(flow, out2 - out1)


@pytest.mark.slow
def test_overfit_probe_memorizes(tmp_path):
    """The real harness CLI overfitting 2 tiny pairs must descend steeply.

    Fresh subprocess (the harness forces its own platform); 300 steps at
    256 points is enough for a >4x EPE drop on a healthy training stack —
    the 0.25 bar is deliberately loose so flakiness can't creep in, but
    tight enough that a broken gradient (flat curve) fails."""
    out = tmp_path / "overfit.json"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/train_synthetic.py"),
         "--platform", "cpu", "--overfit", "2", "--num-points", "256",
         "--patches", "12", "--steps", "300", "--eval-every", "100",
         "--lr", "3e-4", "--schedule", "cosine", "--warmup", "50",
         "--out", str(out)],
        capture_output=True, text=True, timeout=1500, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]
    res = json.load(open(out))
    assert res["overflow_total"] == 0
    assert res["final_over_initial"] < 0.25, res


def test_resample_raises_on_impossible_budgets():
    # 256 points cannot fit scale-0 capacity 128 vertices at patches=300
    # (spread-out clouds occupy >1 vertex per ~2 points): every redraw
    # overflows and the guard must fire rather than loop forever
    spec = make_lattice_spec(SFM5, capacities=[128, 128, 128, 128, 128])
    pc1, pc2, _ = make_dataset(1, 256, seed=3, patches=300)
    with pytest.raises(RuntimeError, match="redraws all overflow"):
        resample_overflowing(spec, pc1, pc2, seed=3, patches=300)
