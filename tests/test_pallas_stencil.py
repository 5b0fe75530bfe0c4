"""Interpret-mode correctness of the fused Pallas stencil kernel.

The TPU-compiled path is exercised by bench.py / the driver on real
hardware; here the same kernel runs under the Pallas interpreter on CPU and
must match a dense reference bit-for-bit-ish (f32 matmul tolerance), both on
the fast (windows fit) path and through the XLA fallback.
"""

import numpy as np
import jax
import jax.numpy as jnp

from hplflownet_tpu.ops.pallas_stencil import stencil_gather_matmul


def _ref(table, nb, kern):
    h, _ = table.shape
    out = np.zeros((nb.shape[1], kern.shape[2]), np.float32)
    for f in range(nb.shape[0]):
        ok = nb[f] >= 0
        out[ok] += table[nb[f][ok]] @ kern[f]
    return out


def _mk(rng, H, F, C, CO, drift):
    table = rng.randn(H, C).astype(np.float32)
    nb = np.stack([
        np.sort(np.clip(np.arange(H) + rng.randint(-drift, drift, H),
                        0, H - 1))
        for _ in range(F)]).astype(np.int32)
    nb = np.where(rng.rand(F, H) < 0.1, -1, nb).astype(np.int32)
    kern = (rng.randn(F, C, CO) * 0.1).astype(np.float32)
    return table, nb, kern


def test_stencil_kernel_tight_spans_exact():
    rng = np.random.RandomState(0)
    table, nb, kern = _mk(rng, 3000, 15, 68, 64, drift=40)
    got = np.asarray(jax.jit(
        lambda t, n, k: stencil_gather_matmul(t, n, k, interpret=True)
    )(table, nb, kern))
    np.testing.assert_allclose(got, _ref(table, nb, kern), atol=2e-3)


def test_stencil_kernel_wide_spans_fall_back():
    rng = np.random.RandomState(1)
    table, _, kern = _mk(rng, 3000, 15, 68, 64, drift=40)
    # fully random (non-monotone) rows: spans blow past any window
    nb = np.sort(rng.randint(0, 3000, (15, 3000)), axis=1).astype(np.int32)
    nb[:, ::7] = -1
    nb = np.ascontiguousarray(nb)
    got = np.asarray(jax.jit(
        lambda t, n, k: stencil_gather_matmul(t, n, k, interpret=True)
    )(table, nb, kern))
    np.testing.assert_allclose(got, _ref(table, nb, kern), atol=2e-3)


def test_stencil_kernel_small_table():
    rng = np.random.RandomState(2)
    table, nb, kern = _mk(rng, 200, 15, 20, 16, drift=10)
    got = np.asarray(jax.jit(
        lambda t, n, k: stencil_gather_matmul(t, n, k, interpret=True)
    )(table, nb, kern))
    np.testing.assert_allclose(got, _ref(table, nb, kern), atol=2e-3)
