"""Weight-init dispatch (reference main_utils.py:33-50, main.py:100-101):
normal/xavier/kaiming/orthogonal schemes with gain, biases zeroed."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hplflownet_tpu.models.init import reinit_params, _fans


def make_params():
    rng = np.random.RandomState(0)
    return {
        "params": {
            "conv1": {
                "dense0_kernel": jnp.asarray(
                    rng.randn(64, 128).astype(np.float32)),
                "dense0_bias": jnp.asarray(
                    rng.randn(128).astype(np.float32)),
            },
            "bcn1": {
                "conv0_kernel": jnp.asarray(
                    rng.randn(15, 68, 64).astype(np.float32)),
                "conv0_bias": jnp.asarray(rng.randn(64).astype(np.float32)),
                "slice_bias": jnp.asarray(rng.randn(64).astype(np.float32)),
            },
        }
    }


def leaves(p):
    return {"/".join(str(k.key) for k in path): np.asarray(v)
            for path, v in jax.tree_util.tree_flatten_with_path(p)[0]}


def test_biases_zeroed_every_scheme():
    params = make_params()
    for scheme in ("normal", "xavier", "kaiming", "orthogonal"):
        out = leaves(reinit_params(jax.random.PRNGKey(1), params, scheme))
        for name, v in out.items():
            if name.endswith("bias"):
                np.testing.assert_array_equal(v, 0.0)
            else:
                assert np.abs(v).sum() > 0


def test_normal_gain_is_std():
    out = leaves(reinit_params(jax.random.PRNGKey(2), make_params(),
                               "normal", gain=0.02))
    k = out["params/conv1/dense0_kernel"]
    assert abs(k.std() - 0.02) < 0.003


def test_xavier_std_and_gain():
    out1 = leaves(reinit_params(jax.random.PRNGKey(3), make_params(),
                                "xavier", gain=1.0))
    out2 = leaves(reinit_params(jax.random.PRNGKey(3), make_params(),
                                "xavier", gain=2.0))
    # stencil kernel (15, 68, 64): fan_in = 68*15, fan_out = 64*15 (the
    # receptive axis counts into both fans, like torch Conv2d (Cout,Cin,15,1))
    fan_in, fan_out = _fans((15, 68, 64))
    assert (fan_in, fan_out) == (68 * 15, 64 * 15)
    expected = np.sqrt(2.0 / (fan_in + fan_out))
    k1 = out1["params/bcn1/conv0_kernel"]
    assert abs(k1.std() - expected) / expected < 0.1
    k2 = out2["params/bcn1/conv0_kernel"]
    np.testing.assert_allclose(k2, 2.0 * k1, rtol=1e-6)


def test_kaiming_std():
    out = leaves(reinit_params(jax.random.PRNGKey(4), make_params(),
                               "kaiming"))
    k = out["params/conv1/dense0_kernel"]
    expected = np.sqrt(2.0 / 64)
    assert abs(k.std() - expected) / expected < 0.1


def test_orthogonal_columns():
    out = leaves(reinit_params(jax.random.PRNGKey(5), make_params(),
                               "orthogonal", gain=3.0))
    k = out["params/bcn1/conv0_kernel"].reshape(-1, 64)  # (15*68, 64)
    gram = k.T @ k
    np.testing.assert_allclose(gram, 9.0 * np.eye(64), atol=1e-3)


def test_unknown_scheme_raises():
    with pytest.raises(NotImplementedError):
        reinit_params(jax.random.PRNGKey(0), make_params(), "lecun")


def test_config_rejects_unknown_init():
    from hplflownet_tpu.utils.config import Config, postprocess
    cfg = Config({"arch": "HPLFlowNetShallow",
                  "dataset": "FlyingThings3DSubset", "data_root": "/tmp",
                  "evaluate": False, "init": "lecun"})
    with pytest.raises(AssertionError, match="not implemented"):
        postprocess(cfg)
