"""Test harness config: run on CPU with 8 virtual devices for mesh tests.

NB: this environment presets ``jax_platforms=axon,cpu`` (TPU tunnel), which
overrides the JAX_PLATFORMS env var — so force CPU through jax.config.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
