"""Test configuration: run on CPU with 8 virtual devices.

This is the standard way to test pjit/shard_map code without a TPU pod: the
XLA host platform is forced to expose 8 devices so multi-chip sharding logic
compiles and executes in CI.

Note: this container pre-imports jax at interpreter startup (sitecustomize
registers the TPU PJRT plugin), so plain env-var exports in conftest are too
late for JAX_PLATFORMS. jax.config.update("jax_platforms", ...) before the
first backend use still works, and XLA_FLAGS is read at CPU-client creation.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Geometry tests need f32 matmuls, not bf16 passes.
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
