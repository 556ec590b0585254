"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX-native way to exercise pjit/shard_map collectives without a
real TPU pod; single-chip numerics tests also run on CPU for speed and
determinism. (The environment pins JAX_PLATFORMS=axon, so we must override
via jax.config, not just the env var.)
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
