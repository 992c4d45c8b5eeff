"""Test configuration: force CPU JAX with 8 virtual devices so multi-chip
sharding paths compile and execute without TPU hardware."""

import os

# jax is PRELOADED at interpreter startup in this environment (axon TPU
# plugin), so setting JAX_PLATFORMS in os.environ here is too late — the
# config already captured "axon". Update the live config instead;
# XLA_FLAGS is still read lazily at first backend creation.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0xD0C0D0)
