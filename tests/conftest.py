"""Test configuration: force CPU JAX with 8 virtual devices so multi-chip
sharding paths compile and execute without TPU hardware."""

import os

# Force CPU: the session env points JAX at the axon TPU tunnel
# (JAX_PLATFORMS=axon), which is reserved for bench.py runs.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0xD0C0D0)
