"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the TPU-world replacement for the reference's missing distributed
test story (SURVEY.md §4): multi-chip sharding is validated on
xla_force_host_platform_device_count=8 CPU devices.
"""

import os

# Force CPU: the test suite validates numerics and multi-device sharding on
# a virtual 8-device CPU mesh. Set LAVT_TEST_TPU=1 to run on real hardware.
# Note: the axon PJRT sitecustomize force-sets jax_platforms='axon,cpu' via
# jax.config at interpreter boot, so the env var alone is not enough — we
# must override the config value before the first backend initialization.
if not os.environ.get("LAVT_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
