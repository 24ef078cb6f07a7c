"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (SURVEY §4: the reference has no test layer at
all; we test against a pure-NumPy oracle).
"""

import os

# Force the CPU backend (the ambient environment pins JAX_PLATFORMS to the
# TPU platform): tests must be deterministic and need 8 virtual devices.
# Set HUFFMAN_TPU_TEST_PLATFORM to run the suite on another platform.
_platform = os.environ.get("HUFFMAN_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Plugins (jaxtyping) import jax before this conftest runs, so the env var
# alone is read too late; override through the config API as well.
import jax

jax.config.update("jax_platforms", _platform)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
