"""Test config: run on a virtual 8-device CPU mesh so sharding paths are
exercised without TPU hardware.

NOTE: this image pre-imports jax at interpreter startup (a site hook), so
setting JAX_PLATFORMS via os.environ here is too late — we must go through
jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
