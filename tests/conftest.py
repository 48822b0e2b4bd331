"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices (SURVEY.md §4.4: distributed
testing without a cluster) — the env vars must be set before JAX picks a
backend, hence this module-level block.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
