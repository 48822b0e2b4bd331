"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices (SURVEY.md §4.4: distributed
testing without a cluster). The environment's sitecustomize force-registers
the TPU plugin and overrides JAX_PLATFORMS, so the platform must be forced
back via jax.config *before any backend initialization* — hence this
module-level block.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
