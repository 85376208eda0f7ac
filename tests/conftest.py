"""Test harness: run on CPU with 8 virtual devices so multi-chip sharding is
exercised without TPU hardware (SURVEY.md §4 'multi-host tests without a
cluster')."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment may pre-import jax with JAX_PLATFORMS pinned to a hardware
# plugin (sitecustomize); a plain env setdefault is too late by then. Override
# through the config API so the suite always runs on the 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

# float64 available for oracle-grade tests (device code stays f32 by default)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
