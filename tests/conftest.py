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
# Opt out with RT_TPU_TEST_PLATFORM=native to run the suite on real hardware.
if os.environ.get("RT_TPU_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
    # The config update is silently ignored if something already initialized
    # the backend (e.g. a pre-importing sitecustomize touched jax.devices()).
    # Fail fast rather than running "CPU" tests on a surprise hardware plugin.
    assert jax.default_backend() == "cpu" and len(jax.devices()) == 8, (
        f"test harness expected 8 virtual CPU devices but got "
        f"{len(jax.devices())}x {jax.default_backend()!r} — the JAX backend "
        f"was initialized before conftest could pin it to CPU")

# float64 available for oracle-grade tests (device code stays f32 by default)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running golden/scale tests")


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
