"""Test harness: CPU-only JAX with 8 virtual devices for sharding tests.

The axon TPU plugin in this image ignores the JAX_PLATFORMS env var, so the
platform must be forced through jax.config before any backend use. XLA_FLAGS
must still be set before jax initializes its CPU client.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", jax.devices()
