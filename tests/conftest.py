"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so sharding paths are
exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; bench.py runs on the real chip).

Note: the axon TPU plugin ignores the JAX_PLATFORMS env var, so we force
the platform via jax.config before any test imports jax arrays.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "largemodel: needs real model weights")
    config.addinivalue_line("markers", "unittest: pure unit test, no backend")
    config.addinivalue_line(
        "markers",
        "slow: heavy model/parity/e2e suite; `pytest -m 'not slow'` is the "
        "fast core subset (<4 min)")
