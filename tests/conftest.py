"""Test bootstrap: force an 8-device virtual CPU mesh before JAX initializes.

Mirrors the multi-chip validation strategy: sharding/collective tests run on
CPU with xla_force_host_platform_device_count=8 (no TPU needed in CI).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# pytest plugins may have imported jax before this conftest ran; the backend
# initializes lazily, so forcing the platform via the config API still works.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
