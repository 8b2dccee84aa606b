"""Test configuration: force an 8-virtual-device CPU platform BEFORE jax import so
multi-chip sharding tests run anywhere (the driver separately dry-runs the real
multi-chip path via __graft_entry__.dryrun_multichip)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin in this image overrides JAX_PLATFORMS from the environment;
# forcing via the config API wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
