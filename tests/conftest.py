"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The axon TPU plugin in this image overrides the JAX_PLATFORMS env var, so we
force the CPU backend through jax.config before any device is touched.
Multi-chip sharding tests use the 8 virtual CPU devices; the driver separately
dry-runs the multi-chip path via __graft_entry__.dryrun_multichip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
