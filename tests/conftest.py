"""Test harness config.

Tests run on a virtual 8-device CPU mesh so that all pjit/shard_map sharding
paths are exercised without TPU hardware (the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).

NOTE: in this image a sitecustomize imports jax at interpreter boot with
JAX_PLATFORMS=axon (real TPU), so the env var is already latched; we must use
jax.config.update("jax_platforms", ...) instead, which works because backends
initialise lazily. XLA_FLAGS is read at CPU-backend init, which also hasn't
happened yet when conftest runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
