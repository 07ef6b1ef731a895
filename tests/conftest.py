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


@pytest.fixture(autouse=True, scope="session")
def _protect_package_lang_cache():
    """The engine falls back to the package-level LLM cache
    (dream2real_tpu/lang/cache.json — the hermetic demo's fixture) when a
    data dir has no lang_cache.json, and LangModel writes through to it by
    design (llm.py:13 parity). Tests must not persist their fake-backend
    completions into that version-controlled file; snapshot and restore it
    around the session."""
    path = os.path.join(
        os.path.dirname(__file__), "..", "dream2real_tpu", "lang", "cache.json"
    )
    before = open(path, "rb").read()
    yield
    if open(path, "rb").read() != before:
        open(path, "wb").write(before)
