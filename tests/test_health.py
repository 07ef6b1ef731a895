"""Unit tests for the TPU health gate (utils/health.py).

All paths are exercised with mocks — no real probes (the suite runs
CPU-pinned, and the gate must itself detect that and skip).
"""

import subprocess
import types

import pytest

from dream2real_tpu.utils import health


def test_skips_when_process_is_cpu_pinned():
    # conftest pins jax to cpu via jax.config while the env var still says
    # the TPU platform; the gate must return immediately without probing.
    def boom(*a, **k):  # pragma: no cover - must not be called
        raise AssertionError("probe ran despite CPU pin")

    orig = subprocess.run
    subprocess.run = boom
    try:
        assert health.wait_tpu_healthy(10.0) is True
    finally:
        subprocess.run = orig


def test_env_budget_zero_disables(monkeypatch):
    monkeypatch.setenv("D2R_X_HEALTH", "0")
    monkeypatch.setattr(
        subprocess, "run",
        lambda *a, **k: pytest.fail("probe ran despite budget 0"),
    )
    assert health.wait_tpu_healthy(600.0, env_var="D2R_X_HEALTH") is True


def test_budget_exhaustion_returns_false(monkeypatch):
    # Force the non-cpu path, make every probe "wedged", and shrink sleeps.
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setitem(health.sys.modules, "jax", None)
    calls = []

    def fake_run(*a, **k):
        calls.append(k.get("timeout"))
        raise subprocess.TimeoutExpired(cmd=a[0], timeout=k.get("timeout"))

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(health.time, "sleep", lambda s: None)
    t = {"now": 0.0}
    monkeypatch.setattr(health.time, "time", lambda: t.setdefault("now", 0.0))

    def advancing_run(*a, **k):
        t["now"] += 100.0
        return fake_run(*a, **k)

    monkeypatch.setattr(subprocess, "run", advancing_run)
    assert health.wait_tpu_healthy(150.0) is False
    # Probe timeouts were clamped to the remaining budget (>= 60 s floor).
    assert all(60.0 <= c <= 240.0 for c in calls)


def test_recovery_returns_true(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setitem(health.sys.modules, "jax", None)
    monkeypatch.setattr(health.time, "sleep", lambda s: None)
    seq = iter([3, 0])  # degraded once, then healthy

    def fake_run(*a, **k):
        return types.SimpleNamespace(
            returncode=next(seq), stdout="warm_dispatch_s=0.030\n", stderr=""
        )

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert health.wait_tpu_healthy(600.0) is True
