"""Tracing/profiling hooks.

The reference has no tracing (SURVEY §5: tqdm only); the TPU build wraps the
hot stages in jax.profiler traces so perf regressions are inspectable with
tensorboard / xprof.
"""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def trace(name: str, log_dir: str | None = None):
    """Profile a region to `log_dir` (or $D2R_TRACE_DIR). No-ops when unset.

    Usage: with trace("imagine-loop"): ...
    """
    log_dir = log_dir or os.environ.get("D2R_TRACE_DIR")
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(log_dir, name)):
        yield


@contextlib.contextmanager
def timed(name: str, sink=print):
    """Wall-clock a region (host-side; device work must be synced by caller)."""
    t0 = time.time()
    yield
    sink(f"[timed] {name}: {time.time() - t0:.3f}s")


class StageTimer:
    """Accumulates per-stage wall-clock for pipeline observability."""

    def __init__(self):
        self.stages: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.time()
        yield
        self.stages[name] = self.stages.get(name, 0.0) + (time.time() - t0)

    def report(self) -> str:
        total = sum(self.stages.values())
        lines = [f"{k}: {v:.2f}s ({100*v/max(total,1e-9):.0f}%)" for k, v in self.stages.items()]
        return "\n".join(lines + [f"total: {total:.2f}s"])
