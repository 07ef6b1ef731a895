"""Bounded wait for a healthy TPU worker before unattended measurements.

The axon TPU worker intermittently wedges (any dispatch hangs) or degrades
(a tiny matmul takes 20-60 s) for 5-30+ minutes at a time. Unattended
entry points that are executed exactly once by the driver — ``bench.py``
and the ``__graft_entry__.entry()`` compile check — would either hang or
record numbers off by 10-100x if they land in such a window. This module
probes a tiny matmul in a *subprocess* (a wedged in-process runtime cannot
be cancelled) and retries within a bounded budget.

There is no reference analogue: this is harness robustness for the TPU
tunnel environment, not pipeline behavior.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

# Warm (second) dispatch of a tiny matmul slower than this means the worker
# is in a degraded window. Generous: healthy warm dispatch is ~25-50 ms.
WARM_DISPATCH_MAX_S = 5.0

_HEALTH_PROBE = """
import time, jax, jax.numpy as jnp
x = jnp.ones((512, 512), jnp.bfloat16)
f = jax.jit(lambda a: (a @ a).sum())
float(f(x))  # compile + first dispatch (tunnel warm-up may be slow)
t0 = time.time(); float(f(x)); dt = time.time() - t0
print(f"warm_dispatch_s={dt:.3f}")
import sys; sys.exit(0 if dt < %f else 3)
""" % WARM_DISPATCH_MAX_S


def wait_tpu_healthy(budget_s: float, env_var: str | None = None) -> bool:
    """Block until the TPU answers a tiny matmul at normal speed.

    Returns True if a probe succeeded, False if the budget was exhausted
    (callers proceed anyway — a flagged number beats no number). Skipped
    when the process is pinned to CPU. ``env_var`` names an environment
    override for the budget; 0 disables the wait entirely.
    """
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        return True
    # The env var is latched by sitecustomize on this host; a process pinned
    # to CPU via jax.config (tests/conftest.py) must also skip the probe.
    # The config may list fallbacks ("axon,cpu") — only a *primary* cpu
    # platform counts as pinned.
    jax_mod = sys.modules.get("jax")
    if jax_mod is not None:
        platforms = str(getattr(jax_mod.config, "jax_platforms", None) or "")
        if platforms.split(",")[0].strip() == "cpu":
            return True
    if env_var and env_var in os.environ:
        budget_s = float(os.environ[env_var])
    if budget_s <= 0:
        return True
    deadline = time.time() + budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            # Clamp each probe to the remaining budget (60 s floor so a
            # healthy-but-cold first compile is not misread as a wedge).
            probe_timeout = min(240.0, max(60.0, deadline - time.time()))
            r = subprocess.run(
                [sys.executable, "-c", _HEALTH_PROBE],
                timeout=probe_timeout, capture_output=True, text=True,
            )
            ok = r.returncode == 0
            lines = (r.stdout or r.stderr).strip().splitlines()
            detail = lines[-1] if lines else ""
        except subprocess.TimeoutExpired:
            ok, detail = False, "probe timed out (wedged)"
        if ok:
            print(f"# tpu health ok (attempt {attempt}: {detail})", file=sys.stderr)
            return True
        if time.time() >= deadline:
            print(
                f"# WARNING: tpu still unhealthy after {budget_s:.0f}s "
                f"({detail}); proceeding anyway", file=sys.stderr,
            )
            return False
        print(f"# tpu unhealthy (attempt {attempt}: {detail}); retrying", file=sys.stderr)
        time.sleep(min(45.0, max(1.0, deadline - time.time())))
