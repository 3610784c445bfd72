"""Shared TPU liveness probe.

One tiny-matmul probe in a subprocess under a hard timeout, used by every
tool that gates work on the chip being reachable (bench.py, tools/
tpu_watch.py, __graft_entry__). A single implementation keeps the
liveness criterion consistent: previously each tool hand-rolled its own
probe with different matmul sizes, timeouts, and success strings, so the
watcher could declare the tunnel UP while bench's stricter probe failed.

A subprocess is the only reliable watchdog: with the axon tunnel down,
backend init blocks inside PJRT for ~40 min and is not interruptible from
Python. The child inherits the caller's env, so it probes the same
backend the caller would use; ``float(...)`` forces a host fetch, the
only completion barrier the tunnel honors (PERF.md).

This module must stay importable without jax: callers import it before
(and instead of) touching jax in the parent process.
"""

from __future__ import annotations

import subprocess
import sys

_PROBE_CODE = (
    "import jax, jax.numpy as jnp; "
    "x = jnp.ones((128, 128)); "
    "print('PROBE_OK', float((x @ x).sum()), jax.devices()[0].platform)"
)


def probe_tpu(timeout_s: float, require_tpu: bool = True) -> tuple[bool, str]:
    """Return (alive, detail).

    ``require_tpu=True`` additionally rejects a probe that *succeeded* on
    the CPU fallback backend (jax falls back silently when the axon PJRT
    plugin fails to register, e.g. with PALLAS_AXON_POOL_IPS blanked in
    the inherited env) — without this check a bench run would record CPU
    numbers as fps/chip.
    """
    try:
        proc = subprocess.run([sys.executable, "-c", _PROBE_CODE],
                              capture_output=True, text=True,
                              timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False, f"probe timed out after {timeout_s:.0f}s"
    if proc.returncode != 0 or "PROBE_OK" not in proc.stdout:
        tail = (proc.stderr or proc.stdout).strip().splitlines()[-3:]
        return False, f"probe rc={proc.returncode}: " + " | ".join(tail)
    line = next(l for l in proc.stdout.splitlines() if "PROBE_OK" in l)
    platform = line.split()[-1]
    if require_tpu and platform == "cpu":
        return False, ("probe ran on the CPU fallback backend, not a TPU "
                       "(axon plugin absent or failed to register)")
    return True, line.strip()
