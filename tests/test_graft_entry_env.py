"""Regression tests for __graft_entry__.dryrun_multichip backend selection.

Round-4 driver failure (VERDICT.md weak #1): with the driver's env —
JAX_PLATFORMS listing a non-cpu platform first PLUS
--xla_force_host_platform_device_count=8 — the old env-sniffing check
("cpu" substring in JAX_PLATFORMS) chose the in-process path while JAX
initialized the 1-device axon backend, so the body's device assert fired
and MULTICHIP_r04.json went red. The fix proves the backend instead of
sniffing the env; these tests pin both the decision function and the
end-to-end subprocess behavior under the driver-shaped env.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _decide(env_overrides, n=8):
    """Run _in_process_cpu_ok(n) in a fresh child with the given env and
    return its decision, without ever initializing a JAX backend there."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.update(env_overrides)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    code = (
        "import __graft_entry__ as g\n"
        f"print('DECISION', g._in_process_cpu_ok({n}))\n"
    )
    out = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    line = [l for l in out.stdout.splitlines() if l.startswith("DECISION")][-1]
    return line.split()[1] == "True"


def test_driver_env_shape_rejects_in_process():
    # the exact round-4 trap: non-cpu platform listed first + force-count
    assert not _decide({
        "JAX_PLATFORMS": "axon,cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
    })


def test_cpu_without_force_count_rejects_in_process():
    assert not _decide({"JAX_PLATFORMS": "cpu"})


def test_cpu_with_insufficient_count_rejects_in_process():
    assert not _decide({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
    })


def test_pure_cpu_env_accepts_in_process():
    assert _decide({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
    })


def test_initialized_backend_overrides_env():
    """A live backend is ground truth: if the backend is already
    initialized with fewer devices than requested, the in-process path is
    refused even when the env *looks* right (the round-4 failure mode,
    reproduced with a deliberately under-provisioned live CPU backend)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    code = (
        "import jax\n"
        "jax.devices()  # initialize the 2-device cpu backend\n"
        "import os\n"
        # now lie in the env: claims 8 devices, live backend has 2
        "os.environ['XLA_FLAGS'] = "
        "'--xla_force_host_platform_device_count=8'\n"
        "import __graft_entry__ as g\n"
        "print('DECISION', g._in_process_cpu_ok(8))\n"
    )
    out = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    line = [l for l in out.stdout.splitlines() if l.startswith("DECISION")][-1]
    assert line.split()[1] == "False"


def test_dryrun_exits_zero_under_driver_env():
    """End-to-end: under the driver-shaped env the dryrun must re-exec a
    clean CPU child and exit 0 with all four parallelism stages green."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon,cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    code = "import __graft_entry__ as g; g.dryrun_multichip(8)"
    out = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                         capture_output=True, text=True, timeout=1800)
    assert out.returncode == 0, out.stderr[-4000:]
    for stage in ("DP OK", "SP OK", "TP OK", "FSDP OK"):
        assert stage in out.stdout, (stage, out.stdout[-4000:])
