"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The environment pre-imports jax via sitecustomize (axon TPU platform), so
setting env vars here is too late for platform selection — but the backend
itself is not yet initialized at conftest time, so jax.config.update works.
XLA_FLAGS is still read at backend-init time, so the 8-device override works
from here too. Multi-chip sharding tests rely on the 8 virtual devices;
everything else just runs faster on CPU than through the tunneled TPU chip.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def repo_module(name):
    """Import repo-root module `name` by explicit path, order-proof.

    Both this repo and /root/reference ship same-named root scripts
    (benchmark_plot.py, test_video.py, ...); interop fixtures put the
    reference tree on sys.path, so a bare `import benchmark_plot` in a
    test that runs AFTER them resolves (and caches) the wrong file.
    """
    import importlib.util

    path = os.path.join(REPO_ROOT, name + ".py")
    mod = sys.modules.get(name)
    if mod is not None and os.path.abspath(
            getattr(mod, "__file__", "") or "") == path:
        return mod
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
