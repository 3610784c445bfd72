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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
