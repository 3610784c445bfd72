"""Shared TPU liveness probe (vcm_ts_tpu/utils/tpu_probe.py).

The probe is the single gate every tunnel-aware tool trusts (bench.py,
tools/tpu_watch.py), so its failure modes need pinning:
- a probe that lands on the CPU fallback backend must be REJECTED when
  require_tpu=True (else bench would record CPU numbers as fps/chip);
- the hard-timeout path must return a legible detail, not raise.
"""

import os

import pytest


def _cpu_env(monkeypatch):
    # the child inherits os.environ; blank the axon trigger so its
    # sitecustomize never attempts TPU PJRT registration (which blocks
    # ~40 min when the tunnel is down) and pin it to the CPU backend
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")


def test_probe_importable_without_jax():
    import importlib
    import sys

    import vcm_ts_tpu.utils.tpu_probe as mod
    importlib.reload(mod)  # re-exec module body under the current env
    assert "jax" not in vars(mod), "probe module must not import jax"
    assert sys.modules["vcm_ts_tpu.utils.tpu_probe"] is mod


def test_probe_times_out_legibly():
    from vcm_ts_tpu.utils.tpu_probe import probe_tpu

    alive, detail = probe_tpu(0.05)
    assert alive is False
    assert "timed out" in detail


@pytest.mark.slow
def test_probe_rejects_cpu_fallback(monkeypatch):
    from vcm_ts_tpu.utils.tpu_probe import probe_tpu

    _cpu_env(monkeypatch)
    alive, detail = probe_tpu(300, require_tpu=True)
    assert alive is False
    assert "CPU fallback" in detail


@pytest.mark.slow
def test_probe_accepts_any_backend_when_not_requiring_tpu(monkeypatch):
    from vcm_ts_tpu.utils.tpu_probe import probe_tpu

    _cpu_env(monkeypatch)
    alive, detail = probe_tpu(300, require_tpu=False)
    assert alive is True, detail
    assert "PROBE_OK" in detail and detail.split()[-1] == "cpu"
