"""API-parity wrapper tests: the reference-style DCVC_HEM object with
string-dispatched forward methods and module-activation calls."""

import jax.numpy as jnp
import numpy as np
import pytest

from vcm_ts_tpu.models.dmc import make_dpb
from vcm_ts_tpu.models.wrapper import DCVC_HEM
from vcm_ts_tpu.train.config import default_training_cfg


@pytest.fixture(scope="module")
def wrapper():
    cfg = default_training_cfg()
    cfg.MODEL.CHANNELS = [16, 16, 24]
    cfg.SOLVER.LAMBDAS = [85, 170]
    return DCVC_HEM(cfg)


def _seqs(n=2, t=3, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random((n, 1, 8, 8, 3)).astype(np.float32)
    return np.concatenate(
        [np.kron(np.roll(base, k, 3), np.ones((1, 1, 8, 8, 1)))[:, :, :64, :64]
         for k in range(t)], axis=1)


def test_single_method_trains(wrapper):
    wrapper.activate_modules_inter_dist()
    seqs = _seqs()
    before = np.asarray(
        wrapper.params["params"]["optic_flow"]["moduleBasic.0"]["conv1"]["kernel"])
    out = wrapper("single", seqs, seqs, loss_dist_key="me_mse",
                  loss_rate_keys=[], p_frames=1, perceptual_loss=False)
    assert out["loss"].shape == (2, 2)  # (N, (T - p) * p)
    assert out["single_forwards"] == 2
    after = np.asarray(
        wrapper.params["params"]["optic_flow"]["moduleBasic.0"]["conv1"]["kernel"])
    assert not np.allclose(before, after)


def test_cascade_multi_returns_loss_and_dpb(wrapper):
    seqs = _seqs(t=3, seed=1)
    dpb = make_dpb(jnp.asarray(seqs[:, 0]), 16, 24)
    out = wrapper("cascade_multi", seqs, seqs, loss_dist_key="mse",
                  loss_rate_keys=["bpp_y", "bpp_z"], p_frames=2, t_i=0,
                  perceptual_loss=False, dpb=dpb)
    assert out["loss"].shape == (2,)
    assert np.isfinite(float(out["loss_to_opt"]))
    assert out["dpb"]["ref_frame"].shape == (2, 64, 64, 3)


def test_forward_simple_per_rate_chaining(wrapper):
    seqs = _seqs(t=2, seed=2)
    dpbs = [make_dpb(jnp.asarray(seqs[i:i + 1, 0]), 16, 24) for i in range(2)]
    out = wrapper("forward_simple", seqs[:, 1], dpb=dpbs)
    assert len(out) == 2
    assert out[0]["ref_frame"].shape == (1, 64, 64, 3)
