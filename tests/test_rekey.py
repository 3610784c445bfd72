"""Regression: the first chained P-frame after a GOP rekey must run with
is_first_p=True, i.e. through the I-frame feature adaptor. The reference
infers this from `ref_feature is None` (video_model.py:226-231); our dense
DPB carries zeros instead of None, so the flag must be threaded explicitly
through the OD-eval chain and wrapper.forward_simple.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcm_ts_tpu.eval.validation import eval_object_detection
from vcm_ts_tpu.models.dmc import DMC, make_dpb
from vcm_ts_tpu.train.config import default_training_cfg


@pytest.fixture(scope="module")
def model_and_params():
    model = DMC(anchor_num=2, channel_mv=16, channel_N=16, channel_M=24)
    x0 = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x0, make_dpb(x0, 16, 24),
                        1.0, 1.0, method="init_all")
    return model, params


def _chain(model, params, frames, flags, n_rates=2):
    """Reference chain: explicit is_first_p flags, all rate anchors riding
    the batch axis exactly like eval_object_detection's jitted forward (so
    numerics match bit-for-bit — eager-vs-jit or batch-1-vs-batch-n fusion
    differences otherwise amplify through the chained random-weight model
    and flip post-clip values). Returns rate-0 rows."""
    from functools import partial

    mv_qs = params["params"]["mv_y_q_scale"]
    y_qs = params["params"]["y_q_scale"]

    @partial(jax.jit, static_argnums=(3,))
    def step(params, x, dpb, is_first_p):
        out = model.apply(params, x, dpb, mv_qs[:n_rates], y_qs[:n_rates],
                          is_first_p, training=False)
        return out["dpb"]

    x0 = jnp.tile(jnp.asarray(frames[0]), (n_rates, 1, 1, 1))
    dpb = make_dpb(x0, model.channel_N, model.channel_M)
    decoded = []
    for x, flag in zip(frames[1:], flags):
        dpb = step(params, jnp.tile(jnp.asarray(x), (n_rates, 1, 1, 1)),
                   dpb, flag)
        decoded.append(np.asarray(jnp.clip(dpb["ref_frame"][0:1], 0, 1)))
    return decoded


def test_od_eval_uses_i_adaptor_after_rekey(model_and_params):
    model, params = model_and_params
    cfg = default_training_cfg()
    cfg.DATASET.OD_GOP_SIZE = 3  # frame 0 rekeys; frames 1, 2 are chained

    rng = np.random.default_rng(0)
    frames = [rng.random((1, 64, 64, 3)).astype(np.float32) for _ in range(3)]
    ann = {"boxes": np.array([[0.0, 0.0, 10.0, 10.0]]),
           "labels": np.array([1])}
    loader = [([f], [ann]) for f in frames]

    recorded = []

    def detector_fn(decoded):
        recorded.append(decoded.copy())
        return {"boxes": ann["boxes"], "labels": ann["labels"],
                "scores": np.array([0.9])}

    eval_object_detection(model, params, cfg, [85.0, 170.0], loader,
                          detector_fn, i_frame_fn=None)

    # recorded order: (frame, rate) = (0,0) (0,1) (1,0) (1,1) (2,0) (2,1)
    assert len(recorded) == 6
    want = _chain(model, params, frames, flags=[True, False])
    np.testing.assert_allclose(recorded[2], want[0], atol=1e-5)
    np.testing.assert_allclose(recorded[4], want[1], atol=1e-5)

    # the buggy all-False chain must actually differ (adaptors are distinct)
    bad = _chain(model, params, frames, flags=[False, False])
    assert not np.allclose(recorded[2], bad[0], atol=1e-5)


def test_forward_simple_is_first_p_passthrough(model_and_params):
    from vcm_ts_tpu.models.wrapper import DCVC_HEM

    cfg = default_training_cfg()
    cfg.MODEL.CHANNELS = [16, 16, 24]
    cfg.SOLVER.LAMBDAS = [85, 170]
    wrapper = DCVC_HEM(cfg)

    rng = np.random.default_rng(1)
    x0 = rng.random((2, 64, 64, 3)).astype(np.float32)
    x1 = rng.random((2, 64, 64, 3)).astype(np.float32)
    dpbs = [make_dpb(jnp.asarray(x0[i:i + 1]), 16, 24) for i in range(2)]

    out_i = wrapper("forward_simple", x1, dpb=dpbs, is_first_p=True)
    out_p = wrapper("forward_simple", x1, dpb=dpbs, is_first_p=False)
    assert not np.allclose(np.asarray(out_i[0]["ref_frame"]),
                           np.asarray(out_p[0]["ref_frame"]), atol=1e-5)
