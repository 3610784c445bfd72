"""Tensor (channel-axis) parallelism on the virtual 8-device CPU mesh.

TP shards every weight's output-channel dim over a "model" axis
(vcm_ts_tpu/parallel/tensor.py) — a capability beyond the reference's
DDP-only parallelism (train_multi.py:16-39). GSPMD may psum partial
input-channel contractions across devices, so comparisons use the same
damped-kernel recipe as the SP test (raw Xavier init amplifies f32
reassociation noise exponentially through the UNet stack).
"""

import jax
import jax.numpy as jnp
import numpy as np

from vcm_ts_tpu.models.dmc import DMC, make_dpb
from vcm_ts_tpu.parallel import mesh as pm
from vcm_ts_tpu.parallel import tensor as tp
from vcm_ts_tpu.train.optimizer import make_stage_optimizer
from vcm_ts_tpu.train.stages import StageParams
from vcm_ts_tpu.train.train_step import make_single_frame_step
from vcm_ts_tpu.utils.common import tree_copy


def _damped_model(seed=0):
    model = DMC(anchor_num=2, channel_mv=16, channel_N=16, channel_M=24)
    x0 = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(seed), x0, make_dpb(x0, 16, 24),
                        1.0, 1.0, method="init_all")
    params = jax.tree_util.tree_map_with_path(
        lambda path, v: v * 0.5 if path[-1].key == "kernel" else v, params)
    return model, params


def _smooth_pair():
    rng = np.random.default_rng(0)
    base = rng.random((1, 8, 8, 3)).astype(np.float32)
    x = jnp.asarray(np.kron(base, np.ones((1, 8, 8, 1))), jnp.float32)
    ref = jnp.asarray(np.kron(np.roll(base, 1, 2), np.ones((1, 8, 8, 1))),
                      jnp.float32)
    return x, ref


def test_tp_forward_matches_unsharded():
    """Channel-sharded forward over 8 devices == single-device forward,
    with the weights genuinely distributed (1/8 shards per device)."""
    model, params = _damped_model()
    x, ref = _smooth_pair()
    dpb = make_dpb(ref, 16, 24)
    base = model.apply(params, x, dpb, 1.0, 1.0, True, training=False)

    mesh = tp.make_tp_mesh(8)
    p = tp.shard_params_tp(params, mesh)
    n_sharded = tp.assert_params_sharded(p, mesh)
    assert n_sharded > 300, n_sharded  # most of the tree is distributed

    fwd = tp.tp_forward(model, mesh, is_first_p=True)
    out = fwd(p, tp.replicate(x, mesh), tp.replicate(dpb, mesh),
              jnp.ones(()), jnp.ones(()))
    np.testing.assert_allclose(np.asarray(out["dpb"]["ref_frame"]),
                               np.asarray(base["dpb"]["ref_frame"]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["bpp"]),
                               np.asarray(base["bpp"]), rtol=2e-3, atol=1e-4)


def test_tp_spec_rules():
    assert tp.tp_spec((3, 3, 16, 32), 8)[-1] == "model"
    assert tp.tp_spec((32,), 8)[-1] == "model"
    assert tp.tp_spec((3, 3, 16, 3), 8) == jax.sharding.PartitionSpec()
    assert tp.tp_spec((4,), 8) == jax.sharding.PartitionSpec()  # < mesh
    assert tp.tp_spec((), 8) == jax.sharding.PartitionSpec()


def test_dp_tp_train_step_matches_unsharded():
    """One train step on a 2D (data=2, model=4) mesh: global batch sharded
    over "data", weights + Adam moments sharded over "model". Loss and the
    updated params must match the single-device step (damped numerics)."""
    model, params = _damped_model()
    stage = StageParams(stage=0, p_frames=1, trainable_mode="all",
                        forward_method="single", loss_dist_key="mse",
                        loss_rate_keys=("bpp_mv_y", "bpp_mv_z", "bpp_y",
                                        "bpp_z"),
                        lr=1e-4, perceptual_loss=False)
    lambdas = [85.0, 170.0]
    x1, ref1 = _smooth_pair()
    x_np = np.concatenate([np.asarray(x1), np.asarray(ref1)], 0)
    ref_np = np.concatenate([np.asarray(ref1), np.asarray(x1)], 0)

    def run(mesh):
        x = jnp.asarray(x_np)
        ref = jnp.asarray(ref_np)
        tx, opt_state = make_stage_optimizer(params, "all", 1e-4)
        step = make_single_frame_step(model, tx, stage, lambdas=lambdas,
                                      dist_lambda=1.0, pl_lambda=0.0)
        if mesh is None:
            # copies: the step donates params/opt_state and the second
            # run() still needs the originals
            p, o, xx, rr = tree_copy(params), opt_state, x, ref
        else:
            p = tp.shard_params_tp(params, mesh)
            o = tp.shard_params_tp(opt_state, mesh)
            xx = pm.shard_batch(x, mesh)
            rr = pm.shard_batch(ref, mesh)
            tp.assert_params_sharded(p, mesh)
        dpb = make_dpb(rr, model.channel_N, model.channel_M)
        new_p, new_o, aux, _ = step(p, o, xx, xx, dpb,
                                    jax.random.PRNGKey(0), True)
        return np.asarray(aux.loss), new_p

    loss_1, p_1 = run(None)
    loss_2d, p_2d = run(tp.make_dp_tp_mesh(2, 4))

    np.testing.assert_allclose(loss_2d, loss_1, rtol=1e-4, atol=1e-5)
    k1 = np.asarray(p_1["params"]["optic_flow"]["moduleBasic.0"]["conv1"]
                    ["kernel"])
    k2 = np.asarray(p_2d["params"]["optic_flow"]["moduleBasic.0"]["conv1"]
                    ["kernel"])
    assert np.abs(k1 - np.asarray(
        params["params"]["optic_flow"]["moduleBasic.0"]["conv1"]["kernel"])
    ).max() > 0, "step did not update params"
    np.testing.assert_allclose(k2, k1, rtol=1e-4, atol=1e-6)


def test_tp_intra_forward_matches_unsharded():
    """shard_params_tp is model-agnostic (shape-based): the I-frame
    IntraNoAR forward under channel-sharded weights matches unsharded."""
    from vcm_ts_tpu.models.intra import IntraNoAR

    model = IntraNoAR(N=16, anchor_num=2)
    x = jnp.asarray(np.kron(np.random.default_rng(0).random((1, 4, 4, 3)),
                            np.ones((1, 16, 16, 1))), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jnp.ones((1, 1, 1, 1)))
    params = jax.tree_util.tree_map_with_path(
        lambda path, v: v * 0.5 if path[-1].key == "kernel" else v, params)
    base = model.apply(params, x, jnp.ones((1, 1, 1, 1)))

    mesh = tp.make_tp_mesh(8)
    p = tp.shard_params_tp(params, mesh)
    tp.assert_params_sharded(p, mesh)

    @jax.jit
    def fwd(p, x, q):
        return model.apply(p, x, q)

    out = fwd(p, tp.replicate(x, mesh), tp.replicate(jnp.ones((1, 1, 1, 1)),
                                                     mesh))
    np.testing.assert_allclose(np.asarray(out["x_hat"]),
                               np.asarray(base["x_hat"]),
                               rtol=1e-3, atol=1e-4)


def test_do_train_on_dp_tp_mesh(tmp_path):
    """The trainer_multi --tp path end to end (single process): do_train on
    a 2D (data=2, model=4) mesh shards weights + Adam moments over 'model',
    completes a stage, and the saved checkpoint reloads cleanly."""
    from tools.overfit_run import OverfitLoader, make_synthetic_batch
    from vcm_ts_tpu.parallel.mesh import make_global_dp_tp_mesh
    from vcm_ts_tpu.train.checkpoint import CheckPointer
    from vcm_ts_tpu.train.config import default_training_cfg
    from vcm_ts_tpu.train.train_loop import do_train

    cfg = default_training_cfg()
    cfg.MODEL.CHANNELS = [16, 16, 24]
    cfg.SOLVER.LAMBDAS = [85.0, 170.0]
    cfg.DATASET.SEQUENCE_LENGTH = 2
    cfg.SOLVER.GRAD_CLIP_NORM = 1.0
    cfg.SOLVER.STAGES = [
        ["1", "me", "single", "me", "none", "1e-4", "1", "false"],
    ]
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.TENSORBOARD.BEST_SAMPLES_NUM = 0
    cfg.TENSORBOARD.WORST_SAMPLES_NUM = 0
    cfg.freeze()

    model = DMC(anchor_num=2, channel_mv=16, channel_N=16, channel_M=24)
    x0 = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x0, make_dpb(x0, 16, 24),
                        1.0, 1.0, method="init_all")
    loader = OverfitLoader(make_synthetic_batch(2, 2, 64), 1)

    mesh = make_global_dp_tp_mesh(4)
    assert dict(mesh.shape) == {"data": 2, "model": 4}
    ckpt = CheckPointer(str(tmp_path))
    out = do_train(cfg, model, params, loader, checkpointer=ckpt, mesh=mesh)

    # weights really trained sharded...
    tp.assert_params_sharded(out, mesh)
    # ...and the checkpoint written from them reloads into a plain tree
    p2, _, extra = ckpt.load(params)
    assert int(extra["epoch"]) == 1
    k0 = np.asarray(params["params"]["optic_flow"]["moduleBasic.0"]["conv1"]
                    ["kernel"])
    k1 = np.asarray(p2["params"]["optic_flow"]["moduleBasic.0"]["conv1"]
                    ["kernel"])
    assert np.abs(k1 - k0).max() > 0, "checkpoint did not capture training"
