"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Covers (e) of SURVEY.md section 4's implied contract: k-device data-parallel
training is semantically equivalent to a 1-device run over the same global
batch.
"""

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
from vcm_ts_tpu.models.dmc import DMC, make_dpb
from vcm_ts_tpu.parallel import mesh as pm
from vcm_ts_tpu.train.optimizer import make_stage_optimizer
from vcm_ts_tpu.train.stages import StageParams
from vcm_ts_tpu.train.train_step import make_single_frame_step
from vcm_ts_tpu.utils.common import tree_copy


def test_graft_entry_compiles():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (1, 256, 256, 3)


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)


def test_dp_equivalence_1_vs_8_devices():
    """Same global batch: 8-device sharded step == single-device step."""
    model = DMC(anchor_num=4, channel_mv=16, channel_N=16, channel_M=24)
    x0 = jnp.zeros((8, 64, 64, 3))
    dpb0 = make_dpb(x0, 16, 24)
    params = model.init(jax.random.PRNGKey(0), x0[:1],
                        make_dpb(x0[:1], 16, 24), 1.0, 1.0, method="init_all")
    stage = StageParams(stage=0, p_frames=1, trainable_mode="all",
                        forward_method="single", loss_dist_key="me_mse",
                        loss_rate_keys=(), lr=1e-4, perceptual_loss=False)
    lambdas = [85.0, 170.0, 380.0, 840.0, 85.0, 170.0, 380.0, 840.0]

    rng = np.random.default_rng(0)
    x_np = rng.random((8, 64, 64, 3)).astype(np.float32)
    ref_np = rng.random((8, 64, 64, 3)).astype(np.float32)

    def run(mesh):
        # fresh device arrays per run: the step donates the DPB (which
        # aliases `ref`), so arrays must not be shared across runs
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
            p = pm.replicate(params, mesh)
            o = pm.replicate(opt_state, mesh)
            xx = pm.shard_batch(x, mesh)
            rr = pm.shard_batch(ref, mesh)
        dpb = make_dpb(rr, 16, 24)
        new_p, _, aux, _ = step(p, o, xx, xx, dpb, jax.random.PRNGKey(1), True)
        return np.asarray(aux.loss), new_p

    loss_1, p_1 = run(None)
    loss_8, p_8 = run(pm.make_mesh(8))

    np.testing.assert_allclose(loss_8, loss_1, rtol=1e-5, atol=1e-6)
    # updated params agree across the sharded/unsharded runs
    k1 = np.asarray(p_1["params"]["optic_flow"]["moduleBasic.0"]["conv1"]["kernel"])
    k8 = np.asarray(p_8["params"]["optic_flow"]["moduleBasic.0"]["conv1"]["kernel"])
    np.testing.assert_allclose(k8, k1, rtol=1e-4, atol=1e-6)


def test_spatial_sharding_matches_unsharded():
    """H-axis (spatial/sequence-dim) sharded forward over 4 virtual devices
    must match the single-device result: GSPMD inserts conv halo exchanges
    and gather collectives."""
    from vcm_ts_tpu.parallel import spatial as sp

    model = DMC(anchor_num=2, channel_mv=16, channel_N=16, channel_M=24)
    x0 = jnp.zeros((1, 64, 64, 3))
    dpb0 = make_dpb(x0, 16, 24)
    params = model.init(jax.random.PRNGKey(0), x0, dpb0, 1.0, 1.0,
                        method="init_all")
    # damp kernels so activations stay O(1): raw Xavier(sqrt(2)) init blows
    # values up to ~1e4, where f32 reassociation across shardings dominates
    params = jax.tree_util.tree_map_with_path(
        lambda path, v: v * 0.5 if path[-1].key == "kernel" else v, params)
    # smooth content: float reassociation across shardings can flip
    # floor() in the warp at exact integer sample points, so noise images
    # would amplify ULP differences into pixel-value jumps
    rng = np.random.default_rng(0)
    base_img = rng.random((1, 8, 8, 3)).astype(np.float32)
    x = jnp.asarray(np.kron(base_img, np.ones((1, 8, 8, 1))), jnp.float32)
    ref_frame = jnp.asarray(np.kron(np.roll(base_img, 1, 2),
                                    np.ones((1, 8, 8, 1))), jnp.float32)
    dpb = make_dpb(ref_frame, 16, 24)

    base = model.apply(params, x, dpb, 1.0, 1.0, True, training=False)

    mesh = sp.make_spatial_mesh(4)
    fwd = sp.spatial_forward(model, mesh, is_first_p=True)
    out = fwd(sp.replicate(params, mesh), sp.shard_spatial(x, mesh),
              sp.shard_spatial_dpb(dpb, mesh),
              jnp.ones(()), jnp.ones(()))

    np.testing.assert_allclose(np.asarray(out["dpb"]["ref_frame"]),
                               np.asarray(base["dpb"]["ref_frame"]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["bpp"]),
                               np.asarray(base["bpp"]), rtol=2e-3, atol=1e-4)
