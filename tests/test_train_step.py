"""Training framework tests: stage curriculum decoding, optimizer freezing
masks, and loss decrease under both training strategies on a tiny DMC.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcm_ts_tpu.models.dmc import DMC, make_dpb
from vcm_ts_tpu.train import train_step as ts
from vcm_ts_tpu.train.config import default_training_cfg
from vcm_ts_tpu.train.optimizer import (make_stage_optimizer, trainable_mask)
from vcm_ts_tpu.train.stages import StageParams, calc_max_epoch, get_stage_params
from vcm_ts_tpu.utils.common import tree_copy


def tiny_model_and_params():
    model = DMC(anchor_num=2, channel_mv=16, channel_N=16, channel_M=24)
    x = jnp.zeros((2, 64, 64, 3))
    dpb = make_dpb(x, 16, 24)
    params = model.init(jax.random.PRNGKey(0), x, dpb, 1.0, 1.0,
                        method="init_all")
    return model, params


def _sequences(n=2, t=3, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random((n, 1, 8, 8, 3)).astype(np.float32)
    frames = [np.kron(np.roll(base, k, axis=3),
                      np.ones((1, 1, 8, 8, 1)))[:, :, :64, :64, :]
              for k in range(t)]
    return np.concatenate(frames, axis=1)  # (N, T, H, W, C)


# ------------------------------------------------------------------ stages
def test_stage_schedule_decoding():
    cfg = default_training_cfg()
    assert calc_max_epoch(cfg.SOLVER.STAGES) == 30
    s0 = get_stage_params(cfg, 0)
    assert s0.stage == 0 and s0.trainable_mode == "inter_dist"
    assert s0.loss_dist_key == "me_mse" and s0.loss_rate_keys == ()
    s1 = get_stage_params(cfg, 1)
    assert s1.stage == 1 and s1.loss_rate_keys == ("bpp_mv_y", "bpp_mv_z")
    s_last = get_stage_params(cfg, 29)
    assert s_last.forward_method == "cascade" and s_last.p_frames == 4
    assert s_last.lr == 1e-5
    with pytest.raises(ValueError):
        get_stage_params(cfg, 30)


# ---------------------------------------------------------------- freezing
def test_trainable_masks():
    _, params = tiny_model_and_params()
    m = trainable_mask(params, "inter_dist")
    assert m["params"]["optic_flow"]["moduleBasic.0"]["conv1"]["kernel"] is True
    assert m["params"]["mv_y_q_basic"] is False
    assert m["params"]["contextual_encoder"]["conv1"]["kernel"] is False

    m = trainable_mask(params, "inter_dist_rate")
    assert m["params"]["mv_y_q_basic"] is True
    assert m["params"]["y_q_basic"] is False

    m = trainable_mask(params, "recon_dist")
    assert m["params"]["optic_flow"]["moduleBasic.0"]["conv1"]["kernel"] is False
    assert m["params"]["contextual_encoder"]["conv1"]["kernel"] is True
    assert m["params"]["y_q_basic"] is False
    assert m["params"]["bit_estimator_z"]["f1"]["h"] is True

    m = trainable_mask(params, "recon_dist_rate")
    assert m["params"]["y_q_basic"] is True
    assert m["params"]["mv_y_q_scale"] is False

    m = trainable_mask(params, "all")
    assert all(jax.tree_util.tree_leaves(m))


def _stage(**kw):
    base = dict(stage=0, p_frames=1, trainable_mode="all",
                forward_method="single", loss_dist_key="mse",
                loss_rate_keys=("bpp_mv_y", "bpp_mv_z", "bpp_y", "bpp_z"),
                lr=1e-4, perceptual_loss=False)
    base.update(kw)
    return StageParams(**base)


# ----------------------------------------------------------------- training
def test_single_strategy_loss_decreases_and_freezing_holds():
    model, params = tiny_model_and_params()
    stage = _stage(trainable_mode="inter_dist", loss_dist_key="me_mse",
                   loss_rate_keys=())
    tx, opt_state = make_stage_optimizer(params, stage.trainable_mode, 1e-4)
    step = ts.make_single_frame_step(model, tx, stage, lambdas=[85., 170.],
                                     dist_lambda=1.0, pl_lambda=0.0)
    seqs = _sequences()
    frozen_before = np.asarray(
        params["params"]["contextual_encoder"]["conv1"]["kernel"])
    trained_before = np.asarray(
        params["params"]["optic_flow"]["moduleBasic.0"]["conv1"]["kernel"])

    losses = []
    p, s = params, opt_state
    rng = jax.random.PRNGKey(1)
    for it in range(4):
        rng, sub = jax.random.split(rng)
        p, s, aux_list = ts.run_single_sequence(
            model, step, p, s, seqs, seqs, stage, sub)
        losses.append(float(np.mean([np.mean(a.loss) for a in aux_list])))

    assert losses[-1] < losses[0], losses
    np.testing.assert_array_equal(
        np.asarray(p["params"]["contextual_encoder"]["conv1"]["kernel"]),
        frozen_before)
    assert not np.allclose(
        np.asarray(p["params"]["optic_flow"]["moduleBasic.0"]["conv1"]["kernel"]),
        trained_before)


def test_cascade_strategy_runs_and_improves():
    # me_mse objective: the recon path's from-scratch magnitudes make the
    # full RD loss astronomically large at init (the reference fine-tunes
    # pretrained weights), so the smoke test trains the motion path.
    model, params = tiny_model_and_params()
    # damp kernels so activations contract (growth sqrt(2)*0.5 < 1/layer):
    # with raw Xavier(sqrt(2)) init the frame-1 recon fed into frame 2's
    # flow estimator overflows f32 (the reference fine-tunes pretrained
    # weights and never runs cascade from scratch).
    params = jax.tree_util.tree_map_with_path(
        lambda path, x: x * 0.5 if path[-1].key == "kernel" else x, params)
    stage = _stage(forward_method="cascade", p_frames=2,
                   trainable_mode="inter_dist", loss_dist_key="me_mse",
                   loss_rate_keys=())
    tx, opt_state = make_stage_optimizer(params, stage.trainable_mode, 1e-4)
    step = ts.make_cascade_step(model, tx, stage, lambdas=[85., 170.],
                                dist_lambda=1.0, pl_lambda=0.0)
    seqs = _sequences(t=4, seed=1)
    p, s = params, opt_state
    losses = []
    rng = jax.random.PRNGKey(2)
    frozen_before = np.asarray(
        params["params"]["contextual_decoder"]["up1"]["0"]["kernel"])
    for it in range(3):
        rng, sub = jax.random.split(rng)
        p, s, aux_list = ts.run_cascade_sequence(
            model, step, p, s, seqs, seqs, stage, sub)
        losses.append(float(np.mean([np.mean(a.loss) for a in aux_list])))
    assert losses[-1] < losses[0] * 1.05, losses
    # BPTT gives recon-path params nonzero grads; freezing must still hold
    # exactly (regression test for the optax.masked pass-through pitfall).
    np.testing.assert_array_equal(
        np.asarray(p["params"]["contextual_decoder"]["up1"]["0"]["kernel"]),
        frozen_before)


def test_cascade_scan_matches_unrolled():
    """The lax.scan cascade chain must produce the same loss, aux, and
    parameter update as a frame-by-frame Python unroll with the same
    split-per-frame key schedule (SURVEY.md section 7 design decision 1)."""
    import optax

    model, params = tiny_model_and_params()
    params = jax.tree_util.tree_map_with_path(
        lambda path, x: x * 0.5 if path[-1].key == "kernel" else x, params)
    stage = _stage(forward_method="cascade", p_frames=3,
                   trainable_mode="inter_dist", loss_dist_key="me_mse",
                   loss_rate_keys=())
    lambdas = [85.0, 170.0]
    tx, opt_state = make_stage_optimizer(params, stage.trainable_mode, 1e-4)
    step = ts.make_cascade_step(model, tx, stage, lambdas=lambdas,
                                dist_lambda=1.0, pl_lambda=0.0)

    seqs = _sequences(t=4, seed=3)
    xs = jnp.stack([jnp.asarray(seqs[:, 1 + k]) for k in range(3)])
    dpb0 = make_dpb(jnp.asarray(seqs[:, 0]), 16, 24)
    rng = jax.random.PRNGKey(9)

    def unrolled_chain(params, xs, targets, dpb, rng):
        lam = jnp.asarray(lambdas, jnp.float32)
        losses, auxes = [], []
        for p_idx in range(3):
            rng, sub = jax.random.split(rng)
            _, (aux, dpb) = ts.frame_loss(
                params, model, xs[p_idx], targets[p_idx], dpb,
                lambdas=lam, dist_lambda=1.0, pl_lambda=0.0,
                loss_rate_keys=stage.loss_rate_keys,
                loss_dist_key=stage.loss_dist_key, pl_fn=None,
                noise_rng=sub, is_first_p=(p_idx == 0))
            losses.append(aux.loss)
            auxes.append(aux)
        mean_aux = jax.tree_util.tree_map(
            lambda *v: jnp.mean(jnp.stack(v), axis=0), *auxes)
        return jnp.mean(jnp.stack(losses)), (mean_aux, dpb)

    @jax.jit
    def unrolled_step(params, opt_state, xs, targets, dpb0, rng):
        (_, (aux, dpb)), grads = jax.value_and_grad(
            unrolled_chain, has_aux=True)(params, xs, targets, dpb0, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), aux

    # the cascade step donates params/opt_state — give it copies so the
    # unrolled reference step can reuse the originals
    p_scan, _, aux_scan, _ = step(tree_copy(params), tree_copy(opt_state),
                                  xs, xs,
                                  make_dpb(jnp.asarray(seqs[:, 0]), 16, 24),
                                  rng)
    p_ref, aux_ref = unrolled_step(params, opt_state, xs, xs, dpb0, rng)

    np.testing.assert_allclose(np.asarray(aux_scan.loss),
                               np.asarray(aux_ref.loss), rtol=1e-5, atol=1e-7)
    k_scan = np.asarray(
        p_scan["params"]["optic_flow"]["moduleBasic.0"]["conv1"]["kernel"])
    k_ref = np.asarray(
        p_ref["params"]["optic_flow"]["moduleBasic.0"]["conv1"]["kernel"])
    np.testing.assert_allclose(k_scan, k_ref, rtol=1e-5, atol=1e-8)


def test_cascade_remat_matches_no_remat():
    """CASCADE_REMAT replays the same ops in the backward pass — the
    parameter update must match the keep-everything variant to f32
    noise (the knob trades memory for FLOPs, never numerics)."""
    model, params = tiny_model_and_params()
    params = jax.tree_util.tree_map_with_path(
        lambda path, x: x * 0.5 if path[-1].key == "kernel" else x, params)
    stage = _stage(forward_method="cascade", p_frames=2,
                   trainable_mode="inter_dist", loss_dist_key="me_mse",
                   loss_rate_keys=())
    seqs = _sequences(t=3, seed=5)
    xs = jnp.stack([jnp.asarray(seqs[:, 1 + k]) for k in range(2)])
    rng = jax.random.PRNGKey(4)

    outs = {}
    for remat in (False, True):
        # step donates its dpb argument: build a fresh one per variant
        dpb0 = make_dpb(jnp.asarray(seqs[:, 0]), 16, 24)
        tx, opt_state = make_stage_optimizer(params, stage.trainable_mode,
                                             1e-4)
        step = ts.make_cascade_step(model, tx, stage, lambdas=[85., 170.],
                                    dist_lambda=1.0, pl_lambda=0.0,
                                    remat=remat)
        # donate copies so the second variant sees the same inputs
        p, _, aux, _ = step(tree_copy(params), opt_state, xs, xs, dpb0, rng)
        outs[remat] = (p, np.asarray(aux.loss))

    np.testing.assert_allclose(outs[True][1], outs[False][1],
                               rtol=1e-6, atol=1e-7)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        outs[True][0], outs[False][0])


# ---------------------------------------------------------- mixed precision
def test_cast_for_compute_keeps_entropy_tables_f32():
    _, params = tiny_model_and_params()
    cast = ts.cast_for_compute(params, jnp.bfloat16)
    assert cast["params"]["optic_flow"]["moduleBasic.0"]["conv1"][
        "kernel"].dtype == jnp.bfloat16
    assert cast["params"]["bit_estimator_z"]["f1"]["a"].dtype == jnp.float32
    assert cast["params"]["bit_estimator_z_mv"]["f1"]["a"
                                                      ].dtype == jnp.float32
    # masters untouched
    assert params["params"]["optic_flow"]["moduleBasic.0"]["conv1"][
        "kernel"].dtype == jnp.float32


def test_mixed_precision_step_trains_with_f32_masters():
    """SOLVER.MIXED_PRECISION: bf16 compute with f32 master params — the
    step must keep every parameter and Adam moment f32, produce a loss
    close to the f32 step's, and still train (loss decreases)."""
    model, params = tiny_model_and_params()
    # contractive weights: raw Xavier init amplifies bf16 rounding noise
    # exponentially through the recon UNets (same recipe as the sharding
    # equivalence tests)
    params = jax.tree_util.tree_map_with_path(
        lambda path, v: v * 0.5 if path[-1].key == "kernel" else v, params)
    stage = _stage(trainable_mode="inter_dist", loss_dist_key="me_mse",
                   loss_rate_keys=())
    seqs = _sequences()

    def run(compute_dtype, iters):
        tx, opt_state = make_stage_optimizer(params, stage.trainable_mode,
                                             1e-4)
        step = ts.make_single_frame_step(
            model, tx, stage, lambdas=[85., 170.], dist_lambda=1.0,
            pl_lambda=0.0, compute_dtype=compute_dtype)
        # the step donates its inputs; both run() variants share params
        p, s = tree_copy(params), opt_state
        losses = []
        rng = jax.random.PRNGKey(1)
        for _ in range(iters):
            rng, sub = jax.random.split(rng)
            p, s, aux_list = ts.run_single_sequence(
                model, step, p, s, seqs, seqs, stage, sub)
            losses.append(float(np.mean([np.mean(a.loss)
                                         for a in aux_list])))
        return losses, p

    losses_mp, p_mp = run(jnp.bfloat16, 4)
    losses_f32, _ = run(None, 1)

    # masters stay f32 through the update
    for leaf in jax.tree_util.tree_leaves(p_mp):
        assert leaf.dtype != jnp.bfloat16, "a master param was downcast"
    # the bf16 loss agrees with f32 at the % level on contractive weights
    assert np.isfinite(losses_mp).all(), losses_mp
    np.testing.assert_allclose(losses_mp[0], losses_f32[0], rtol=5e-2)
    # and training still converges
    assert losses_mp[-1] < losses_mp[0], losses_mp


# ------------------------------------------------------- grad accumulation
def test_frame_loss_anchor_slice_is_exact():
    """GRAD_ACCUM_STEPS correctness at the frame level, deterministically
    (training=False so no quantization noise): the mean of the per-group
    losses equals the full-batch loss, and the mean of the per-group
    gradients equals the full-batch gradient — including the q-scale rows,
    whose slice VJPs scatter into disjoint anchor rows."""
    model, params = tiny_model_and_params()
    seqs = _sequences(t=2, seed=7)
    x = jnp.asarray(seqs[:, 1])
    dpb = make_dpb(jnp.asarray(seqs[:, 0]), 16, 24)
    lam = jnp.asarray([85.0, 170.0])
    rng = jax.random.PRNGKey(3)
    kw = dict(dist_lambda=1.0, pl_lambda=0.0,
              loss_rate_keys=("bpp_mv_y", "bpp_mv_z"),
              loss_dist_key="me_mse", pl_fn=None, noise_rng=rng,
              is_first_p=True, training=False)

    def full(p):
        return ts.frame_loss(p, model, x, x, dpb, lambdas=lam, **kw)[0]

    def grouped(p):
        losses = []
        for g in range(2):
            dpb_g = jax.tree_util.tree_map(lambda v: v[g:g + 1], dpb)
            loss_g, _ = ts.frame_loss(
                p, model, x[g:g + 1], x[g:g + 1], dpb_g, lambdas=lam,
                anchor_start=jnp.asarray(g), anchor_count=1, **kw)
            losses.append(loss_g)
        return (losses[0] + losses[1]) / 2

    lf, gf = jax.value_and_grad(full)(params)
    lg, gg = jax.value_and_grad(grouped)(params)
    np.testing.assert_allclose(float(lf), float(lg), rtol=1e-6)
    # f32 tolerance is reassociation, not math: a batch-2 conv backward is
    # one GEMM whose K dim spans the batch, vs two batch-1 GEMMs summed.
    # The same comparison in f64 agrees to 9.3e-11 max relative across the
    # whole tree (measured), so the accumulation identity is exact.
    # (pure rtol is meaningless on near-cancelling elements, so the atol
    # scales with each leaf's gradient magnitude — loose enough for CPU
    # oneDNN's orderings, tight enough that a wrong scale factor or anchor
    # row — O(1) relative to the leaf scale — can never pass)
    def _close(a, b):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.max(np.abs(a))), 1e-8)
        np.testing.assert_allclose(a, b, rtol=1e-2, atol=1e-3 * scale)

    jax.tree_util.tree_map(_close, gf, gg)
    # the sliced q-scale rows actually received gradient
    assert np.any(np.asarray(gg["params"]["mv_y_q_scale"]) != 0)


def test_cascade_grad_accum_step_runs_with_replica_tiling():
    """accum_steps=2 plumbing through the jitted cascade step: grouping /
    ungrouping of a k=2-replica batch (4 rows, 2 anchors), per-anchor aux
    ordering, finite losses, a real parameter update, and freezing held.
    (Exact equality with accum=1 is impossible: quantization noise draws
    are batch-shaped — the math itself is pinned exactly by
    test_frame_loss_anchor_slice_is_exact.)"""
    model, params = tiny_model_and_params()
    params = jax.tree_util.tree_map_with_path(
        lambda path, x: x * 0.5 if path[-1].key == "kernel" else x, params)
    stage = _stage(forward_method="cascade", p_frames=2,
                   trainable_mode="inter_dist", loss_dist_key="me_mse",
                   loss_rate_keys=())
    seqs = np.concatenate([_sequences(t=3, seed=8)] * 2, axis=0)  # k=2
    xs = jnp.stack([jnp.asarray(seqs[:, 1 + k]) for k in range(2)])
    dpb0 = make_dpb(jnp.asarray(seqs[:, 0]), 16, 24)
    tx, opt_state = make_stage_optimizer(params, stage.trainable_mode, 1e-4)
    step = ts.make_cascade_step(model, tx, stage, lambdas=[85., 170.],
                                dist_lambda=1.0, pl_lambda=0.0,
                                accum_steps=2)
    frozen_before = np.asarray(
        params["params"]["contextual_decoder"]["up1"]["0"]["kernel"])
    flow_before = np.asarray(
        params["params"]["optic_flow"]["moduleBasic.0"]["conv1"]["kernel"])
    p, s, aux, dpb = step(params, opt_state, xs, xs, dpb0,
                          jax.random.PRNGKey(11))
    assert aux.loss.shape == (2,) and np.all(np.isfinite(np.asarray(aux.loss)))
    # the ungrouped DPB restores the full (k * anchors) batch shape
    assert dpb["ref_frame"].shape[0] == 4
    assert np.all(np.isfinite(np.asarray(dpb["ref_frame"])))
    assert np.any(np.asarray(
        p["params"]["optic_flow"]["moduleBasic.0"]["conv1"]["kernel"])
        != flow_before)
    np.testing.assert_array_equal(
        np.asarray(p["params"]["contextual_decoder"]["up1"]["0"]["kernel"]),
        frozen_before)


def test_cascade_grad_accum_must_divide_anchors():
    model, _ = tiny_model_and_params()
    stage = _stage(forward_method="cascade", p_frames=2)
    with pytest.raises(ValueError):
        ts.make_cascade_step(model, None, stage, lambdas=[85., 170., 380.],
                             dist_lambda=1.0, pl_lambda=0.0, accum_steps=2)
