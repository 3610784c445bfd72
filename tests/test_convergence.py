"""From-scratch training convergence mechanics (VERDICT round-2 item 7).

A short synthetic overfit through the full do_train curriculum (6 stages,
reference-shaped: me -> me+rate -> rec -> rec+rate -> all -> all-cascade)
with gradient clipping. Full convergence evidence lives in PERF.md (TPU
run, 100 iters/stage: eval PSNR -95 -> positive dB); this CI-sized run
asserts the load-bearing mechanics on CPU:

- the curriculum executes end to end from random init without NaN/crash,
- the recon stage's rate-loss collapse happens (at random init the
  factorized/gaussian rate estimates are astronomically large; the first
  recon+rate steps must pull the loss down by orders of magnitude),
- metrics.jsonl carries the per-stage trail the overfit driver parses.
"""

import json
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_overfit_curriculum_mechanics(tmp_path):
    from tools.overfit_run import run

    class A:
        iters = 8
        epochs = 1
        size = 64
        lr = 1e-4
        seed = 0
        tiny = True
        out = str(tmp_path)
        bf16_check = False

    rc = run(A())
    # rc only asserts full convergence (needs a longer run); mechanics are
    # checked below regardless.
    metrics = [json.loads(l) for l in
               open(os.path.join(str(tmp_path), "metrics.jsonl"))]
    stage_by_step = {m["step"]: int(m["value"]) for m in metrics
                     if m["tag"] == "train/stage"}
    assert set(stage_by_step.values()) == {0, 1, 2, 3, 4, 5}

    losses = [(m["step"], m["value"]) for m in metrics
              if m["tag"].startswith("train/loss/lambda_85")]
    assert losses and all(np.isfinite(v) for _, v in losses)

    # the rec+rate stage (idx 3) must collapse its random-init rate blowup
    s3 = [v for step, v in losses if stage_by_step.get(step) == 3]
    assert len(s3) >= 8
    assert s3[-1] < s3[0] * 0.5, (s3[0], s3[-1])


def test_p4_curriculum_wiring(tmp_path):
    """--p4 appends the reference curriculum's final depth: a p_frames=4
    cascade stage on 5-frame sequences (reference training_settings.py
    stages 9-10), extending max_epoch so a completed 6-stage checkpoint
    warm-starts directly into the new stage."""
    from tools.overfit_run import build_cfg
    from vcm_ts_tpu.train.stages import calc_max_epoch, get_stage_params

    class A:
        iters = 8
        epochs = 1
        size = 64
        lr = 1e-4
        seed = 0
        tiny = True
        out = ""
        bf16_check = False

    class A4(A):
        p4 = True

    A.out = A4.out = str(tmp_path)
    base = build_cfg(A(), [16, 16, 24], [85.0, 170.0])
    p4 = build_cfg(A4(), [16, 16, 24], [85.0, 170.0])

    assert len(p4.SOLVER.STAGES) == len(base.SOLVER.STAGES) + 1
    assert p4.SOLVER.STAGES[:-1] == base.SOLVER.STAGES
    last = get_stage_params(p4, calc_max_epoch(p4.SOLVER.STAGES) - 1)
    assert last.p_frames == 4 and last.forward_method == "cascade"
    assert base.DATASET.SEQUENCE_LENGTH == 3
    assert p4.DATASET.SEQUENCE_LENGTH == 5  # 1 I-frame + 4 P-frames
    # warm-start contract: the 6-stage run's final epoch stamp equals the
    # 7-stage schedule's p4-stage start epoch
    assert calc_max_epoch(p4.SOLVER.STAGES) == \
        calc_max_epoch(base.SOLVER.STAGES) + 1


def _tiny_train_setup(n_epochs, out_dir):
    import jax
    import jax.numpy as jnp

    from tools.overfit_run import OverfitLoader, make_synthetic_batch
    from vcm_ts_tpu.models.dmc import DMC, make_dpb
    from vcm_ts_tpu.train.config import default_training_cfg

    cfg = default_training_cfg()
    cfg.MODEL.CHANNELS = [16, 16, 24]
    cfg.SOLVER.LAMBDAS = [85.0, 170.0]
    cfg.DATASET.SEQUENCE_LENGTH = 2
    cfg.SOLVER.GRAD_CLIP_NORM = 1.0
    cfg.SOLVER.STAGES = [
        ["1", "me", "single", "me", "none", "1e-4", str(n_epochs), "false"],
    ]
    cfg.OUTPUT_DIR = out_dir
    cfg.TENSORBOARD.BEST_SAMPLES_NUM = 0
    cfg.TENSORBOARD.WORST_SAMPLES_NUM = 0
    cfg.freeze()

    model = DMC(anchor_num=2, channel_mv=16, channel_N=16, channel_M=24)
    x0 = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x0, make_dpb(x0, 16, 24),
                        1.0, 1.0, method="init_all")
    loader = OverfitLoader(make_synthetic_batch(2, 2, 64), 1)
    return cfg, model, params, loader


@pytest.mark.slow
def test_midstage_resume_restores_opt_state(tmp_path, caplog):
    """A resume that lands mid-stage must restore the saved Adam moments
    into the freshly built stage optimizer; a resume at a stage boundary
    must not (the optimizer is rebuilt from scratch there by design)."""
    import logging

    from vcm_ts_tpu.train.checkpoint import CheckPointer
    from vcm_ts_tpu.train.train_loop import do_train

    out = str(tmp_path)
    # epoch 0 of what will be a 2-epoch stage, checkpointed
    cfg1, model, params, loader = _tiny_train_setup(1, out)
    ckpt = CheckPointer(out)
    do_train(cfg1, model, params, loader, checkpointer=ckpt)
    blob = ckpt.load_opt_blob()
    assert blob, "checkpoint carries no serialized opt_state"

    # resume at epoch 1 of the 2-epoch stage: mid-stage -> restore
    cfg2, model2, params2, loader2 = _tiny_train_setup(2, out)
    params2, _, extra = ckpt.load(params2)
    assert int(extra["epoch"]) == 1
    with caplog.at_level(logging.INFO, logger="CORE"):
        do_train(cfg2, model2, params2, loader2, checkpointer=None,
                 start_epoch=1, resume_opt_blob=blob)
    assert any("Restored optimizer state" in r.message
               for r in caplog.records)

    # same blob, but start_epoch sits at a stage boundary -> no restore
    caplog.clear()
    cfg3 = default_two_stage_cfg(out)
    _, model3, params3, loader3 = _tiny_train_setup(1, out)
    with caplog.at_level(logging.INFO, logger="CORE"):
        do_train(cfg3, model3, params3, loader3, checkpointer=None,
                 start_epoch=1, resume_opt_blob=blob)
    assert not any("Restored optimizer state" in r.message
                   for r in caplog.records)


def default_two_stage_cfg(out_dir):
    from vcm_ts_tpu.train.config import default_training_cfg

    cfg = default_training_cfg()
    cfg.MODEL.CHANNELS = [16, 16, 24]
    cfg.SOLVER.LAMBDAS = [85.0, 170.0]
    cfg.DATASET.SEQUENCE_LENGTH = 2
    cfg.SOLVER.GRAD_CLIP_NORM = 1.0
    cfg.SOLVER.STAGES = [
        ["1", "me", "single", "me", "none", "1e-4", "1", "false"],
        ["1", "rec", "single", "rec", "none", "1e-4", "1", "false"],
    ]
    cfg.OUTPUT_DIR = out_dir
    cfg.TENSORBOARD.BEST_SAMPLES_NUM = 0
    cfg.TENSORBOARD.WORST_SAMPLES_NUM = 0
    cfg.freeze()
    return cfg
