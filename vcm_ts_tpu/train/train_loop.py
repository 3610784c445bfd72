"""The training driver: stage curriculum over epochs, per-iteration steps,
periodic eval + checkpointing.

Equivalent of the reference do_train (core/engine/train.py:162-351) and its
DDP variant (train_multi.py:271-560), unified: the same jitted step runs
single-device or mesh-data-parallel depending on how the caller sharded the
batch. Stage boundaries rebuild the masked optimizer (the reference DDP
re-inits the model there, train_multi.py:194-200); per-frame stepping stays
inside run_single_sequence / run_cascade_sequence.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..eval.validation import eval_dataset
from .optimizer import make_stage_optimizer
from .stages import calc_max_epoch, get_stage_params
from .tensorboard import BestWorstSampleTracker, MetricWriter
from .train_step import (make_cascade_step, make_single_frame_step,
                         run_cascade_sequence, run_single_sequence)


def _mean_aux(aux_list):
    return {
        "loss": np.mean([np.asarray(a.loss) for a in aux_list], axis=0),
        "rate": np.mean([np.asarray(a.rate) for a in aux_list], axis=0),
        "dist": np.mean([np.asarray(a.dist) for a in aux_list], axis=0),
        "p_dist": np.mean([np.asarray(a.p_dist) for a in aux_list], axis=0),
        "bpp": np.mean([np.asarray(a.bpp) for a in aux_list], axis=0),
        "psnr": np.mean([np.asarray(a.psnr) for a in aux_list], axis=0),
    }


def do_train(cfg, model, params, data_loader, checkpointer,
             start_epoch: int = 0, seed: int = 0,
             test_loader=None, i_frame_fn=None, pl_fn=None,
             world_size: int = 1, is_main: bool = True,
             writer: Optional[MetricWriter] = None,
             max_iterations_per_epoch: Optional[int] = None,
             mesh=None, od_loader=None, detector_fn=None,
             resume_opt_blob: bytes = b"", fsdp: bool = False):
    """Runs the full stage curriculum; returns final params.

    With `mesh` (a jax.sharding.Mesh with a "data" axis, possibly spanning
    multiple processes), training is mesh-data-parallel: params/opt_state
    are replicated onto the mesh, each process's loader batch becomes its
    slice of one global sharded batch, and the gradient all-reduce is
    XLA-derived — the reference's DDP (train_multi.py:203-268) with no
    explicit collectives. The PRNG seed must then be identical on all
    processes (the jitted step's inputs must agree globally)."""
    from functools import partial

    logger = logging.getLogger("CORE")
    max_epoch = calc_max_epoch(cfg.SOLVER.STAGES)
    lambdas = [float(v) for v in cfg.SOLVER.LAMBDAS]
    # lr scaling by sqrt(world_size), reference train_multi.py:158-160
    lr_scale = float(np.sqrt(world_size))

    multiprocess = mesh is not None and jax.process_count() > 1
    if mesh is not None:
        from ..parallel import mesh as pm
        to_device = partial(pm.global_batch, mesh=mesh)
        to_device_seq = partial(pm.global_batch, mesh=mesh, batch_dim=1)
    else:
        pm = None
        to_device, to_device_seq = jnp.asarray, jnp.asarray

    if writer is None and is_main:
        writer = MetricWriter(cfg.OUTPUT_DIR)
    tracker = None
    # the sample tracker reads decoded frames host-side; with a
    # process-spanning mesh those rows are not all addressable locally
    if (is_main and not multiprocess
            and (cfg.TENSORBOARD.BEST_SAMPLES_NUM > 0
                 or cfg.TENSORBOARD.WORST_SAMPLES_NUM > 0)):
        tracker = BestWorstSampleTracker(
            lambdas, cfg.TENSORBOARD.BEST_SAMPLES_NUM,
            cfg.TENSORBOARD.WORST_SAMPLES_NUM)

    cur_stage_idx = -1
    tx = opt_state = step_fn = None
    rng = jax.random.PRNGKey(seed)
    global_step = start_epoch * max(1, len(data_loader))

    for epoch in range(start_epoch, max_epoch):
        stage = get_stage_params(cfg, epoch)
        if stage.stage != cur_stage_idx:
            cur_stage_idx = stage.stage
            logger.info("Entering stage %d: %s", stage.stage, stage)
            tx, opt_state = make_stage_optimizer(
                params, stage.trainable_mode, stage.lr * lr_scale,
                grad_clip_norm=float(
                    getattr(cfg.SOLVER, "GRAD_CLIP_NORM", 0.0)))
            # Mid-stage resume: restore the saved Adam moments into the
            # freshly built optimizer, else the resumed trajectory differs
            # from an uninterrupted run. Only applies when start_epoch is
            # not this stage's first epoch — at a stage boundary the
            # optimizer is rebuilt from scratch by design (and the saved
            # blob has the previous stage's mask structure anyway).
            if (resume_opt_blob and epoch == start_epoch and start_epoch > 0
                    and get_stage_params(cfg, start_epoch - 1).stage
                    == stage.stage):
                from flax import serialization
                try:
                    opt_state = serialization.from_bytes(
                        opt_state, resume_opt_blob)
                    logger.info("Restored optimizer state mid-stage "
                                "(epoch %d)", start_epoch)
                except Exception as e:  # structure drift: warn, keep fresh
                    logger.warning("Could not restore optimizer state "
                                   "(%s); continuing with fresh moments", e)
            shard_constraint = None
            if mesh is not None:
                # Weight-sharding axis: "model" on a 2D data×model mesh
                # (trainer_multi --tp), or the batch's own "data" axis for
                # FSDP/ZeRO (trainer_multi --fsdp). Either way the batch
                # still shards over "data" below, and the step pins its
                # updated params/moments back to the canonical layout so
                # GSPMD's output-layout choices can't drift it.
                w_axis = None
                if "model" in mesh.axis_names and mesh.shape["model"] > 1:
                    w_axis = "model"
                elif fsdp:
                    w_axis = "data"
                if w_axis is not None:
                    from ..parallel import tensor as tpar
                    params = tpar.shard_params_tp(params, mesh, axis=w_axis)
                    opt_state = tpar.shard_params_tp(opt_state, mesh,
                                                     axis=w_axis)
                    shard_constraint = partial(tpar.constrain_tp, mesh=mesh,
                                               axis=w_axis)
                else:
                    params = pm.replicate(params, mesh)
                    opt_state = pm.replicate(opt_state, mesh)
            pl = pl_fn if stage.perceptual_loss else None
            compute_dtype = (jnp.bfloat16 if getattr(
                cfg.SOLVER, "MIXED_PRECISION", False) else None)
            if stage.forward_method == "single":
                step_fn = make_single_frame_step(
                    model, tx, stage, lambdas=lambdas,
                    dist_lambda=cfg.SOLVER.DIST_LAMBDA,
                    pl_lambda=cfg.SOLVER.PL_LAMBDA, pl_fn=pl,
                    compute_dtype=compute_dtype,
                    shard_constraint=shard_constraint)
            else:
                step_fn = make_cascade_step(
                    model, tx, stage, lambdas=lambdas,
                    dist_lambda=cfg.SOLVER.DIST_LAMBDA,
                    pl_lambda=cfg.SOLVER.PL_LAMBDA, pl_fn=pl,
                    remat=getattr(cfg.SOLVER, "CASCADE_REMAT", True),
                    compute_dtype=compute_dtype,
                    shard_constraint=shard_constraint,
                    accum_steps=int(getattr(cfg.SOLVER,
                                            "GRAD_ACCUM_STEPS", 1)))

        data_loader.set_epoch(epoch)
        for it, (inputs, targets) in enumerate(data_loader):
            if (max_iterations_per_epoch is not None
                    and it >= max_iterations_per_epoch):
                break
            rng, sub = jax.random.split(rng)
            sample_cb = tracker.update if tracker is not None else None
            if stage.forward_method == "single":
                params, opt_state, aux_list = run_single_sequence(
                    model, step_fn, params, opt_state, inputs, targets,
                    stage, sub, i_frame_fn=i_frame_fn, sample_cb=sample_cb,
                    to_device=to_device)
            else:
                params, opt_state, aux_list = run_cascade_sequence(
                    model, step_fn, params, opt_state, inputs, targets,
                    stage, sub, i_frame_fn=i_frame_fn, sample_cb=sample_cb,
                    to_device=to_device, to_device_seq=to_device_seq)
            global_step += 1
            if is_main and writer is not None:
                m = _mean_aux(aux_list)
                writer.add_metrics("train", m, lambdas, global_step)
                writer.add_scalar("train/stage", stage.stage, global_step)
                writer.add_scalar("train/lr", stage.lr * lr_scale, global_step)
                logger.info(
                    "epoch %d it %d stage %d loss %.4f bpp %s psnr %s",
                    epoch, it, stage.stage, float(m["loss"].mean()),
                    np.round(m["bpp"], 4), np.round(m["psnr"], 2))

        if tracker is not None and writer is not None:
            tracker.write(writer, global_step)

        # With sharded weights (TP/FSDP) the host fetch is a cross-process
        # allgather — a COLLECTIVE — so EVERY process must participate, not
        # just rank 0. This pre-fetch is gated on a condition all ranks
        # agree on (sharding mode), never on rank-local state like
        # checkpointer/od_loader being present.
        host_params = host_opt = None
        if multiprocess and shard_constraint is not None:
            host_params = pm.host_copy(params)
            host_opt = pm.host_copy(opt_state)
        if is_main and (test_loader is not None or od_loader is not None
                        or checkpointer is not None):
            # Rank-0-only work must not touch process-spanning arrays:
            # replicated globals are fetched to host first (the reference's
            # rank-0 .module unwrap, train_multi.py:515-529).
            if host_params is None:
                host_params = (pm.host_copy(params) if multiprocess
                               else params)
                host_opt = (pm.host_copy(opt_state) if multiprocess
                            else opt_state)
            if test_loader is not None or od_loader is not None:
                # the OD-mAP branch (reference train.py:308-337) activates
                # once the curriculum reaches cfg.DATASET.OD_STAGE;
                # test_loader may be None for detection-only eval configs
                eval_metrics = eval_dataset(
                    model, host_params, stage, test_loader, cfg, lambdas,
                    i_frame_fn=i_frame_fn, pl_fn=pl_fn,
                    od_loader=od_loader,
                    detector_fn=detector_fn)
                if writer is not None:
                    writer.add_metrics("eval", eval_metrics, lambdas,
                                       global_step)
            if checkpointer is not None:
                checkpointer.save(f"model_epoch_{epoch:03d}", host_params,
                                  host_opt, epoch=epoch + 1)

    return params
