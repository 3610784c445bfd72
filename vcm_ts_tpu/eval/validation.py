"""Validation: no-grad eval over the test loader (+ optional detection mAP).

Equivalent of the reference eval_dataset (core/engine/validation.py:67-215):
re-uses the training forward (training=False, no optimizer) and aggregates
rate/dist/loss/bpp/psnr per rate anchor. The object-detection mAP branch
mirrors the reference protocol (every OD_GOP_SIZE-th frame re-keyed by the
I-frame net, others chained via forward_simple, detections on decoded
frames); it requires a detector adapter — torchvision/ultralytics are not in
this image, so a numpy mAP implementation lives in
vcm_ts_tpu/eval/detection_metrics.py and the detector hook is pluggable.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dmc import make_dpb
from ..train.train_step import frame_loss


def eval_dataset(model, params, stage, data_loader, cfg, lambdas,
                 i_frame_fn=None, pl_fn=None,
                 od_loader=None, detector_fn=None):
    """Returns dict of per-lambda metric arrays."""
    logger = logging.getLogger("CORE")
    lambdas_arr = jnp.asarray(lambdas, jnp.float32)
    pl = pl_fn if stage.perceptual_loss else None

    losses, rates, dists, p_dists, bpps, psnrs = [], [], [], [], [], []
    rng = jax.random.PRNGKey(0)

    from functools import partial

    @partial(jax.jit, static_argnums=(5,))
    def eval_frame(params, x, target, dpb, rng, is_first_p):
        return frame_loss(params, model, x, target, dpb,
                          lambdas=lambdas_arr,
                          dist_lambda=cfg.SOLVER.DIST_LAMBDA,
                          pl_lambda=cfg.SOLVER.PL_LAMBDA,
                          loss_rate_keys=stage.loss_rate_keys,
                          loss_dist_key=stage.loss_dist_key,
                          pl_fn=pl, noise_rng=rng, is_first_p=is_first_p,
                          training=False)

    # data_loader may be None for detection-only eval (TEST_OD_ROOT_DIRS
    # configured without TEST_ROOT_DIRS): skip the RD sweep, keep the mAP
    # branch reachable.
    for inputs, targets in (data_loader or ()):
        t = inputs.shape[1]
        p_frames = min(stage.p_frames, t - 1)
        for t_i in range(t - p_frames):
            ref = (i_frame_fn(inputs[:, t_i]) if i_frame_fn is not None
                   else inputs[:, t_i])
            dpb = make_dpb(jnp.asarray(ref), model.channel_N, model.channel_M)
            for p_idx in range(p_frames):
                rng, sub = jax.random.split(rng)
                _, (aux, dpb) = eval_frame(
                    params, jnp.asarray(inputs[:, t_i + 1 + p_idx]),
                    jnp.asarray(targets[:, t_i + 1 + p_idx]), dpb, sub,
                    p_idx == 0)
                losses.append(np.asarray(aux.loss))
                rates.append(np.asarray(aux.rate))
                dists.append(np.asarray(aux.dist))
                p_dists.append(np.asarray(aux.p_dist))
                bpps.append(np.asarray(aux.bpp))
                psnrs.append(np.asarray(aux.psnr))

    result = {} if not losses else {
        "loss": np.mean(losses, axis=0),
        "rate": np.mean(rates, axis=0),
        "dist": np.mean(dists, axis=0),
        "p_dist": np.mean(p_dists, axis=0),
        "bpp": np.mean(bpps, axis=0),
        "psnr": np.mean(psnrs, axis=0),
    }

    # ------------------------------------------------- detection mAP branch
    # stage.stage is the 0-based curriculum index; the reference gates on
    # the 1-based stage number (train.py:316 passes stage+1), so +1 keeps
    # OD_STAGE values transferable between config trees.
    if (od_loader is not None and detector_fn is not None
            and stage.stage + 1 >= cfg.DATASET.OD_STAGE):
        # The RD-eval i_frame_fn maps a rate-batched frame stack through
        # per-row q scales; the OD rekey wants all n rate rows of ONE
        # image, so tile once and run the batched forward once per rekey
        # (not once per rate row).
        n = len(lambdas)
        od_i_fn = (None if i_frame_fn is None else
                   lambda x: i_frame_fn(
                       jnp.tile(jnp.asarray(x), (n, 1, 1, 1))))
        result["mean_ap"] = eval_object_detection(
            model, params, cfg, lambdas, od_loader, detector_fn, od_i_fn)
    elif od_loader is not None and detector_fn is None:
        logger.warning("OD loader given but no detector adapter available; "
                       "skipping mAP eval")
    # (od_loader set, detector present, stage below OD_STAGE: silent —
    # the mAP branch simply hasn't activated yet, nothing is wrong)
    return result


def eval_object_detection(model, params, cfg, lambdas, od_loader,
                          detector_fn, i_frame_fn):
    """Detection-mAP protocol (validation.py:132-199): every OD_GOP_SIZE-th
    frame re-keyed via the I-frame path, others chained per rate anchor via
    the plain forward (the reference's forward_simple); detector runs on the
    decoded frames; mAP per rate anchor.

    The rate anchors ride the BATCH axis of one jitted forward (the q-scale
    params are per-sample (N,1,1,1) tensors) — one device pass per frame
    instead of the reference's sequential per-rate loop, cutting eval wall
    clock ~n_rates x. The host-side detector still runs per decoded row."""
    from .detection_metrics import MeanAveragePrecision

    from functools import partial

    n = len(lambdas)
    maps = [MeanAveragePrecision() for _ in range(n)]
    dpb = None  # batched: row r is rate anchor r's chained DPB
    first_p = False  # True exactly for the first chained frame after a rekey

    mv_qs = params["params"]["mv_y_q_scale"]
    y_qs = params["params"]["y_q_scale"]

    @partial(jax.jit, static_argnums=(3,))
    def simple_forward(params, x, dpb, is_first_p):
        # The first P-frame after a GOP rekey must use the I-frame feature
        # adaptor — the reference infers this from ref_feature being None
        # (video_model.py:226-231); our dense DPB needs the explicit flag.
        out = model.apply(params, x, dpb, mv_qs[:n], y_qs[:n], is_first_p,
                          training=False)
        return out["dpb"]

    for idx, (image, annotations) in enumerate(od_loader):
        x = jnp.asarray(image[0])  # (1, H, W, C)
        rekey = idx % cfg.DATASET.OD_GOP_SIZE == 0
        if rekey:
            # i_frame_fn maps (1,H,W,C) -> all n rate rows in one batched
            # I-frame pass (rate anchors ride the batch axis here too)
            ref_batch = (jnp.asarray(i_frame_fn(x))
                         if i_frame_fn is not None
                         else jnp.tile(x, (n, 1, 1, 1)))
            dpb = make_dpb(ref_batch, model.channel_N, model.channel_M)
        else:
            dpb = simple_forward(params, jnp.tile(x, (n, 1, 1, 1)), dpb,
                                 first_p)
        decoded = np.asarray(jnp.clip(dpb["ref_frame"], 0, 1))
        for r in range(n):
            preds = detector_fn(decoded[r:r + 1])
            maps[r].update(preds, annotations[0])
        first_p = rekey

    return np.asarray([m.compute()["map"] for m in maps])
