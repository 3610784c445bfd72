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

    for inputs, targets in data_loader:
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

    result = {
        "loss": np.mean(losses, axis=0),
        "rate": np.mean(rates, axis=0),
        "dist": np.mean(dists, axis=0),
        "p_dist": np.mean(p_dists, axis=0),
        "bpp": np.mean(bpps, axis=0),
        "psnr": np.mean(psnrs, axis=0),
    }

    # ------------------------------------------------- detection mAP branch
    if (od_loader is not None and detector_fn is not None
            and stage.stage >= cfg.DATASET.OD_STAGE):
        result["mean_ap"] = eval_object_detection(
            model, params, cfg, lambdas, od_loader, detector_fn, i_frame_fn)
    elif od_loader is not None:
        logger.warning("OD loader given but no detector adapter available; "
                       "skipping mAP eval")
    return result


def eval_object_detection(model, params, cfg, lambdas, od_loader,
                          detector_fn, i_frame_fn):
    """Detection-mAP protocol (validation.py:132-199): every OD_GOP_SIZE-th
    frame re-keyed via the I-frame path, others chained per rate anchor via
    the plain forward (the reference's forward_simple); detector runs on the
    decoded frames; mAP per rate anchor."""
    from .detection_metrics import MeanAveragePrecision

    from functools import partial

    n = len(lambdas)
    maps = [MeanAveragePrecision() for _ in range(n)]
    dpbs = [None] * n
    first_p = False  # True exactly for the first chained frame after a rekey

    @partial(jax.jit, static_argnums=(5,))
    def simple_forward(params, x, dpb, mv_q, y_q, is_first_p):
        # The first P-frame after a GOP rekey must use the I-frame feature
        # adaptor — the reference infers this from ref_feature being None
        # (video_model.py:226-231); our dense DPB needs the explicit flag.
        out = model.apply(params, x, dpb, mv_q, y_q, is_first_p,
                          training=False)
        return out["dpb"]

    mv_qs = params["params"]["mv_y_q_scale"]
    y_qs = params["params"]["y_q_scale"]

    for idx, (image, annotations) in enumerate(od_loader):
        x = jnp.asarray(image[0])  # (1, H, W, C)
        rekey = idx % cfg.DATASET.OD_GOP_SIZE == 0
        for r in range(n):
            if rekey:
                ref = i_frame_fn(x, r) if i_frame_fn is not None else x
                dpbs[r] = make_dpb(jnp.asarray(ref), model.channel_N,
                                   model.channel_M)
                decoded = dpbs[r]["ref_frame"]
            else:
                dpbs[r] = simple_forward(params, x, dpbs[r],
                                         mv_qs[r:r + 1], y_qs[r:r + 1],
                                         first_p)
                decoded = dpbs[r]["ref_frame"]
            preds = detector_fn(np.asarray(jnp.clip(decoded, 0, 1)))
            maps[r].update(preds, annotations[0])
        first_p = rekey

    return np.asarray([m.compute()["map"] for m in maps])
