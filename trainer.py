"""Single-host training CLI.

Equivalent of the reference trainer.py:17-94: merge config from YAML +
remaining CLI opts, freeze, back up the frozen config to OUTPUT_DIR, build
model / loaders / checkpointer, optional I-frame-net bootstrap with q-scale
interpolation (core/engine/train.py:197-214), run the stage curriculum.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def train_model(cfg, args):
    import jax
    import jax.numpy as jnp

    from vcm_ts_tpu.data import make_data_loader
    from vcm_ts_tpu.models.dmc import DMC, make_dpb
    from vcm_ts_tpu.train.checkpoint import CheckPointer
    from vcm_ts_tpu.train.train_loop import do_train
    from vcm_ts_tpu.utils.common import enable_debug_nans, interpolate_log
    from vcm_ts_tpu.utils.logger import setup_logger

    logger = setup_logger("CORE", 0, cfg.OUTPUT_DIR)
    if cfg.SOLVER.DEBUG_NANS:
        enable_debug_nans()
        logger.info("debug_nans sanitizer ON (steps serialize; debug only)")

    cmv, cn, cm = cfg.MODEL.CHANNELS
    model = DMC(anchor_num=len(cfg.SOLVER.LAMBDAS), channel_mv=cmv,
                channel_N=cn, channel_M=cm)
    x0 = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(args.seed), x0,
                        make_dpb(x0, cn, cm), 1.0, 1.0, method="init_all")

    checkpointer = CheckPointer(cfg.OUTPUT_DIR, logger)
    start_epoch = 0
    resume_opt_blob = b""
    if cfg.MODEL.PRETRAINED_WEIGHTS or checkpointer.has_checkpoint():
        params, _, extra = checkpointer.load(
            params, path=cfg.MODEL.PRETRAINED_WEIGHTS or None)
        start_epoch = int(extra.get("epoch", 0))
        # raw bytes: the opt template only exists once do_train enters the
        # resumed stage; it restores these there on a mid-stage resume
        resume_opt_blob = checkpointer.load_opt_blob(
            path=cfg.MODEL.PRETRAINED_WEIGHTS or None)

    # I-frame bootstrap (train.py:197-214)
    i_frame_fn = None
    if cfg.MODEL.I_FRAME_PRETRAINED_WEIGHTS:
        from vcm_ts_tpu.models.intra import IntraNoAR
        from vcm_ts_tpu.utils.weight_import import (
            get_i_frame_q_scales_from_ckpt, import_state_dict,
            load_torch_state_dict)

        i_model = IntraNoAR()
        i_params = i_model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 64, 64, 3)), 1.0)
        path = cfg.MODEL.I_FRAME_PRETRAINED_WEIGHTS
        if path.endswith(".pth"):
            i_params = import_state_dict(i_params,
                                         load_torch_state_dict(path))
            q_scales = get_i_frame_q_scales_from_ckpt(path)
        else:
            i_params, _, _ = CheckPointer().load(i_params, path=path)
            q_scales = np.asarray(
                i_params["params"]["q_scale"]).reshape(-1)
        n = len(cfg.SOLVER.LAMBDAS)
        if len(q_scales) != n:
            q_scales = interpolate_log(q_scales[-1], q_scales[0], n)
        q = jnp.asarray(q_scales, jnp.float32).reshape(-1, 1, 1, 1)

        i_fwd = jax.jit(lambda p, x, q: jnp.clip(
            i_model.apply(p, x, q)["x_hat"], 0, 1))

        def i_frame_fn(batch):
            return i_fwd(i_params, jnp.asarray(batch), q)

    pl_fn = None
    if any(stage[7] == "true" for stage in cfg.SOLVER.STAGES):
        from vcm_ts_tpu.train.losses import get_perceptual_loss
        pl_fn = get_perceptual_loss(cfg)

    train_loader = make_data_loader(cfg, args.seed, is_train=True)
    test_loader = (make_data_loader(cfg, args.seed, is_train=False)
                   if cfg.DATASET.TEST_ROOT_DIRS else None)

    # OD-mAP during training (reference train.py:308-337 ->
    # validation.py:132-199): built when TEST_OD_ROOT_DIRS is configured;
    # the detector adapter is pluggable and gates on its model zoo.
    od_loader = detector_fn = None
    if (cfg.DATASET.TEST_OD_ROOT_DIRS
            and len(cfg.SOLVER.STAGES) + 1 > cfg.DATASET.OD_STAGE):
        # only build (and hold ~180 MB of detector weights for the whole
        # run) when the configured curriculum actually reaches OD_STAGE;
        # eval_dataset gates per-stage (stage+1 >= OD_STAGE)
        from vcm_ts_tpu.data import make_object_detection_data_loader
        from vcm_ts_tpu.eval.detector import build_eval_detector
        od_loader = make_object_detection_data_loader(cfg)
        detector_fn = build_eval_detector(cfg)

    return do_train(cfg, model, params, train_loader, checkpointer,
                    start_epoch=start_epoch, seed=args.seed,
                    test_loader=test_loader, i_frame_fn=i_frame_fn,
                    pl_fn=pl_fn, od_loader=od_loader,
                    detector_fn=detector_fn,
                    resume_opt_blob=resume_opt_blob)


def main():
    parser = argparse.ArgumentParser(description="TPU DCVC-HEM training")
    parser.add_argument("--config-file", type=str, default="",
                        help="path to yaml config")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER,
                        help="overrides: KEY VALUE pairs")
    args = parser.parse_args()

    from vcm_ts_tpu.train.config import default_training_cfg

    cfg = default_training_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    with open(os.path.join(cfg.OUTPUT_DIR, "cfg.yaml"), "w") as f:
        f.write(cfg.dump())

    train_model(cfg, args)


if __name__ == "__main__":
    main()
