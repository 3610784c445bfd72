"""Multi-host / multi-chip training CLI.

Equivalent of the reference trainer_multi.py:16-111 (torchrun + NCCL DDP),
TPU-native: jax.distributed.initialize() replaces init_process_group; the
device mesh + sharded global batch replace DistributedDataParallel; the
gradient all-reduce rides ICI via XLA (see vcm_ts_tpu/parallel/mesh.py).
Rank-0-only logging/dirs, per-epoch loader sharding (DistributedSampler
equivalent), sqrt(world_size) lr scaling — all mirrored from the reference.

Launch: one process per host (TPU runtime discovers peers), e.g.
  python trainer_multi.py --config-file cfg.yaml
"""

from __future__ import annotations

import argparse
import os


def main():
    parser = argparse.ArgumentParser(description="TPU multi-host training")
    parser.add_argument("--config-file", type=str, default="")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel width: shard weights + Adam "
                             "moments over a 'model' mesh axis of this "
                             "size (must divide the local device count); "
                             "1 = pure data parallelism")
    parser.add_argument("--fsdp", action="store_true",
                        help="FSDP/ZeRO: shard weights + Adam moments over "
                             "the same 'data' axis as the batch (GSPMD "
                             "all-gathers weights per layer; param/opt "
                             "memory drops ~1/n_devices per chip). "
                             "Mutually exclusive with --tp")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    from vcm_ts_tpu.parallel import mesh as pm

    pm.initialize_distributed()
    rank = pm.get_rank()
    world_size = pm.get_world_size()

    from vcm_ts_tpu.train.config import default_training_cfg

    cfg = default_training_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    if rank == 0:
        os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
        with open(os.path.join(cfg.OUTPUT_DIR, "cfg.yaml"), "w") as f:
            f.write(cfg.dump())
    pm.synchronize()

    import jax
    import jax.numpy as jnp

    from vcm_ts_tpu.data import make_data_loader
    from vcm_ts_tpu.models.dmc import DMC, make_dpb
    from vcm_ts_tpu.train.checkpoint import CheckPointer
    from vcm_ts_tpu.train.train_loop import do_train
    from vcm_ts_tpu.utils.logger import setup_logger

    logger = setup_logger("CORE", rank, cfg.OUTPUT_DIR if rank == 0 else "")
    logger.info("world_size=%d rank=%d devices=%d",
                world_size, rank, jax.device_count())
    if cfg.SOLVER.DEBUG_NANS:
        from vcm_ts_tpu.utils.common import enable_debug_nans
        enable_debug_nans()
        logger.info("debug_nans sanitizer ON (steps serialize; debug only)")

    cmv, cn, cm = cfg.MODEL.CHANNELS
    model = DMC(anchor_num=len(cfg.SOLVER.LAMBDAS), channel_mv=cmv,
                channel_N=cn, channel_M=cm)
    x0 = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(args.seed), x0,
                        make_dpb(x0, cn, cm), 1.0, 1.0, method="init_all")

    # Every rank reads checkpoints (initial params must agree on all
    # processes before mesh replication); only rank 0 writes — do_train
    # guards saves with is_main.
    checkpointer = CheckPointer(cfg.OUTPUT_DIR, logger)
    start_epoch = 0
    resume_opt_blob = b""
    if cfg.MODEL.PRETRAINED_WEIGHTS or checkpointer.has_checkpoint():
        params, _, extra = checkpointer.load(
            params, path=cfg.MODEL.PRETRAINED_WEIGHTS or None)
        start_epoch = int(extra.get("epoch", 0))
        # restored by do_train at the resumed stage entry (mid-stage only)
        resume_opt_blob = checkpointer.load_opt_blob(
            path=cfg.MODEL.PRETRAINED_WEIGHTS or None)

    # Per-process loader shard (DistributedSampler equivalent); each process
    # contributes len(LAMBDAS) rows to the global batch.
    train_loader = make_data_loader(cfg, args.seed, is_train=True,
                                    rank=rank, world_size=world_size)
    test_loader = (make_data_loader(cfg, args.seed, is_train=False)
                   if (rank == 0 and cfg.DATASET.TEST_ROOT_DIRS) else None)

    # Global DP mesh over every device of every process: local loader rows
    # become each process's slice of one sharded global batch; gradients
    # all-reduce over ICI/DCN via XLA (the reference's NCCL DDP allreduce,
    # core/engine/train_multi.py:203-268). The seed must be identical on
    # every process — the jitted step's scalar inputs must agree globally.
    if args.fsdp and args.tp > 1:
        raise SystemExit("--fsdp and --tp are mutually exclusive (TP "
                         "already shards the weights, over 'model')")
    mesh = (pm.make_global_dp_tp_mesh(args.tp) if args.tp > 1
            else pm.make_global_mesh())
    if args.tp > 1:
        logger.info("tensor parallelism: mesh %s (weights sharded over "
                    "'model')", dict(mesh.shape))
    if args.fsdp:
        logger.info("FSDP: weights + Adam moments sharded over 'data' "
                    "(%d-way)", dict(mesh.shape)["data"])

    # OD-mAP eval is rank-0-only host work, same gating as trainer.py
    od_loader = detector_fn = None
    if (rank == 0 and cfg.DATASET.TEST_OD_ROOT_DIRS
            and len(cfg.SOLVER.STAGES) + 1 > cfg.DATASET.OD_STAGE):
        # built only when the curriculum reaches OD_STAGE (see trainer.py)
        from vcm_ts_tpu.data import make_object_detection_data_loader
        from vcm_ts_tpu.eval.detector import build_eval_detector
        od_loader = make_object_detection_data_loader(cfg)
        detector_fn = build_eval_detector(cfg)

    do_train(cfg, model, params, train_loader, checkpointer,
             start_epoch=start_epoch, seed=args.seed,
             test_loader=test_loader, world_size=world_size,
             is_main=(rank == 0), mesh=mesh, od_loader=od_loader,
             detector_fn=detector_fn, resume_opt_blob=resume_opt_blob,
             fsdp=args.fsdp)


if __name__ == "__main__":
    main()
