"""Synthetic-clip overfit run: convergence + trained-weights evidence.

Drives the REAL training loop (do_train: stage curriculum, optimizer
freeze masks, metric writer) on an in-memory synthetic moving sequence
until it visibly overfits, then re-validates the bf16-vs-f32 agreement on
the TRAINED weights instead of random init (VERDICT round-2 item 7 /
PERF.md caveat). Reference curriculum semantics: core/engine/train.py
stage tuples; three stages are run so two stage transitions are crossed
(me -> rec -> all-cascade).

Usage (real TPU, full channels):
  python tools/overfit_run.py --iters 60 --size 256 --out artifacts/overfit
CPU smoke (tiny):
  JAX_PLATFORMS=cpu python tools/overfit_run.py --tiny --iters 6

Prints a per-epoch metric table and a final JSON verdict line; exits
non-zero if the run did not converge (loss down, PSNR up).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_synthetic_batch(n_rows, t, size, seed=0):
    """Moving synthetic content: smooth low-frequency pattern translating
    ~2 px/frame with light temporal noise — flow magnitudes the motion
    branch can actually learn."""
    rng = np.random.default_rng(seed)
    base = rng.random((n_rows, size + 16, size + 16, 3)).astype(np.float32)
    # low-pass via box blurs to make content piecewise smooth
    for _ in range(3):
        base = (base + np.roll(base, 1, 1) + np.roll(base, 1, 2)
                + np.roll(base, -1, 1) + np.roll(base, -1, 2)) / 5
    frames = []
    for i in range(t):
        shifted = np.roll(base, 2 * i, axis=2)[:, 8:8 + size, 8:8 + size]
        frames.append(shifted)
    seq = np.stack(frames, axis=1)  # (N, T, H, W, C)
    seq += 0.01 * rng.standard_normal(seq.shape).astype(np.float32)
    return np.clip(seq, 0, 1).astype(np.float32)


class OverfitLoader:
    """Fixed batch replayed `iters` times per epoch (the overfit target)."""

    def __init__(self, batch, iters):
        self.batch = batch
        self.iters = iters

    def __len__(self):
        return self.iters

    def set_epoch(self, epoch):
        pass

    def __iter__(self):
        for _ in range(self.iters):
            yield self.batch, self.batch


def build_cfg(args, channels, lambdas):
    """The overfit run's training config (factored out for wiring tests)."""
    from vcm_ts_tpu.train.config import default_training_cfg

    lr = str(args.lr)
    e = str(args.epochs)
    cfg = default_training_cfg()
    cfg.MODEL.CHANNELS = channels
    cfg.SOLVER.LAMBDAS = lambdas
    # from-scratch training (the reference never does this — it fine-tunes
    # pretrained DCVC weights) needs gradient clipping: random-init rate
    # estimates are astronomically large and their gradients blow up the
    # recurrent DPB chain
    cfg.SOLVER.GRAD_CLIP_NORM = 1.0
    # --mp: the bf16-compute/f32-master regime (SOLVER.MIXED_PRECISION);
    # run alongside the f32 control to prove the regime CONVERGES, not
    # just that one step computes (PERF.md round 4, mixed-precision)
    # getattr: callers (tests) may pass a bare args object without the
    # newer flags
    cfg.SOLVER.MIXED_PRECISION = bool(getattr(args, "mp", False))
    # cascade-stage memory: remat + G=2 anchor-microbatch accumulation is
    # what fits the 4-anchor 256x256 f32 cascade on one v5e chip
    cfg.SOLVER.GRAD_ACCUM_STEPS = int(getattr(args, "grad_accum", 2))
    # the reference curriculum shape (training_settings.py:55-66): dist-only
    # before each rate stage, single-frame before cascade
    cascade_lr = str(args.lr / 2)  # reference drops lr for cascade stages
    cfg.SOLVER.STAGES = [
        ["1", "me", "single", "me", "none", lr, e, "false"],
        ["1", "me", "single", "me", "me", lr, e, "false"],
        ["1", "rec", "single", "rec", "none", lr, e, "false"],
        ["1", "rec", "single", "rec", "rec", lr, e, "false"],
        ["1", "all", "single", "rec", "all", lr, e, "false"],
        ["2", "all", "cascade", "rec", "all", cascade_lr, e, "false"],
    ]
    seq_len = 3
    if getattr(args, "p4", False):
        # the reference curriculum's real final depth: p_frames=4 cascade
        # (configs/cfg.yaml.template stages 9-10 ≙ reference
        # training_settings.py:55-66). Needs a 5-frame sequence.
        cfg.SOLVER.STAGES.append(
            ["4", "all", "cascade", "rec", "all", cascade_lr, e, "false"])
        seq_len = 5
    cfg.DATASET.SEQUENCE_LENGTH = seq_len
    cfg.OUTPUT_DIR = args.out
    cfg.TENSORBOARD.BEST_SAMPLES_NUM = 0
    cfg.TENSORBOARD.WORST_SAMPLES_NUM = 0
    cfg.freeze()
    return cfg


def run(args):
    import jax
    import jax.numpy as jnp

    from vcm_ts_tpu.models.dmc import DMC, make_dpb
    from vcm_ts_tpu.train.train_loop import do_train

    if args.tiny:
        channels, size, lambdas = [16, 16, 24], 64, [85.0, 170.0]
    else:
        channels, size, lambdas = [64, 64, 96], args.size, \
            [85.0, 170.0, 380.0, 840.0]

    cfg = build_cfg(args, channels, lambdas)
    seq_len = cfg.DATASET.SEQUENCE_LENGTH
    os.makedirs(args.out, exist_ok=True)

    model = DMC(anchor_num=len(lambdas), channel_mv=channels[0],
                channel_N=channels[1], channel_M=channels[2])
    x0 = jnp.zeros((1, size, size, 3))
    params = model.init(jax.random.PRNGKey(args.seed), x0,
                        make_dpb(x0, channels[1], channels[2]), 1.0, 1.0,
                        method="init_all")

    batch = make_synthetic_batch(len(lambdas), seq_len, size,
                                 seed=args.seed)
    loader = OverfitLoader(batch, args.iters)
    test_loader = OverfitLoader(batch, 1)

    # Per-epoch checkpointing + auto-resume: the axon tunnel flaps for
    # hours at a time, and with epochs==1 per stage every epoch boundary
    # is a stage boundary, so a killed run resumes exactly at the stage
    # it died in instead of retraining from scratch. With --epochs > 1 a
    # resume can land mid-stage; the saved opt blob lets do_train restore
    # the Adam moments there instead of restarting them from zero.
    from vcm_ts_tpu.train.checkpoint import CheckPointer
    ckpt = CheckPointer(args.out)
    start_epoch = 0
    resume_opt_blob = b""
    if ckpt.has_checkpoint():
        params, _, extra = ckpt.load(params)
        start_epoch = int(extra.get("epoch", 0))
        resume_opt_blob = ckpt.load_opt_blob()
        print(f"resuming from epoch {start_epoch} "
              f"({ckpt.get_checkpoint_file()})")
    elif getattr(args, "init_from", None):
        # warm start: e.g. running --p4 over a completed 6-stage run's
        # final checkpoint (its epoch stamp = the 6-stage max_epoch) drops
        # straight into the appended p4 cascade stage instead of
        # retraining the shared prefix.
        params, _, extra = ckpt.load(params, path=args.init_from,
                                     use_latest=False)
        start_epoch = int(extra.get("epoch", 0))
        print(f"warm start from {args.init_from} (epoch {start_epoch})")

    params = do_train(cfg, model, params, loader, checkpointer=ckpt,
                      start_epoch=start_epoch, test_loader=test_loader,
                      resume_opt_blob=resume_opt_blob)

    # ---- read back the metric trail --------------------------------------
    records = []
    with open(os.path.join(args.out, "metrics.jsonl")) as f:
        for line in f:
            records.append(json.loads(line))
    stage_by_step = {r["step"]: int(r["value"]) for r in records
                     if r["tag"] == "train/stage"}
    # a killed-and-resumed run re-appends the dying stage's steps: keep only
    # the LAST record per (tag, step) so stale pre-death values don't mix in
    loss_by_step = {}
    psnr_by_step = {}
    for r in records:
        if r["tag"].startswith("train/loss/") and r["step"] in stage_by_step:
            loss_by_step[(r["tag"], r["step"])] = r["value"]
        elif r["tag"].startswith("eval/psnr/"):
            psnr_by_step[(r["tag"], r["step"])] = r["value"]
    per_stage = {}
    for (_, step), value in loss_by_step.items():
        s = stage_by_step[step]
        per_stage.setdefault(s, {"steps": []})["steps"].append((step, value))
    eval_psnr = sorted((step, v) for (_, step), v in psnr_by_step.items())

    print("\nstage | first-loss | last-loss | improved")
    stage_results = {}
    for s, d in sorted(per_stage.items()):
        steps = sorted(d["steps"])
        if len(steps) < 2:
            continue
        k = max(1, len(steps) // 8)
        first = float(np.mean([v for _, v in steps[:k]]))
        last = float(np.mean([v for _, v in steps[-k:]]))
        improved = last < first
        stage_results[s] = {"first": first, "last": last,
                            "improved": improved}
        print(f"{s:5d} | {first:10.4f} | {last:9.4f} | {improved}")

    # convergence bar (VERDICT r2 item 7): loss down through at least two
    # stage transitions, eval PSNR up materially over the run. me-only
    # stages can plateau quickly from scratch; requiring every stage to
    # improve over-constrains a short overfit.
    n_improved = sum(1 for d in stage_results.values() if d["improved"])
    ok = n_improved >= 2

    psnr_first = psnr_last = None
    if eval_psnr:
        psnr_first, psnr_last = eval_psnr[0][1], eval_psnr[-1][1]
        best = max(v for _, v in eval_psnr)
        print(f"eval psnr: {psnr_first:.2f} -> {psnr_last:.2f} dB "
              f"(best {best:.2f})")
        ok = ok and (psnr_last > psnr_first + 10.0)

    # ---- persist trained weights for downstream checks -------------------
    # epoch kwarg keeps last_checkpoint.txt resume-consistent: a rerun over
    # a completed output dir resumes past the end (no-op) instead of
    # restarting stage 0 with trained weights.
    from vcm_ts_tpu.train.stages import calc_max_epoch
    ckpt.save("overfit_final", params, None,
              epoch=calc_max_epoch(cfg.SOLVER.STAGES))

    verdict = {
        "converged": bool(ok),
        "stages": stage_results,
        "eval_psnr_first": psnr_first,
        "eval_psnr_last": psnr_last,
    }

    # ---- bf16 agreement on TRAINED weights -------------------------------
    if args.bf16_check:
        bp = jax.tree_util.tree_map(
            lambda v: v.astype(jnp.bfloat16)
            if v.dtype == jnp.float32 else v, params)
        fwd = jax.jit(lambda p, x, dpb: model.apply(
            p, x, dpb, 1.0, 1.0, True), static_argnums=())
        x_f = jnp.asarray(batch[:, 1])
        dpb_f = make_dpb(jnp.asarray(batch[:, 0]), channels[1], channels[2])
        out_f = fwd(params, x_f, dpb_f)
        dpb_b = {k: v.astype(jnp.bfloat16) for k, v in dpb_f.items()}
        out_b = fwd(bp, x_f.astype(jnp.bfloat16), dpb_b)
        rf = np.asarray(out_f["dpb"]["ref_frame"], np.float32)
        rb = np.asarray(out_b["dpb"]["ref_frame"], np.float32)
        agree_psnr = float(-10 * np.log10(np.mean((rf - rb) ** 2) + 1e-12))
        bpp_f = float(np.mean(np.asarray(out_f["bpp"], np.float32)))
        bpp_b = float(np.mean(np.asarray(out_b["bpp"], np.float32)))
        verdict["bf16_recon_agreement_db"] = round(agree_psnr, 2)
        verdict["bpp_f32"] = round(bpp_f, 5)
        verdict["bpp_bf16_rel_delta"] = round((bpp_b - bpp_f)
                                              / max(bpp_f, 1e-9), 5)
        print(f"bf16-vs-f32 on trained weights: recon agreement "
              f"{agree_psnr:.1f} dB, bpp delta "
              f"{100 * verdict['bpp_bf16_rel_delta']:.2f}%")

    print(json.dumps(verdict))
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=60,
                    help="iterations per epoch")
    ap.add_argument("--epochs", type=int, default=1,
                    help="epochs per stage")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny channels + 64x64 (CPU smoke)")
    ap.add_argument("--out", default="artifacts/overfit")
    ap.add_argument("--bf16-check", action="store_true",
                    help="re-validate bf16 agreement on the trained weights")
    ap.add_argument("--mp", action="store_true",
                    help="train under SOLVER.MIXED_PRECISION (bf16 compute, "
                         "f32 master params/moments)")
    ap.add_argument("--init-from", default=None,
                    help="warm-start checkpoint when the output dir has no "
                         "resume tag (e.g. a completed 6-stage run's "
                         "overfit_final.ckpt before a --p4 extension)")
    ap.add_argument("--p4", action="store_true",
                    help="append the reference curriculum's final depth: "
                         "a p_frames=4 cascade stage (5-frame sequences)")
    ap.add_argument("--grad-accum", type=int, default=2,
                    help="SOLVER.GRAD_ACCUM_STEPS for the cascade stage "
                         "(2 = fits one v5e chip at 256x256 f32)")
    args = ap.parse_args()
    raise SystemExit(run(args))


if __name__ == "__main__":
    main()
