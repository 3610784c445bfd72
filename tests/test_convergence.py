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
