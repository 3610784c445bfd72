"""Trainer-driven OD-mAP eval: `do_train` must reach the detection-mAP
branch once the curriculum passes cfg.DATASET.OD_STAGE (VERDICT round-2
missing item 1; reference wiring train.py:308-337 -> validation.py:132-199).

Uses a stub detector adapter (the torchvision/ultralytics zoos are not in
this image) that replays ground truth, so mean_ap is deterministically 1.0
and its presence + per-lambda logging can be asserted end-to-end through
the real training loop."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from vcm_ts_tpu.models.dmc import DMC, make_dpb
from vcm_ts_tpu.train.config import default_training_cfg
from vcm_ts_tpu.train.train_loop import do_train


class _SeqLoader:
    """Tiny in-memory (inputs, targets) loader: one batch, T=2 frames,
    batch rows = len(LAMBDAS)."""

    def __init__(self, n_lambdas):
        rng = np.random.default_rng(0)
        self.batch = rng.random((n_lambdas, 2, 64, 64, 3)).astype(np.float32)

    def __len__(self):
        return 1

    def set_epoch(self, epoch):
        pass

    def __iter__(self):
        yield self.batch, self.batch


def test_do_train_runs_od_map_eval(tmp_path):
    cfg = default_training_cfg()
    cfg.MODEL.CHANNELS = [16, 16, 24]
    cfg.SOLVER.LAMBDAS = [85.0, 170.0]
    cfg.SOLVER.STAGES = [
        ["1", "all", "single", "rec", "all", "0.0001", "1", "false"]]
    cfg.DATASET.OD_STAGE = 1   # active from the first stage
    cfg.DATASET.OD_GOP_SIZE = 2
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.TENSORBOARD.BEST_SAMPLES_NUM = 0
    cfg.TENSORBOARD.WORST_SAMPLES_NUM = 0
    cfg.freeze()

    model = DMC(anchor_num=2, channel_mv=16, channel_N=16, channel_M=24)
    x0 = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x0, make_dpb(x0, 16, 24),
                        1.0, 1.0, method="init_all")

    rng = np.random.default_rng(1)
    frames = [rng.random((1, 64, 64, 3)).astype(np.float32)
              for _ in range(3)]
    ann = {"boxes": np.array([[2.0, 2.0, 30.0, 30.0]], np.float32),
           "labels": np.array([1], np.int64)}
    od_loader = [([f], [ann]) for f in frames]

    calls = []

    def stub_detector(decoded):
        assert decoded.shape == (1, 64, 64, 3)
        calls.append(decoded.shape)
        return {"boxes": ann["boxes"], "labels": ann["labels"],
                "scores": np.array([0.95], np.float32)}

    do_train(cfg, model, params, _SeqLoader(2), checkpointer=None,
             test_loader=_SeqLoader(2), od_loader=od_loader,
             detector_fn=stub_detector)

    # detector ran for every (frame, rate) pair
    assert len(calls) == len(frames) * 2

    # mean_ap landed in the eval metrics, logged per lambda
    metrics_path = os.path.join(str(tmp_path), "metrics.jsonl")
    assert os.path.exists(metrics_path)
    keys = set()
    values = {}
    with open(metrics_path) as f:
        for line in f:
            rec = json.loads(line)
            keys.add(rec["tag"])
            values[rec["tag"]] = rec["value"]
    assert "eval/mean_ap/lambda_85.0" in keys
    assert "eval/mean_ap/lambda_170.0" in keys
    # stub replays ground truth -> perfect AP
    assert values["eval/mean_ap/lambda_85.0"] == 1.0


def test_do_train_detection_only_eval(tmp_path):
    """TEST_OD_ROOT_DIRS without TEST_ROOT_DIRS: do_train has no RD test
    loader (test_loader=None) but must still reach the mAP branch —
    round-3 review finding (the gate used to be `if test_loader is not
    None`, silently dropping detection-only configs)."""
    cfg = default_training_cfg()
    cfg.MODEL.CHANNELS = [16, 16, 24]
    cfg.SOLVER.LAMBDAS = [85.0, 170.0]
    cfg.SOLVER.STAGES = [
        ["1", "all", "single", "rec", "all", "0.0001", "1", "false"]]
    cfg.DATASET.OD_STAGE = 1
    cfg.DATASET.OD_GOP_SIZE = 2
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.TENSORBOARD.BEST_SAMPLES_NUM = 0
    cfg.TENSORBOARD.WORST_SAMPLES_NUM = 0
    cfg.freeze()

    model = DMC(anchor_num=2, channel_mv=16, channel_N=16, channel_M=24)
    x0 = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x0, make_dpb(x0, 16, 24),
                        1.0, 1.0, method="init_all")

    ann = {"boxes": np.array([[2.0, 2.0, 30.0, 30.0]], np.float32),
           "labels": np.array([1], np.int64)}
    rng = np.random.default_rng(1)
    od_loader = [([rng.random((1, 64, 64, 3)).astype(np.float32)], [ann])
                 for _ in range(2)]

    calls = []

    def stub_detector(decoded):
        calls.append(decoded.shape)
        return {"boxes": ann["boxes"], "labels": ann["labels"],
                "scores": np.array([0.95], np.float32)}

    do_train(cfg, model, params, _SeqLoader(2), checkpointer=None,
             test_loader=None, od_loader=od_loader,
             detector_fn=stub_detector)

    assert len(calls) == 2 * 2  # (frames x rates)
    metrics_path = os.path.join(str(tmp_path), "metrics.jsonl")
    tags = set()
    with open(metrics_path) as f:
        for line in f:
            tags.add(json.loads(line)["tag"])
    assert "eval/mean_ap/lambda_85.0" in tags
    # no RD loader -> no RD eval scalars, and no crash on their absence
    assert "eval/loss/lambda_85.0" not in tags


def test_do_train_skips_od_before_stage(tmp_path):
    """Below OD_STAGE the detector must not run (reference gates on
    `stage >= cfg.DATASET.OD_STAGE`)."""
    cfg = default_training_cfg()
    cfg.MODEL.CHANNELS = [16, 16, 24]
    cfg.SOLVER.LAMBDAS = [85.0, 170.0]
    cfg.SOLVER.STAGES = [
        ["1", "all", "single", "rec", "all", "0.0001", "1", "false"]]
    cfg.DATASET.OD_STAGE = 99
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.TENSORBOARD.BEST_SAMPLES_NUM = 0
    cfg.TENSORBOARD.WORST_SAMPLES_NUM = 0
    cfg.freeze()

    model = DMC(anchor_num=2, channel_mv=16, channel_N=16, channel_M=24)
    x0 = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x0, make_dpb(x0, 16, 24),
                        1.0, 1.0, method="init_all")

    calls = []

    def stub_detector(decoded):
        calls.append(1)
        return {"boxes": np.zeros((0, 4)), "labels": np.zeros((0,)),
                "scores": np.zeros((0,))}

    rng = np.random.default_rng(1)
    od_loader = [([rng.random((1, 64, 64, 3)).astype(np.float32)],
                  [{"boxes": np.zeros((0, 4), np.float32),
                    "labels": np.zeros((0,), np.int64)}])]

    do_train(cfg, model, params, _SeqLoader(2), checkpointer=None,
             test_loader=_SeqLoader(2), od_loader=od_loader,
             detector_fn=stub_detector)
    assert calls == []
