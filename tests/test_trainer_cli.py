"""End-to-end trainer CLI smoke test: tiny synthetic dataset, 2-stage
curriculum, checkpoint auto-resume."""

import os
import subprocess
import sys

import numpy as np
import pytest

cv = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("trainroot")
    data = root / "data"
    rng = np.random.default_rng(0)
    for s in range(2):
        d = data / "g" / f"seq{s}" / "raw"
        os.makedirs(d)
        base = (rng.random((72, 72, 3)) * 255).astype(np.uint8)
        for t in range(3):
            cv.imwrite(str(d / f"{t:05d}.png"), np.roll(base, t, axis=1))
    cfg = root / "cfg.yaml"
    cfg.write_text(f"""
MODEL:
  CHANNELS: [16, 16, 24]
DATASET:
  TYPE: SequenceDataset
  TRAIN_ROOT_DIRS: ['{data}']
  TRAIN_SUBDIR_LISTS: ['']
  SEQUENCE_LENGTH: 2
INPUT:
  IMAGE_SIZE: [64, 64]
SOLVER:
  LAMBDAS: [85, 170]
  STAGES:
    - ['1', 'me', 'single', 'me', 'none', '0.0001', '1', 'false']
    - ['1', 'all', 'cascade', 'rec', 'all', '0.0001', '1', 'false']
OUTPUT_DIR: '{root}/out'
""")
    return root, cfg


def test_trainer_cli_runs_and_resumes(tiny_setup):
    root, cfg = tiny_setup
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "trainer.py"),
         "--config-file", str(cfg)],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-3000:]
    out_dir = os.path.join(root, "out")
    assert os.path.exists(os.path.join(out_dir, "cfg.yaml"))
    assert os.path.exists(os.path.join(out_dir, "last_checkpoint.txt"))
    assert os.path.exists(os.path.join(out_dir, "metrics.jsonl"))
    ckpts = [f for f in os.listdir(out_dir) if f.endswith(".ckpt")]
    assert len(ckpts) == 2  # one per epoch

    # resume: should be a no-op (start_epoch == max_epoch)
    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "trainer.py"),
         "--config-file", str(cfg)],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert r2.returncode == 0, r2.stderr[-3000:]
