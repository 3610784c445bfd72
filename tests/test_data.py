"""Data pipeline tests: dataset scanning, transforms, loader batching."""

import os

import numpy as np
import pytest

from vcm_ts_tpu.data import make_data_loader
from vcm_ts_tpu.data.transforms import (center_crop, pad_to_multiple,
                                        random_crop, reverse_channels,
                                        to_unit_float)
from vcm_ts_tpu.train.config import default_training_cfg

cv = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def video_root(tmp_path_factory):
    """root/<group>/<seq>/raw/NNNNN.png layout, 6 frames of 80x96."""
    root = tmp_path_factory.mktemp("seqdata")
    rng = np.random.default_rng(0)
    for g in range(2):
        for s in range(2):
            d = root / f"group{g}" / f"seq{s}" / "raw"
            os.makedirs(d)
            for t in range(6):
                img = (rng.random((80, 96, 3)) * 255).astype(np.uint8)
                cv.imwrite(str(d / f"{t:05d}.png"), img)
    # one too-short sequence that must be filtered out
    short = root / "group0" / "short" / "raw"
    os.makedirs(short)
    cv.imwrite(str(short / "00000.png"),
               np.zeros((80, 96, 3), np.uint8))
    return str(root)


def _cfg(video_root):
    cfg = default_training_cfg()
    cfg.DATASET.TYPE = "SequenceDataset"
    cfg.DATASET.TRAIN_ROOT_DIRS = [video_root]
    cfg.DATASET.TRAIN_SUBDIR_LISTS = [""]
    cfg.DATASET.TEST_ROOT_DIRS = [video_root]
    cfg.DATASET.TEST_SUBDIR_LISTS = [""]
    cfg.DATASET.SEQUENCE_LENGTH = 4
    cfg.INPUT.IMAGE_SIZE = [64, 64]
    cfg.SOLVER.LAMBDAS = [85, 170]
    return cfg


def test_loader_shapes_and_filtering(video_root):
    cfg = _cfg(video_root)
    loader = make_data_loader(cfg, seed=0, is_train=True)
    assert len(loader) == 2  # 4 sequences (short one filtered), batch 2
    batches = list(loader)
    assert len(batches) == 2
    inputs, targets = batches[0]
    assert inputs.shape == (2, 4, 64, 64, 3)
    assert inputs.dtype == np.float32
    assert 0.0 <= inputs.min() and inputs.max() <= 1.0
    np.testing.assert_array_equal(inputs, targets)


def test_loader_eval_central_crop(video_root):
    cfg = _cfg(video_root)
    loader = make_data_loader(cfg, seed=0, is_train=False)
    inputs, _ = next(iter(loader))
    assert inputs.shape == (2, 4, 64, 64, 3)


def test_rank_sharding_disjoint(video_root):
    cfg = _cfg(video_root)
    cfg.SOLVER.LAMBDAS = [85]
    l0 = make_data_loader(cfg, 0, True, rank=0, world_size=2)
    l1 = make_data_loader(cfg, 0, True, rank=1, world_size=2)
    b0 = [i.tobytes() for i, _ in l0]
    b1 = [i.tobytes() for i, _ in l1]
    assert len(b0) == len(b1) == 2
    assert set(b0).isdisjoint(set(b1))


def test_pad_to_multiple_pads_zero():
    x = np.ones((2, 5, 7, 3), np.float32)
    out = pad_to_multiple(x, 8)
    assert out.shape == (2, 8, 8, 3)
    assert out[:, 5:, :, :].max() == 0.0
    # already-aligned input is returned unchanged
    assert pad_to_multiple(out, 8) is out


def test_color_and_crops():
    x = np.zeros((1, 8, 8, 3), np.float32)
    x[..., 0] = 1.0  # B channel
    out = reverse_channels()({"inputs": x})["inputs"]
    assert out[..., 2].max() == 1.0 and out[..., 0].max() == 0.0

    # ramp image: both streams must get the SAME random window
    ramp = np.arange(2 * 8 * 8 * 3, dtype=np.float32).reshape(2, 8, 8, 3)
    rc = random_crop(4, 4, rng=np.random.default_rng(0))
    out = rc({"inputs": ramp, "targets": ramp.copy()})
    assert out["inputs"].shape == (2, 4, 4, 3)
    np.testing.assert_array_equal(out["inputs"], out["targets"])

    out = center_crop(4, 4)({"inputs": ramp})["inputs"]
    assert out.shape == (2, 4, 4, 3)
    np.testing.assert_array_equal(out, ramp[:, 2:6, 2:6, :])


def test_to_unit_float_scales_named_streams_only():
    x = np.full((1, 4, 4, 3), 255, np.uint8)
    m = np.full((1, 4, 4, 1), 255, np.uint8)
    out = to_unit_float()({"inputs": x, "masks": m})
    assert out["inputs"].dtype == np.float32
    assert out["inputs"].max() == 1.0
    assert out["masks"].max() == 255.0  # masks keep 0-255 range


def test_prefetch_loader_matches_sync_and_handles_epochs(video_root):
    from vcm_ts_tpu.data import PrefetchLoader

    cfg = _cfg(video_root)
    cfg.DATA_LOADER.NUM_WORKERS = 0
    sync = make_data_loader(cfg, seed=0, is_train=True)
    assert not isinstance(sync, PrefetchLoader)
    cfg.DATA_LOADER.NUM_WORKERS = 2
    pre = make_data_loader(cfg, seed=0, is_train=True)
    assert isinstance(pre, PrefetchLoader)
    assert len(pre) == len(sync)

    for epoch in (0, 1):
        sync.set_epoch(epoch)
        pre.set_epoch(epoch)
        for (i_s, t_s), (i_p, t_p) in zip(sync, pre):
            np.testing.assert_array_equal(i_s, i_p)
            np.testing.assert_array_equal(t_s, t_p)


def test_prefetch_loader_early_break_and_errors(video_root):
    from vcm_ts_tpu.data import PrefetchLoader

    cfg = _cfg(video_root)
    cfg.DATA_LOADER.NUM_WORKERS = 1
    loader = make_data_loader(cfg, seed=0, is_train=True)
    for _ in loader:  # breaking mid-epoch must not hang the worker
        break
    assert list(loader)  # and the loader is reusable afterwards

    class Boom:
        def set_epoch(self, e):
            pass

        def __len__(self):
            return 1

        def __iter__(self):
            raise RuntimeError("boom")
            yield  # pragma: no cover

    with pytest.raises(RuntimeError, match="boom"):
        list(PrefetchLoader(Boom()))
