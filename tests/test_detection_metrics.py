"""mAP implementation tests with hand-computable cases."""

import numpy as np

from vcm_ts_tpu.eval.detection_metrics import MeanAveragePrecision, box_iou


def test_box_iou():
    a = np.array([[0, 0, 10, 10]], float)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], float)
    iou = box_iou(a, b)[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], atol=1e-6)


def test_perfect_detection_map_is_one():
    m = MeanAveragePrecision()
    gt = {"boxes": np.array([[0, 0, 10, 10], [20, 20, 40, 40]], float),
          "labels": np.array([1, 2])}
    preds = {"boxes": gt["boxes"].copy(), "labels": gt["labels"].copy(),
             "scores": np.array([0.9, 0.8])}
    m.update(preds, gt)
    out = m.compute()
    assert abs(out["map"] - 1.0) < 1e-6
    assert abs(out["map_50"] - 1.0) < 1e-6


def test_missed_and_false_positive():
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    gt = {"boxes": np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float),
          "labels": np.array([1, 1])}
    # one perfect hit (high score), one false positive (low score)
    preds = {"boxes": np.array([[0, 0, 10, 10], [50, 50, 60, 60]], float),
             "labels": np.array([1, 1]), "scores": np.array([0.9, 0.3])}
    m.update(preds, gt)
    out = m.compute()
    # precision@recall<=0.5 is 1.0, recall never reaches beyond 0.5
    # 101-pt AP: 51 of 101 points at precision 1 -> ~0.505
    assert abs(out["map_50"] - 51 / 101) < 1e-6


def test_localization_threshold_sensitivity():
    m = MeanAveragePrecision(iou_thresholds=[0.5, 0.95])
    gt = {"boxes": np.array([[0, 0, 10, 10]], float), "labels": np.array([1])}
    preds = {"boxes": np.array([[1, 1, 11, 11]], float),
             "labels": np.array([1]), "scores": np.array([0.9])}
    m.update(preds, gt)
    out = m.compute()
    # IoU ~ 0.68: hit at 0.5, miss at 0.95
    assert abs(out["map_50"] - 1.0) < 1e-2
    assert out["map"] < 0.6
