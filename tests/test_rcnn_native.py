"""Native Faster-RCNN tests: anchor generation vs the known torchvision
base anchors, box decode math, RoIAlign vs an independent scalar
reference, FPN level mapping, checkpoint-layout introspection + the
plain-torch load path, and end-to-end detect() plumbing.

Reference counterpart: torchvision fasterrcnn_resnet50_fpn_v2 used at
core/engine/validation.py:132-139 and benchmark_plot.py."""

import numpy as np
import pytest
import torch

from vcm_ts_tpu.eval import rcnn_native as rn

cv = pytest.importorskip("cv2")


def test_cell_anchors_match_torchvision_values():
    """The size-32 base anchors torchvision generates (rounded)."""
    a = rn.cell_anchors(32)
    np.testing.assert_array_equal(
        a, [[-23., -11., 23., 11.],
            [-16., -16., 16., 16.],
            [-11., -23., 11., 23.]])


def test_level_anchors_grid():
    a = rn.level_anchors(2, 2, stride=4, size=32)
    assert a.shape == (2 * 2 * 3, 4)
    # anchor 0 of cell (0,1): base shifted by (4, 0)
    np.testing.assert_array_equal(a[3], [-23. + 4, -11., 23. + 4, 11.])
    # cells flatten row-major (HWA): cell (1,0) starts at index 6
    np.testing.assert_array_equal(a[6], [-23., -11. + 4, 23., 11. + 4])


def test_decode_boxes_identity_and_known_case():
    anchors = np.array([[10., 20., 30., 60.]], np.float32)  # w=20 h=40
    np.testing.assert_allclose(
        rn.decode_boxes(np.zeros((1, 4), np.float32), anchors), anchors,
        atol=1e-5)
    # dx=0.5 -> ctr_x += 10; dw=ln2 -> w doubles
    d = np.array([[0.5, 0.0, np.log(2.0), 0.0]], np.float32)
    out = rn.decode_boxes(d, anchors)
    np.testing.assert_allclose(out, [[10., 20., 50., 60.]], atol=1e-4)
    # weights divide the deltas: dx*10/10 = 0.5 (ctr +10 -> 30),
    # dw*10/5 = 2 ln 2 (w -> 80) => x1 = 30 - 40 = -10
    out_w = rn.decode_boxes(d * 10.0, anchors,
                            weights=(10.0, 10.0, 5.0, 5.0))
    np.testing.assert_allclose(out_w, [[-10., 20., 70., 60.]], atol=1e-3)


def _roi_align_scalar(feat, rois, scale, out=7, ratio=2):
    """Independent scalar reference of aligned=False RoIAlign."""
    H, W, C = feat.shape
    res = np.zeros((len(rois), out, out, C), np.float32)

    def bilinear(y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return np.zeros(C, np.float32)
        y = min(max(y, 0.0), H - 1.0)
        x = min(max(x, 0.0), W - 1.0)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
        fy, fx = y - y0, x - x0
        return ((1 - fy) * (1 - fx) * feat[y0, x0]
                + (1 - fy) * fx * feat[y0, x1]
                + fy * (1 - fx) * feat[y1, x0]
                + fy * fx * feat[y1, x1])

    for n, roi in enumerate(rois):
        x1, y1, x2, y2 = roi * scale
        bw, bh = (x2 - x1) / out, (y2 - y1) / out
        for i in range(out):
            for j in range(out):
                acc = np.zeros(C, np.float32)
                for sy in range(ratio):
                    for sx in range(ratio):
                        y = y1 + (i + (sy + 0.5) / ratio) * bh
                        x = x1 + (j + (sx + 0.5) / ratio) * bw
                        acc += bilinear(y, x)
                res[n, i, j] = acc / (ratio * ratio)
    return res


def test_roi_align_matches_scalar_reference():
    rng = np.random.default_rng(30)
    feat = rng.normal(size=(12, 16, 5)).astype(np.float32)
    rois = np.array([[4., 8., 40., 36.],       # interior
                     [-8., -8., 20., 20.],     # crosses the border
                     [0., 0., 63., 47.]],      # full image
                    np.float32)
    got = np.asarray(rn.roi_align(feat, rois, spatial_scale=0.25))
    ref = _roi_align_scalar(feat, rois, 0.25)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_map_levels():
    def roi(side):
        return np.array([[0.0, 0.0, side, side]], np.float32)

    assert rn.map_levels(roi(32))[0] == 0       # small -> P2
    assert rn.map_levels(roi(224))[0] == 2      # canonical -> k0=4 -> P4
    assert rn.map_levels(roi(2000))[0] == 3     # huge -> clamped P5


def test_batched_nms_respects_categories():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    # same category: second suppressed; different: both kept
    assert rn.batched_nms(boxes, scores, np.array([0, 0]), 0.45).tolist() \
        == [0]
    assert sorted(rn.batched_nms(boxes, scores, np.array([0, 1]),
                                 0.45).tolist()) == [0, 1]


def _fake_v2_sd(num_classes=5, rpn_depth=2, box_convs=4, box_fc=1024):
    """A v2-layout state dict (heads only; backbone absent is fine with
    strict=False) with deterministic values."""
    g = torch.Generator().manual_seed(31)

    def t(*shape):
        return torch.randn(*shape, generator=g)

    sd = {}
    for i in range(rpn_depth):
        sd[f"rpn.head.conv.{i}.0.weight"] = t(256, 256, 3, 3)
        sd[f"rpn.head.conv.{i}.0.bias"] = t(256)
    sd["rpn.head.cls_logits.weight"] = t(3, 256, 1, 1)
    sd["rpn.head.cls_logits.bias"] = t(3)
    # tiny box-regression weights: random full-scale deltas throw every
    # decoded box off-image (conv chains amplify to ~1e4 logits) and the
    # min-size filters would legitimately drop everything
    sd["rpn.head.bbox_pred.weight"] = t(12, 256, 1, 1) * 1e-5
    sd["rpn.head.bbox_pred.bias"] = t(12) * 1e-3
    for i in range(box_convs):
        sd[f"roi_heads.box_head.{i}.0.weight"] = t(256, 256, 3, 3)
        sd[f"roi_heads.box_head.{i}.1.weight"] = t(256)
        sd[f"roi_heads.box_head.{i}.1.bias"] = t(256)
        sd[f"roi_heads.box_head.{i}.1.running_mean"] = t(256)
        sd[f"roi_heads.box_head.{i}.1.running_var"] = t(256).abs() + 0.5
        sd[f"roi_heads.box_head.{i}.1.num_batches_tracked"] = \
            torch.tensor(0)
    sd[f"roi_heads.box_head.{box_convs + 1}.weight"] = t(box_fc, 256 * 49)
    sd[f"roi_heads.box_head.{box_convs + 1}.bias"] = t(box_fc)
    sd["roi_heads.box_predictor.cls_score.weight"] = t(num_classes, box_fc)
    sd["roi_heads.box_predictor.cls_score.bias"] = t(num_classes)
    # the 4-conv box head amplifies activations to ~1e6 under random
    # weights; 1e-9 keeps the per-class deltas O(1e-3)
    sd["roi_heads.box_predictor.bbox_pred.weight"] = t(num_classes * 4,
                                                       box_fc) * 1e-9
    sd["roi_heads.box_predictor.bbox_pred.bias"] = t(num_classes * 4) * 1e-3
    return sd


def test_introspect_and_load_pth(tmp_path):
    sd = _fake_v2_sd()
    meta = rn.FasterRCNNNativeDetector.introspect(
        {k: v.numpy() for k, v in sd.items()})
    assert meta["num_classes"] == 5 and meta["rpn_depth"] == 2
    assert meta["rpn_norm"] is False and meta["box_convs"] == 4
    assert meta["box_fc"] == 1024

    path = str(tmp_path / "fake_rcnn.pth")
    torch.save(sd, path)
    det = rn.FasterRCNNNativeDetector.load_pth(path, min_size=64,
                                               max_size=96)
    # weights actually landed: spot-check two mapped leaves
    np.testing.assert_allclose(
        np.asarray(det.params["rpn"]["params"]["cls"]["bias"]),
        sd["rpn.head.cls_logits.bias"].numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(det.params["box"]["params"]["bn2"]["running_mean"]),
        sd["roi_heads.box_head.2.1.running_mean"].numpy(), rtol=1e-6)

    # v1 layout is rejected with a clear error
    with pytest.raises(RuntimeError, match="v1 TwoMLPHead"):
        rn.FasterRCNNNativeDetector.introspect(
            {"roi_heads.box_head.fc6.weight": np.zeros((1024, 12544))})


def test_detect_end_to_end_plumbing(tmp_path):
    sd = _fake_v2_sd()
    path = str(tmp_path / "fake_rcnn.pth")
    torch.save(sd, path)
    det = rn.FasterRCNNNativeDetector.load_pth(
        path, min_size=64, max_size=96, score_thresh=0.0, detections=20)
    frame = (np.random.default_rng(32).random((50, 70, 3)) * 255
             ).astype(np.uint8)
    out = det.detect(frame)
    assert set(out) == {"boxes", "labels", "scores"}
    boxes, labels, scores = out["boxes"], out["labels"], out["scores"]
    assert boxes.shape[0] > 0 and boxes.shape[0] <= 20
    assert (boxes[:, [0, 2]] >= 0).all() and (boxes[:, [0, 2]] <= 70).all()
    assert (boxes[:, [1, 3]] >= 0).all() and (boxes[:, [1, 3]] <= 50).all()
    assert (boxes[:, 0] <= boxes[:, 2] + 1e-3).all()
    assert labels.min() >= 1 and labels.max() < 5  # background skipped
    assert scores.shape == labels.shape == (boxes.shape[0],)
    # scores sorted descending (NMS keeps order)
    assert (np.diff(scores) <= 1e-6).all()
