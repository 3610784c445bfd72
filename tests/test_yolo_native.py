"""Native YOLOv8 detector tests: Detect-head torch-twin parity, DFL box
decode math, NMS, the torch-free .npz load path (exporter format built
from an inline torch twin), and end-to-end detect() plumbing.

Reference counterpart: ultralytics YOLO inference used at
video_coder.py:261-306 and core/engine/validation.py:132-141."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from torch import nn as tnn

from test_yolo_twin import (TC2f, TConv, TYoloBackbone, _randomize_bn,
                            _to_sd)
from vcm_ts_tpu.eval import yolo_native as yn
from vcm_ts_tpu.utils.weight_import import import_state_dict

cv = pytest.importorskip("cv2")


class TDetect(tnn.Module):
    """Inline torch twin of the public v8 Detect head branches."""

    def __init__(self, ch, nc=80, reg_max=16):
        super().__init__()
        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = tnn.ModuleList(
            tnn.Sequential(TConv(c, c2, 3), TConv(c2, c2, 3),
                           tnn.Conv2d(c2, 4 * reg_max, 1)) for c in ch)
        self.cv3 = tnn.ModuleList(
            tnn.Sequential(TConv(c, c3, 3), TConv(c3, c3, 3),
                           tnn.Conv2d(c3, nc, 1)) for c in ch)

    def forward(self, feats):
        return [(self.cv2[i](f), self.cv3[i](f))
                for i, f in enumerate(feats)]


def test_detect_head_matches_torch_twin():
    torch.manual_seed(10)
    ch = (24, 48, 96)
    tm = TDetect(ch, nc=7, reg_max=16)
    _randomize_bn(tm)
    tm.eval()
    head = yn._make_head(nc=7, reg_max=16)
    rng = np.random.default_rng(10)
    feats = [rng.normal(size=(1, 8 // (2 ** i), 8 // (2 ** i), c))
             .astype(np.float32) for i, c in enumerate(ch)]
    params = head.init(jax.random.PRNGKey(0),
                       [jnp.asarray(f) for f in feats])
    params = import_state_dict(params, _to_sd(tm))
    ours = head.apply(params, [jnp.asarray(f) for f in feats])
    with torch.no_grad():
        ref = tm([torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats])
    for (ob, oc), (rb, rc) in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(ob),
                                   rb.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(oc),
                                   rc.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-3, atol=1e-4)


def test_decode_detections_dfl_math():
    """One 1x1 cell per scale, DFL logits one-hot at bin k -> the decoded
    box is (anchor -+ k) * stride around the cell center (0.5, 0.5)."""
    reg_max = 16
    outs = []
    for k, s in zip((2, 3, 5), yn.STRIDES):
        box = np.full((1, 1, 1, 4, reg_max), -100.0, np.float32)
        box[..., k] = 100.0  # softmax -> one-hot at bin k
        cls = np.zeros((1, 1, 1, 3), np.float32)
        outs.append((jnp.asarray(box.reshape(1, 1, 1, 4 * reg_max)),
                     jnp.asarray(cls)))
    boxes, scores = yn.decode_detections(outs, reg_max)
    assert boxes.shape == (1, 3, 4) and scores.shape == (1, 3, 3)
    for i, (k, s) in enumerate(zip((2, 3, 5), yn.STRIDES)):
        np.testing.assert_allclose(
            np.asarray(boxes[0, i]),
            [(0.5 - k) * s, (0.5 - k) * s, (0.5 + k) * s, (0.5 + k) * s],
            rtol=1e-5)
    np.testing.assert_allclose(np.asarray(scores), 0.5)  # sigmoid(0)


def test_nms_greedy_iou():
    boxes = np.array([[0, 0, 10, 10],     # best
                      [1, 1, 11, 11],     # IoU ~0.68 with best -> dropped
                      [20, 20, 30, 30],   # disjoint -> kept
                      [0, 0, 10, 10]],    # duplicate of best -> dropped
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7, 0.6], np.float32)
    keep = yn.nms(boxes, scores, iou_thres=0.45)
    np.testing.assert_array_equal(keep, [0, 2])


def test_letterbox_box_roundtrip():
    img = np.zeros((40, 80, 3), np.uint8)
    canvas, r, (dw, dh) = yn.letterbox(img, imgsz=64)
    assert canvas.shape == (64, 64, 3)
    assert r == 64 / 80
    # a box at the original frame corners maps inside the canvas and back
    x1, y1 = 0 * r + dw, 0 * r + dh
    x2, y2 = 80 * r + dw, 40 * r + dh
    assert (round(x2 - x1), round(y2 - y1)) == (64, 32)
    back = ((np.array([x1, y1, x2, y2]) - [dw, dh, dw, dh])
            / r).round(5)
    np.testing.assert_allclose(back, [0, 0, 80, 40], atol=1e-5)


def _twin_npz(tmp_path, nc=3, width=0.125, depth=0.34):
    """Build a full torch twin (backbone + head) and save it in the
    tools/export_yolo_detector.py .npz format."""
    torch.manual_seed(11)
    bb = TYoloBackbone(width=width, depth=depth)
    _randomize_bn(bb)
    bb.eval()
    ch = [int(round(c * width)) for c in (256, 512, 1024)]
    head = TDetect(tuple(ch), nc=nc, reg_max=16)
    _randomize_bn(head)
    head.eval()

    sd = {}
    for k, v in _to_sd(bb, strip="layers.").items():
        sd[f"model.{k}"] = v
    for k, v in _to_sd(head).items():
        sd[f"model.22.{k}"] = v
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from export_yolo_detector import infer_meta
    meta = infer_meta(sd)
    assert meta["nc"] == nc and meta["reg_max"] == 16
    assert meta["width"] == width
    path = str(tmp_path / "twin.npz")
    np.savez(path, __meta__=json.dumps(meta), **sd)
    return path, bb, head


def test_npz_load_matches_torch_twin(tmp_path):
    """The torch-free load path reproduces the torch model's raw maps —
    the same guarantee the exporter gives for real ultralytics weights."""
    path, bb, head = _twin_npz(tmp_path)
    det = yn.YOLOv8NativeDetector.load(path, imgsz=64)

    x = np.random.default_rng(11).random((1, 64, 64, 3)).astype(np.float32)
    boxes, scores = det.raw(jnp.asarray(x))

    with torch.no_grad():
        taps = bb(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        ref_outs = head([taps["3_deep"], taps["4_deep"], taps["5_deep"]])
    ref_boxes, ref_scores = yn.decode_detections(
        [(jnp.asarray(b.numpy().transpose(0, 2, 3, 1)),
          jnp.asarray(c.numpy().transpose(0, 2, 3, 1)))
         for b, c in ref_outs], 16)
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(ref_boxes),
                               rtol=1e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_scores),
                               rtol=1e-3, atol=1e-4)


def test_detect_end_to_end_plumbing(tmp_path):
    """detect() on a real frame size: letterbox -> forward -> NMS -> boxes
    mapped back inside the original frame; adapter contracts hold."""
    path, _, _ = _twin_npz(tmp_path)
    det = yn.YOLOv8NativeDetector.load(path, imgsz=64)
    frame = (np.random.default_rng(12).random((50, 90, 3)) * 255
             ).astype(np.uint8)
    boxes, scores, labels = det.detect(frame, conf=0.0, iou=0.9,
                                       max_det=10)
    assert boxes.shape[0] <= 10 and boxes.shape[0] > 0
    assert (boxes[:, 0] <= boxes[:, 2] + 1e-3).all()
    assert (boxes[:, [0, 2]] >= 0).all() and (boxes[:, [0, 2]] <= 90).all()
    assert (boxes[:, [1, 3]] >= 0).all() and (boxes[:, [1, 3]] <= 50).all()
    assert scores.shape == labels.shape == (boxes.shape[0],)
    assert labels.max() < 3

    lp = yn.build_lp_adapter(path, conf=0.0)
    b, s = lp(frame)
    assert b.shape[1] == 4 and s.ndim == 1

    ev = yn.build_eval_adapter(path, conf=0.0)
    out = ev(frame[None].astype(np.float32) / 255.0)
    assert set(out) == {"boxes", "labels", "scores"}
    assert out["labels"].dtype == np.int64


def test_detect_padded_and_benchmark_plot_backend(tmp_path):
    """detect_padded runs at the frame's own /32-padded size (the
    benchmark_plot YOLO protocol) and the benchmark_plot build_yolo
    factory prefers the .npz backend."""
    path, _, _ = _twin_npz(tmp_path)
    det = yn.YOLOv8NativeDetector.load(path)
    frame = (np.random.default_rng(13).random((40, 70, 3)) * 255
             ).astype(np.uint8)
    boxes, scores, labels = det.detect_padded(frame, conf=0.0, iou=0.9,
                                              max_det=5)
    assert 0 < boxes.shape[0] <= 5
    assert (boxes[:, [0, 2]] >= 0).all() and (boxes[:, [0, 2]] <= 70).all()
    assert (boxes[:, [1, 3]] >= 0).all() and (boxes[:, [1, 3]] <= 40).all()

    from conftest import repo_module
    bp = repo_module("benchmark_plot")
    adapter = bp.build_yolo(str(path))  # .npz named directly
    out = adapter(frame, labels_start_index=1)
    assert set(out) == {"boxes", "labels", "scores"}
    assert out["labels"].min() >= 1  # start-index shift applied
