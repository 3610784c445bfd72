"""Evaluation detector adapters for the OD-mAP branch of validation.

The reference builds its eval detector inside `do_eval` keyed on the active
perceptual-loss family (core/engine/validation.py:132-141): Faster-RCNN
losses -> torchvision fasterrcnn_resnet50_fpn_v2 (min 1088 / max 1920),
anything else -> ultralytics YOLOv8m. Those zoos are host-side and optional
in this image, so the adapter is built once at trainer startup — and only
when the configured curriculum actually reaches OD_STAGE — and returns
None with an actionable log line when the dependency is missing; the
trainer then runs RD eval without the mAP column instead of crashing
(same pluggable-adapter posture as codec/vcm_pipeline.build_detector).

A detector adapter is `fn(decoded: np.ndarray (1,H,W,C) in [0,1]) ->
{"boxes": (K,4) xyxy, "labels": (K,), "scores": (K,)}` — the contract
eval_object_detection and detection_metrics.MeanAveragePrecision consume.
"""

from __future__ import annotations

import logging
import os

import numpy as np

logger = logging.getLogger("CORE")


def build_eval_detector(cfg):
    """Returns a detector adapter or None if no backend is available."""
    pl_model = str(getattr(cfg.SOLVER, "PL_MODEL", "resnet")).lower()
    if pl_model in ("resnet", "fpn", "faster_rcnn", "faster_rcnn_fpn",
                    "faster_rcnn_resnet"):
        return _build_fasterrcnn(cfg)
    return _build_yolo(cfg)


def _build_fasterrcnn(cfg):
    weights = os.path.join(
        "pretrained", "fasterrcnn_resnet50_fpn_v2_coco-dd69338a.pth")
    try:
        import torch
        import torchvision
    except ImportError as e:
        # the native Faster-RCNN needs only plain torch to read the .pth
        # (it is an ordinary state dict) — detection then runs in Flax
        if os.path.exists(weights):
            from .rcnn_native import build_eval_adapter
            logger.info("OD-mAP eval: native Faster-RCNN detector from %s "
                        "(torchvision not installed)", weights)
            return build_eval_adapter(weights)
        logger.warning(
            "OD-mAP eval needs the Faster-RCNN detector (reference "
            "validation.py:135): place %s (the native backend reads it "
            "without torchvision) or install torchvision (%s) — skipping "
            "mAP during training.", weights, e)
        return None
    det = torchvision.models.detection.fasterrcnn_resnet50_fpn_v2(
        min_size=1088, max_size=1920, weights=None, weights_backbone=None)
    if os.path.exists(weights):
        det.load_state_dict(torch.load(weights, map_location="cpu"))
    else:
        logger.warning("detector weights %s not found; using random init "
                       "(mAP will be meaningless)", weights)
    det.eval()

    def adapter(decoded):
        # decoded: (1, H, W, C) float [0,1] -> torchvision wants CHW list
        with torch.no_grad():
            img = torch.from_numpy(
                np.ascontiguousarray(decoded[0].transpose(2, 0, 1)))
            out = det([img])[0]
        return {"boxes": out["boxes"].numpy(),
                "labels": out["labels"].numpy(),
                "scores": out["scores"].numpy()}

    return adapter


def _build_yolo(cfg):
    # preferred: the framework's native YOLOv8 (TPU inference, torch-free)
    # on weights exported once by tools/export_yolo_detector.py
    native = os.path.join("pretrained", "yolov8m.npz")
    if os.path.exists(native):
        from .yolo_native import build_eval_adapter
        logger.info("OD-mAP eval: native YOLOv8 detector from %s", native)
        return build_eval_adapter(native)
    try:
        from ultralytics import YOLO
    except ImportError as e:
        logger.warning(
            "OD-mAP eval needs the YOLOv8 detector (reference "
            "validation.py:140): export pretrained/yolov8m.npz once with "
            "tools/export_yolo_detector.py, or install ultralytics + "
            "place pretrained/yolov8m.pt (%s) — skipping mAP during "
            "training.", e)
        return None
    det = YOLO(os.path.join("pretrained", "yolov8m.pt"))

    def adapter(decoded):
        # ultralytics interprets a raw numpy HWC array as an OpenCV BGR
        # image; the pipeline hands us RGB, so swap channels (and round
        # rather than truncate the [0,1] -> uint8 conversion).
        img = np.rint(decoded[0, :, :, ::-1] * 255).astype(np.uint8)
        res = det.predict(np.ascontiguousarray(img), verbose=False)[0]
        return {"boxes": res.boxes.xyxy.cpu().numpy(),
                "labels": res.boxes.cls.cpu().numpy().astype(np.int64),
                "scores": res.boxes.conf.cpu().numpy()}

    return adapter
