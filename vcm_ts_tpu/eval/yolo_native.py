"""Native YOLOv8 detector: Flax backbone+neck + v8 Detect head, DFL box
decode, letterbox preprocessing, and host NMS.

The reference runs its license-plate and eval detectors through the
ultralytics torch zoo (video_coder.py:261-306,
core/engine/validation.py:132-141). This module completes that detection
path natively: the same graph in Flax (backbone/neck shared with the
perceptual loss, train/yolo_v8.py), jitted on TPU, consuming weights
exported ONCE to a torch-free .npz by tools/export_yolo_detector.py
(the only step that needs ultralytics — run it wherever that package
exists and ship the .npz). Detection inference then runs anywhere this
framework runs, with no external model zoo.

Decode semantics follow the public v8 head: per-scale box branch predicts
4*reg_max DFL logits whose softmax expectation gives ltrb distances in
feature units from each cell center (x+0.5, y+0.5), scaled by the stride
(8/16/32); class branch is per-class sigmoid; class-aware NMS on host.
"""

from __future__ import annotations

import json

import numpy as np

STRIDES = (8, 16, 32)


# --------------------------------------------------------------------------
# modules
# --------------------------------------------------------------------------

def _make_head(nc: int, reg_max: int = 16):
    """v8 Detect head ("model.22"). Children are named with the ultralytics
    state-dict segments (cv2.i.j / cv3.i.j) so exported weights import
    mechanically through utils/weight_import."""
    from flax import linen as nn

    from ..train.yolo_v8 import ConvBnSiLU

    class YOLOv8Detect(nn.Module):
        nc: int = 80
        reg_max: int = 16

        @nn.compact
        def __call__(self, feats):
            ch = [f.shape[-1] for f in feats]
            c2 = max(16, ch[0] // 4, self.reg_max * 4)
            c3 = max(ch[0], min(self.nc, 100))
            outs = []
            for i, f in enumerate(feats):
                box = ConvBnSiLU(c2, 3, name=f"cv2.{i}.0")(f)
                box = ConvBnSiLU(c2, 3, name=f"cv2.{i}.1")(box)
                box = nn.Conv(4 * self.reg_max, (1, 1),
                              name=f"cv2.{i}.2")(box)
                cls = ConvBnSiLU(c3, 3, name=f"cv3.{i}.0")(f)
                cls = ConvBnSiLU(c3, 3, name=f"cv3.{i}.1")(cls)
                cls = nn.Conv(self.nc, (1, 1), name=f"cv3.{i}.2")(cls)
                outs.append((box, cls))
            return outs

    return YOLOv8Detect(nc=nc, reg_max=reg_max)


def decode_detections(outs, reg_max: int = 16, strides=STRIDES):
    """(box, cls) maps per scale -> (boxes xyxy (N, M, 4) in input pixels,
    scores (N, M, nc) sigmoid). Pure jnp; jit-safe for static shapes."""
    import jax
    import jax.numpy as jnp

    boxes_all, scores_all = [], []
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    for (box, cls), s in zip(outs, strides):
        n, h, w, _ = box.shape
        d = jax.nn.softmax(box.reshape(n, h, w, 4, reg_max), axis=-1) @ bins
        cx = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, None, :]
        cy = (jnp.arange(h, dtype=jnp.float32) + 0.5)[None, :, None]
        x1 = (cx - d[..., 0]) * s
        y1 = (cy - d[..., 1]) * s
        x2 = (cx + d[..., 2]) * s
        y2 = (cy + d[..., 3]) * s
        boxes_all.append(
            jnp.stack([x1, y1, x2, y2], axis=-1).reshape(n, h * w, 4))
        scores_all.append(
            jax.nn.sigmoid(cls).reshape(n, h * w, cls.shape[-1]))
    return (jnp.concatenate(boxes_all, axis=1),
            jnp.concatenate(scores_all, axis=1))


# --------------------------------------------------------------------------
# host-side pre/post
# --------------------------------------------------------------------------

def letterbox(img: np.ndarray, imgsz: int = 640, pad_value: int = 114):
    """Aspect-preserving resize into an (imgsz, imgsz) canvas (the
    ultralytics LetterBox convention: symmetric padding with 114).
    Returns (canvas float32 [0,1], scale r, (dw, dh) left/top pad)."""
    import cv2 as cv

    h, w = img.shape[:2]
    r = min(imgsz / h, imgsz / w)
    nw, nh = round(w * r), round(h * r)
    dw, dh = (imgsz - nw) / 2, (imgsz - nh) / 2
    resized = cv.resize(img, (nw, nh),
                        interpolation=cv.INTER_LINEAR) if (nw, nh) != (w, h) \
        else img
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    canvas = cv.copyMakeBorder(resized, top, bottom, left, right,
                               cv.BORDER_CONSTANT,
                               value=(pad_value,) * 3)
    return canvas.astype(np.float32) / 255.0, r, (left, top)


def nms(boxes: np.ndarray, scores: np.ndarray, iou_thres: float = 0.7,
        max_det: int = 300) -> np.ndarray:
    """Greedy IoU NMS; returns kept indices sorted by descending score."""
    order = np.argsort(scores)[::-1]
    x1, y1, x2, y2 = boxes.T
    areas = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    keep = []
    while order.size and len(keep) < max_det:
        i = order[0]
        keep.append(i)
        rest = order[1:]
        xx1 = np.maximum(x1[i], x1[rest])
        yy1 = np.maximum(y1[i], y1[rest])
        xx2 = np.minimum(x2[i], x2[rest])
        yy2 = np.minimum(y2[i], y2[rest])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        iou = inter / np.maximum(areas[i] + areas[rest] - inter, 1e-9)
        order = rest[iou <= iou_thres]
    return np.asarray(keep, np.int64)


# --------------------------------------------------------------------------
# the detector
# --------------------------------------------------------------------------

class YOLOv8NativeDetector:
    """Backbone + head as two param trees (matching the two torch name
    spaces: "model.N.*" and "model.22.*"), one jitted forward."""

    def __init__(self, nc: int = 80, width: float = 0.75,
                 depth: float = 0.67, max_channels: int = 768,
                 reg_max: int = 16, imgsz: int = 640):
        from ..train.yolo_v8 import YOLOv8Backbone

        self.nc, self.reg_max, self.imgsz = nc, reg_max, imgsz
        self.backbone = YOLOv8Backbone(width=width, depth=depth,
                                       max_channels=max_channels)
        self.head = _make_head(nc, reg_max)
        self.bb_params = None
        self.head_params = None
        self._jit_fwd = None

    # -- params ------------------------------------------------------------
    def init(self, rng=None):
        """Random-init both trees (tests / smoke)."""
        import jax
        import jax.numpy as jnp

        rng = jax.random.PRNGKey(0) if rng is None else rng
        x = jnp.zeros((1, 64, 64, 3))
        self.bb_params = self.backbone.init(rng, x)
        taps = self.backbone.apply(self.bb_params, x)
        feats = [taps["3_deep"], taps["4_deep"], taps["5_deep"]]
        self.head_params = self.head.init(rng, feats)
        return self

    @classmethod
    def load(cls, npz_path: str, imgsz: int | None = None):
        """Load a tools/export_yolo_detector.py or
        tools/train_plate_detector.py .npz (torch-free). imgsz resolution:
        explicit arg > meta record > 640."""
        from ..utils.weight_import import import_state_dict

        data = np.load(npz_path)
        meta = json.loads(str(data["__meta__"]))
        if imgsz is None:
            imgsz = int(meta.get("imgsz", 640))
        det = cls(nc=meta["nc"], width=meta["width"], depth=meta["depth"],
                  max_channels=meta["max_channels"],
                  reg_max=meta["reg_max"], imgsz=imgsz).init()
        bb_sd, head_sd = {}, {}
        for k in data.files:
            if k == "__meta__":
                continue
            if k.startswith("model.22."):
                head_sd[k[len("model.22."):]] = data[k]
            elif k.startswith("model."):
                bb_sd[k[len("model."):]] = data[k]
        # dfl.conv.weight is the constant arange kernel — not a parameter
        head_sd = {k: v for k, v in head_sd.items()
                   if not k.startswith("dfl.")}
        det.bb_params = import_state_dict(det.bb_params, bb_sd, strict="cover")
        det.head_params = import_state_dict(det.head_params, head_sd,
                                            strict="cover")
        return det

    # -- inference -----------------------------------------------------------
    def _forward(self):
        import jax

        if self._jit_fwd is None:
            def fwd(bb, hp, x):
                taps = self.backbone.apply(bb, x)
                outs = self.head.apply(
                    hp, [taps["3_deep"], taps["4_deep"], taps["5_deep"]])
                return decode_detections(outs, self.reg_max)

            self._jit_fwd = jax.jit(fwd)
        return self._jit_fwd

    def raw(self, x_nhwc):
        """(boxes, scores) in letterboxed-input pixels; device arrays."""
        return self._forward()(self.bb_params, self.head_params, x_nhwc)

    def detect(self, frame_rgb_uint8: np.ndarray, conf: float = 0.25,
               iou: float = 0.7, max_det: int = 300):
        """Full single-image detection: letterbox -> jitted forward ->
        confidence filter -> class-aware NMS -> boxes mapped back to the
        original frame. Returns (boxes xyxy float (K,4), scores (K,),
        labels int (K,))."""
        h0, w0 = frame_rgb_uint8.shape[:2]
        canvas, r, (dw, dh) = letterbox(frame_rgb_uint8, self.imgsz)
        boxes, scores = self.raw(canvas[None])
        boxes = np.asarray(boxes[0], np.float32)
        scores = np.asarray(scores[0], np.float32)
        labels = scores.argmax(-1)
        best = scores.max(-1)
        sel = best >= conf
        boxes, best, labels = boxes[sel], best[sel], labels[sel]
        if boxes.shape[0]:
            # class-aware NMS: offset boxes per class so cross-class pairs
            # never suppress each other. Decoded boxes are unclipped, so
            # their span exceeds the canvas by (reg_max-1)*stride on each
            # side — the offset step must clear the full span
            step = self.imgsz + 2 * self.reg_max * max(STRIDES)
            off = labels[:, None].astype(np.float32) * step
            keep = nms(boxes + off, best, iou, max_det)
            boxes, best, labels = boxes[keep], best[keep], labels[keep]
        # undo letterbox
        boxes[:, [0, 2]] = (boxes[:, [0, 2]] - dw) / r
        boxes[:, [1, 3]] = (boxes[:, [1, 3]] - dh) / r
        boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, w0)
        boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, h0)
        return boxes, best, labels


    def detect_padded(self, frame_rgb_uint8: np.ndarray, conf: float = 0.25,
                      iou: float = 0.7, max_det: int = 300):
        """Full-resolution detection at the frame's own size, padded to a
        /32 multiple (benchmark_plot.py's YOLO protocol — no letterbox
        rescale). One jit specialization per distinct padded size."""
        from ..codec.bitstream import get_padding_size

        h0, w0 = frame_rgb_uint8.shape[:2]
        pl, pr, pt, pb = get_padding_size(h0, w0, p=32)
        canvas = np.pad(frame_rgb_uint8.astype(np.float32) / 255.0,
                        ((pt, pb), (pl, pr), (0, 0)))
        boxes, scores = self.raw(canvas[None])
        boxes = np.asarray(boxes[0], np.float32)
        scores = np.asarray(scores[0], np.float32)
        labels = scores.argmax(-1)
        best = scores.max(-1)
        sel = best >= conf
        boxes, best, labels = boxes[sel], best[sel], labels[sel]
        if boxes.shape[0]:
            # offset step must clear the unclipped decoded-box span (see
            # detect())
            step = (float(max(canvas.shape[:2]))
                    + 2 * self.reg_max * max(STRIDES))
            off = labels[:, None].astype(np.float32) * step
            keep = nms(boxes + off, best, iou, max_det)
            boxes, best, labels = boxes[keep], best[keep], labels[keep]
        boxes[:, [0, 2]] = (boxes[:, [0, 2]] - pl).clip(0, w0)
        boxes[:, [1, 3]] = (boxes[:, [1, 3]] - pt).clip(0, h0)
        return boxes, best, labels


def build_lp_adapter(npz_path: str, conf: float = 0.25):
    """vcm_pipeline.build_detector contract: frame -> (boxes, scores)."""
    det = YOLOv8NativeDetector.load(npz_path)

    def adapter(frame):
        boxes, scores, _ = det.detect(frame, conf=conf)
        return boxes, scores

    return adapter


def build_eval_adapter(npz_path: str, conf: float = 0.25):
    """eval/detector.py contract: decoded [0,1] (1,H,W,C) -> dict.

    conf defaults to 0.25 — the ultralytics predict() default the
    fallback backend runs at — so mAP numbers stay comparable across
    backends."""
    det = YOLOv8NativeDetector.load(npz_path)

    def adapter(decoded):
        frame = np.rint(np.asarray(decoded)[0] * 255).clip(
            0, 255).astype(np.uint8)
        boxes, scores, labels = det.detect(frame, conf=conf)
        # same label convention as the ultralytics adapter (raw cls ids,
        # eval/detector.py _build_yolo)
        return {"boxes": boxes, "labels": labels.astype(np.int64),
                "scores": scores}

    return adapter
