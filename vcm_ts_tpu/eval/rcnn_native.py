"""Native Faster-RCNN (resnet50-FPN v2) inference: the reference's default
OD-mAP eval detector (core/engine/validation.py:132-139) without the
torchvision zoo.

The Flax ResNet-50 body + FPN v2 already exist for the perceptual loss
(train/losses.py, torchvision-compatible naming — the real
`fasterrcnn_resnet50_fpn_v2_coco-dd69338a.pth` imports directly with
plain torch, no torchvision needed). This module adds the detection
machinery: RPN head, multi-level anchor generation, proposal
decode/filter/NMS, multi-scale RoIAlign (aligned=False, sampling_ratio 2),
the conv-FC box head, and per-class post-processing — the public
fasterrcnn_resnet50_fpn_v2 inference semantics.

Checkpoint structure (norm layers in the RPN/box heads, the box-head
linear index, class count) is INTROSPECTED from the state dict at load
time rather than hard-coded, so variations across torchvision releases
surface as load errors, not silent weight mismatches.
"""

from __future__ import annotations

import math

import numpy as np

# level strides of the FPN maps ["0","1","2","3","pool"]
STRIDES = (4, 8, 16, 32, 64)
ANCHOR_SIZES = (32, 64, 128, 256, 512)
ASPECT_RATIOS = (0.5, 1.0, 2.0)
BBOX_XFORM_CLIP = math.log(1000.0 / 16)


# --------------------------------------------------------------------------
# modules
# --------------------------------------------------------------------------

def _build_heads(num_classes: int, rpn_depth: int, rpn_norm: bool,
                 box_convs: int, box_fc: int):
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from ..train.losses import FrozenBatchNorm

    num_anchors = len(ASPECT_RATIOS)

    class RPNHead(nn.Module):
        @nn.compact
        def __call__(self, f):
            for i in range(rpn_depth):
                f = nn.Conv(f.shape[-1], (3, 3), padding=1,
                            use_bias=not rpn_norm, name=f"conv{i}")(f)
                if rpn_norm:
                    f = FrozenBatchNorm(f.shape[-1], name=f"bn{i}")(f)
                f = jax.nn.relu(f)
            logits = nn.Conv(num_anchors, (1, 1), name="cls")(f)
            deltas = nn.Conv(num_anchors * 4, (1, 1), name="bbox")(f)
            return logits, deltas

    class BoxHead(nn.Module):
        @nn.compact
        def __call__(self, x):  # (N, 7, 7, 256)
            for i in range(box_convs):
                x = nn.Conv(x.shape[-1], (3, 3), padding=1, use_bias=False,
                            name=f"conv{i}")(x)
                x = FrozenBatchNorm(x.shape[-1], name=f"bn{i}")(x)
                x = jax.nn.relu(x)
            # torchvision flattens NCHW: (C, H, W) order
            x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
            x = jax.nn.relu(nn.Dense(box_fc, name="fc")(x))
            scores = nn.Dense(num_classes, name="cls_score")(x)
            deltas = nn.Dense(num_classes * 4, name="bbox_pred")(x)
            return jax.nn.softmax(scores, axis=-1), deltas

    del jnp
    return RPNHead(), BoxHead()


# --------------------------------------------------------------------------
# anchors / box math (host, numpy)
# --------------------------------------------------------------------------

def cell_anchors(size, ratios=ASPECT_RATIOS):
    """torchvision AnchorGenerator.generate_anchors (rounded base)."""
    r = np.asarray(ratios, np.float64)
    h_ratios = np.sqrt(r)
    w_ratios = 1.0 / h_ratios
    ws = w_ratios * size
    hs = h_ratios * size
    base = np.stack([-ws, -hs, ws, hs], axis=1) / 2
    return np.round(base).astype(np.float32)


def level_anchors(h, w, stride, size):
    """All anchors of one feature level, (H*W*A, 4) xyxy."""
    base = cell_anchors(size)  # (A, 4)
    sx = (np.arange(w, dtype=np.float32) * stride)
    sy = (np.arange(h, dtype=np.float32) * stride)
    shift_x, shift_y = np.meshgrid(sx, sy)
    shifts = np.stack([shift_x, shift_y, shift_x, shift_y],
                      axis=-1).reshape(-1, 1, 4)
    return (shifts + base[None]).reshape(-1, 4)


def decode_boxes(deltas, anchors, weights=(1.0, 1.0, 1.0, 1.0)):
    """torchvision BoxCoder.decode_single."""
    wx, wy, ww, wh = weights
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = anchors[:, 0] + 0.5 * aw
    ay = anchors[:, 1] + 0.5 * ah
    dx, dy, dw, dh = (deltas[:, 0] / wx, deltas[:, 1] / wy,
                      np.minimum(deltas[:, 2] / ww, BBOX_XFORM_CLIP),
                      np.minimum(deltas[:, 3] / wh, BBOX_XFORM_CLIP))
    cx = dx * aw + ax
    cy = dy * ah + ay
    pw = np.exp(dw) * aw
    ph = np.exp(dh) * ah
    return np.stack([cx - 0.5 * pw, cy - 0.5 * ph,
                     cx + 0.5 * pw, cy + 0.5 * ph], axis=1)


def clip_boxes(boxes, h, w):
    out = boxes.copy()
    out[:, [0, 2]] = out[:, [0, 2]].clip(0, w)
    out[:, [1, 3]] = out[:, [1, 3]].clip(0, h)
    return out


def batched_nms(boxes, scores, idxs, iou_thres):
    """Category-aware NMS via the coordinate-offset trick (torchvision
    semantics). Returns kept indices sorted by descending score."""
    from .yolo_native import nms

    if boxes.shape[0] == 0:
        return np.zeros((0,), np.int64)
    off = idxs.astype(np.float32) * (boxes.max() + 1.0)
    return nms(boxes + off[:, None], scores, iou_thres, max_det=10 ** 9)


# --------------------------------------------------------------------------
# RoIAlign (aligned=False, like torchvision's detection models)
# --------------------------------------------------------------------------

def roi_align(feat, rois, spatial_scale, out=7, ratio=2):
    """feat (H, W, C) jnp, rois (N, 4) image-coord xyxy numpy ->
    (N, out, out, C). Sampling grid per output bin: `ratio` x `ratio`
    bilinear samples, averaged; out-of-map samples contribute 0."""
    import jax.numpy as jnp

    H, W = feat.shape[:2]
    r = rois * spatial_scale
    x1, y1 = r[:, 0], r[:, 1]
    # aligned=False clamps roi extents to >= 1 feature unit before
    # binning (torchvision roi_align_common.h) — sub-unit proposals
    # otherwise sample a different grid than the weights were trained on
    bw = np.maximum(r[:, 2] - x1, 1.0) / out
    bh = np.maximum(r[:, 3] - y1, 1.0) / out
    g = (np.arange(out * ratio, dtype=np.float32) + 0.5) / ratio  # bin units
    xs = x1[:, None] + g[None] * bw[:, None]   # (N, out*ratio)
    ys = y1[:, None] + g[None] * bh[:, None]

    def sample(coords, size):
        valid = (coords > -1.0) & (coords < size)
        c = coords.clip(0, size - 1)
        lo = np.floor(c)
        frac = c - lo
        return lo.astype(np.int32), frac.astype(np.float32), valid

    xlo, xf, xv = sample(xs, W)
    ylo, yf, yv = sample(ys, H)
    xhi = np.minimum(xlo + 1, W - 1)
    yhi = np.minimum(ylo + 1, H - 1)

    fx = jnp.asarray(feat)
    # advanced-indexing gathers: (N, S)[:, :, None] x (N, S)[:, None, :]
    # broadcast to the (N, S, S) sample grid, channels ride along
    v00 = fx[jnp.asarray(ylo)[:, :, None], jnp.asarray(xlo)[:, None, :]]
    v01 = fx[jnp.asarray(ylo)[:, :, None], jnp.asarray(xhi)[:, None, :]]
    v10 = fx[jnp.asarray(yhi)[:, :, None], jnp.asarray(xlo)[:, None, :]]
    v11 = fx[jnp.asarray(yhi)[:, :, None], jnp.asarray(xhi)[:, None, :]]
    wy = jnp.asarray(yf)[:, :, None, None]
    wx = jnp.asarray(xf)[:, None, :, None]
    val = ((1 - wy) * (1 - wx) * v00 + (1 - wy) * wx * v01
           + wy * (1 - wx) * v10 + wy * wx * v11)
    mask = (jnp.asarray(yv)[:, :, None] & jnp.asarray(xv)[:, None, :]
            )[..., None]
    val = jnp.where(mask, val, 0.0)
    n, s = val.shape[0], out * ratio
    val = val.reshape(n, out, ratio, s, -1).mean(axis=2)
    val = val.reshape(n, out, out, ratio, -1).mean(axis=3)
    return val


def map_levels(rois, k0=4, kmin=2, kmax=5, canonical=224):
    """torchvision LevelMapper: FPN level per roi (0..3 into ["0".."3"])."""
    area = np.maximum(rois[:, 2] - rois[:, 0], 0) * np.maximum(
        rois[:, 3] - rois[:, 1], 0)
    k = np.floor(k0 + np.log2(np.sqrt(area) / canonical + 1e-6))
    return (np.clip(k, kmin, kmax) - kmin).astype(np.int64)


# --------------------------------------------------------------------------
# the detector
# --------------------------------------------------------------------------

_IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def _pow2(n):
    return 1 << (max(n, 1) - 1).bit_length()


class FasterRCNNNativeDetector:
    """fasterrcnn_resnet50_fpn_v2 inference. Thresholds/sizes follow the
    torchvision eval defaults; min/max size are the knobs the reference
    eval detector sets to 1088/1920 (eval/detector.py)."""

    def __init__(self, num_classes=91, rpn_depth=2, rpn_norm=False,
                 box_convs=4, box_fc=1024, min_size=800, max_size=1333,
                 rpn_pre_nms=1000, rpn_post_nms=1000, rpn_nms_thresh=0.7,
                 score_thresh=0.05, nms_thresh=0.5, detections=100):
        from ..train.losses import FPN, ResNet50Body

        self.cfg = dict(num_classes=num_classes, min_size=min_size,
                        max_size=max_size, rpn_pre_nms=rpn_pre_nms,
                        rpn_post_nms=rpn_post_nms,
                        rpn_nms_thresh=rpn_nms_thresh,
                        score_thresh=score_thresh, nms_thresh=nms_thresh,
                        detections=detections)
        self.body = ResNet50Body()
        self.fpn = FPN()
        self.rpn_head, self.box_head = _build_heads(
            num_classes, rpn_depth, rpn_norm, box_convs, box_fc)
        self.params = None  # {"body", "fpn", "rpn", "box"}
        self._jits = {}

    def init(self, rng=None):
        import jax
        import jax.numpy as jnp

        rng = jax.random.PRNGKey(0) if rng is None else rng
        x = jnp.zeros((1, 64, 64, 3))
        bp = self.body.init(rng, x)
        feats = self.body.apply(bp, x)
        fp = self.fpn.init(rng, {k: feats[k] for k in ("2", "3", "4", "5")})
        fpn_out = self.fpn.apply(
            fp, {k: feats[k] for k in ("2", "3", "4", "5")})
        rp = self.rpn_head.init(rng, fpn_out["0"])
        hp = self.box_head.init(rng, jnp.zeros((1, 7, 7, 256)))
        self.params = {"body": bp, "fpn": fp, "rpn": rp, "box": hp}
        return self

    # -- loading -------------------------------------------------------------
    @staticmethod
    def introspect(sd) -> dict:
        """Detect head structure from a torchvision detection state dict."""
        if any(k.startswith("roi_heads.box_head.fc6") for k in sd):
            raise RuntimeError(
                "this checkpoint uses the v1 TwoMLPHead layout; only the "
                "fasterrcnn_resnet50_fpn_v2 layout (conv-FC box head, the "
                "reference's checkpoint) is supported")
        rpn_idx = [int(k.split(".")[3]) for k in sd
                   if k.startswith("rpn.head.conv.")
                   and k.split(".")[3].isdigit()]
        if not rpn_idx:
            raise RuntimeError(
                "unrecognized RPN head layout (expected the v2 "
                "rpn.head.conv.<i>.<j> Sequential keys)")
        rpn_depth = 1 + max(rpn_idx)
        rpn_norm = any(k.startswith("rpn.head.conv.0.1.") for k in sd)
        box_keys = [k for k in sd if k.startswith("roi_heads.box_head.")]
        conv_idx = sorted({int(k.split(".")[2]) for k in box_keys
                           if sd[k].ndim == 4})
        fc_idx = [int(k.split(".")[2]) for k in box_keys
                  if k.endswith("weight") and sd[k].ndim == 2]
        num_classes = sd["roi_heads.box_predictor.cls_score.weight"].shape[0]
        box_fc = sd[f"roi_heads.box_head.{fc_idx[0]}.weight"].shape[0]
        return dict(num_classes=int(num_classes), rpn_depth=rpn_depth,
                    rpn_norm=rpn_norm, box_convs=len(conv_idx),
                    box_fc=int(box_fc), _fc_idx=fc_idx[0],
                    _conv_idx=conv_idx)

    @classmethod
    def load_pth(cls, pth_path: str, **kw):
        """Load the real torchvision checkpoint — a plain state dict that
        deserializes with torch alone (no torchvision needed)."""
        from ..utils.weight_import import (import_state_dict,
                                           load_torch_state_dict)

        sd = load_torch_state_dict(pth_path)
        meta = cls.introspect(sd)
        fc_idx, conv_idx = meta.pop("_fc_idx"), meta.pop("_conv_idx")
        det = cls(**{**meta, **kw}).init()

        body_sd = {k[len("backbone.body."):]: v for k, v in sd.items()
                   if k.startswith("backbone.body.")}
        fpn_sd = {k[len("backbone.fpn."):]: v for k, v in sd.items()
                  if k.startswith("backbone.fpn.")}
        rpn_sd = {}
        for k, v in sd.items():
            if k.startswith("rpn.head.conv."):
                _, _, _, i, j, leaf = k.split(".")
                name = (f"conv{i}" if j == "0" else f"bn{i}")
                rpn_sd[f"{name}.{leaf}"] = v
            elif k.startswith("rpn.head.cls_logits."):
                rpn_sd["cls." + k.split(".")[-1]] = v
            elif k.startswith("rpn.head.bbox_pred."):
                rpn_sd["bbox." + k.split(".")[-1]] = v
        box_sd = {}
        for k, v in sd.items():
            if k.startswith("roi_heads.box_head."):
                parts = k.split(".")
                i = int(parts[2])
                if i == fc_idx:
                    box_sd["fc." + parts[-1]] = v
                elif i in conv_idx:
                    j, leaf = parts[3], parts[-1]
                    name = (f"conv{conv_idx.index(i)}" if j == "0"
                            else f"bn{conv_idx.index(i)}")
                    box_sd[f"{name}.{leaf}"] = v
            elif k.startswith("roi_heads.box_predictor."):
                box_sd[".".join(k.split(".")[2:])] = v

        def _imp(name, sub_sd):
            """Per-subtree all-or-nothing: a non-empty subtree must cover
            every flax param (a renamed torchvision key surfaces as a
            load error, not silent random init); a fully absent subtree
            (heads-only test fixtures) warns and stays at init."""
            if not sub_sd:
                import logging
                logging.getLogger(__name__).warning(
                    "load_pth: no '%s' keys in checkpoint; subtree left "
                    "at random init", name)
                return det.params[name]
            return import_state_dict(det.params[name], sub_sd,
                                     strict="cover")

        det.params = {
            "body": _imp("body", body_sd),
            "fpn": _imp("fpn", fpn_sd),
            "rpn": _imp("rpn", rpn_sd),
            "box": _imp("box", box_sd),
        }
        return det

    # -- inference -----------------------------------------------------------
    def _backbone_fwd(self):
        import jax

        if "backbone" not in self._jits:
            def fwd(bp, fp, rp, x):
                feats = self.body.apply(bp, x)
                fpn_out = self.fpn.apply(
                    fp, {k: feats[k] for k in ("2", "3", "4", "5")})
                levels = [fpn_out[k] for k in ("0", "1", "2", "3", "pool")]
                rpn = [self.rpn_head.apply(rp, f) for f in levels]
                return levels, rpn

            self._jits["backbone"] = jax.jit(fwd)
        return self._jits["backbone"]

    def _box_fwd(self):
        import jax

        if "box" not in self._jits:
            self._jits["box"] = jax.jit(
                lambda hp, crops: self.box_head.apply(hp, crops))
        return self._jits["box"]

    def _preprocess(self, frame_rgb_uint8):
        import cv2 as cv

        c = self.cfg
        h, w = frame_rgb_uint8.shape[:2]
        scale = min(c["min_size"] / min(h, w), c["max_size"] / max(h, w))
        nh, nw = int(round(h * scale)), int(round(w * scale))
        img = cv.resize(frame_rgb_uint8, (nw, nh),
                        interpolation=cv.INTER_LINEAR).astype(np.float32)
        img = (img / 255.0 - _IMAGENET_MEAN) / _IMAGENET_STD
        ph, pw = -nh % 32, -nw % 32
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)))
        return img[None], (nh, nw), scale

    def _proposals(self, rpn_outs, shapes, img_hw):
        """RPN post-processing on host (torchvision filter_proposals)."""
        c = self.cfg
        all_boxes, all_scores, all_lvl = [], [], []
        for lvl, ((logits, deltas), (fh, fw)) in enumerate(
                zip(rpn_outs, shapes)):
            A = len(ASPECT_RATIOS)
            # NHW(A) -> torchvision anchor order is (A, H, W) flattened
            # per level as HWA after its permute_and_flatten (N,H,W,A)
            obj = np.asarray(logits)[0].reshape(-1)
            dl = np.asarray(deltas)[0].reshape(fh * fw * A, 4)
            anchors = level_anchors(fh, fw, STRIDES[lvl],
                                    ANCHOR_SIZES[lvl])
            k = min(c["rpn_pre_nms"], obj.shape[0])
            top = np.argpartition(-obj, k - 1)[:k]
            boxes = decode_boxes(dl[top], anchors[top])
            boxes = clip_boxes(boxes, *img_hw)
            keep = ((boxes[:, 2] - boxes[:, 0] >= 1e-3)
                    & (boxes[:, 3] - boxes[:, 1] >= 1e-3))
            all_boxes.append(boxes[keep])
            all_scores.append(obj[top][keep])
            all_lvl.append(np.full(int(keep.sum()), lvl, np.int64))
        boxes = np.concatenate(all_boxes, 0)
        scores = np.concatenate(all_scores, 0)
        lvls = np.concatenate(all_lvl, 0)
        keep = batched_nms(boxes, scores, lvls, c["rpn_nms_thresh"])
        keep = keep[:c["rpn_post_nms"]]
        return boxes[keep]

    def detect(self, frame_rgb_uint8):
        """eval/detector.py contract on RGB uint8 HWC. Returns
        {"boxes" (K,4) original-frame xyxy, "labels" (K,) 1-based COCO,
        "scores" (K,)} — the torchvision adapter's convention."""
        import jax.numpy as jnp

        c = self.cfg
        p = self.params
        h0, w0 = frame_rgb_uint8.shape[:2]
        x, (nh, nw), scale = self._preprocess(frame_rgb_uint8)
        levels, rpn_outs = self._backbone_fwd()(
            p["body"], p["fpn"], p["rpn"], jnp.asarray(x))
        shapes = [lv.shape[1:3] for lv in levels]
        rois = self._proposals(rpn_outs, shapes, (nh, nw))
        if rois.shape[0] == 0:
            return {"boxes": np.zeros((0, 4), np.float32),
                    "labels": np.zeros((0,), np.int64),
                    "scores": np.zeros((0,), np.float32)}

        # multi-scale RoIAlign over levels 0-3, batched through the jitted
        # box head with the roi count padded to a power of two
        lvl = map_levels(rois)
        order = []
        chunks = []
        for li in range(4):
            sel = np.where(lvl == li)[0]
            if sel.size == 0:
                continue
            # stays on device: the level-sorted crops feed the box head
            # directly, and only the small per-roi outputs come to host
            chunks.append(roi_align(
                levels[li][0], rois[sel], 1.0 / STRIDES[li]))
            order.append(sel)
        order = np.concatenate(order, 0)

        n = rois.shape[0]
        m = _pow2(n)
        crops = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, 0)
        if m != n:
            crops = jnp.concatenate(
                [crops, jnp.zeros((m - n, 7, 7, 256), crops.dtype)], 0)
        scores, deltas = self._box_fwd()(p["box"], crops)
        # row j of the (level-sorted) outputs belongs to roi order[j]
        scores_s = np.asarray(scores)[:n]
        deltas_s = np.asarray(deltas)[:n].reshape(n, -1, 4)
        scores = np.empty_like(scores_s)
        deltas = np.empty_like(deltas_s)
        scores[order] = scores_s
        deltas[order] = deltas_s

        out_boxes, out_scores, out_labels = [], [], []
        for cls in range(1, c["num_classes"]):  # skip background 0
            s = scores[:, cls]
            sel = s > c["score_thresh"]
            if not sel.any():
                continue
            b = decode_boxes(deltas[sel, cls], rois[sel],
                             weights=(10.0, 10.0, 5.0, 5.0))
            b = clip_boxes(b, nh, nw)
            ok = ((b[:, 2] - b[:, 0] >= 1e-2)
                  & (b[:, 3] - b[:, 1] >= 1e-2))
            out_boxes.append(b[ok])
            out_scores.append(s[sel][ok])
            out_labels.append(np.full(int(ok.sum()), cls, np.int64))
        if not out_boxes:
            return {"boxes": np.zeros((0, 4), np.float32),
                    "labels": np.zeros((0,), np.int64),
                    "scores": np.zeros((0,), np.float32)}
        boxes = np.concatenate(out_boxes, 0)
        fscores = np.concatenate(out_scores, 0)
        labels = np.concatenate(out_labels, 0)
        keep = batched_nms(boxes, fscores, labels, c["nms_thresh"])
        keep = keep[:c["detections"]]
        # map back with per-axis ratios (torchvision resize_boxes): the
        # rounded resize makes the uniform scale slightly off per axis
        out = boxes[keep].copy()
        out[:, [0, 2]] *= w0 / nw
        out[:, [1, 3]] *= h0 / nh
        return {"boxes": out,
                "labels": labels[keep],
                "scores": fscores[keep]}


def build_eval_adapter(pth_path: str, min_size=1088, max_size=1920):
    """eval/detector.py contract: decoded [0,1] (1,H,W,C) -> dict (same
    min/max size the reference passes to torchvision)."""
    det = FasterRCNNNativeDetector.load_pth(pth_path, min_size=min_size,
                                            max_size=max_size)

    def adapter(decoded):
        frame = np.rint(np.asarray(decoded)[0] * 255).clip(
            0, 255).astype(np.uint8)
        return det.detect(frame)

    return adapter
