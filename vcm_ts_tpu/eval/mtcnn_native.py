"""Native MTCNN face detector: the P/R/O-Net cascade in Flax with the
image-pyramid pipeline on host.

The reference detects faces for the VCM enhancement layer through the
facenet_pytorch MTCNN (video_coder.py:296-310). This module reimplements
the public MTCNN graph (the facenet_pytorch/Matlab-MTCNN semantics:
VALID convs + PReLU + ceil-mode max pools, (W,H,C) dense flatten order,
(x-127.5)/128 normalization, stride-2/cell-12 PNet box generation,
Union/Min NMS modes, bbreg + square rerec between stages) so the cascade
runs natively; weights export once to a torch-free .npz with
tools/export_mtcnn.py (the only step that needs facenet_pytorch).

Stage shapes are TPU-friendly: R/O-Net crop batches pad to the next power
of two so jit specializations stay O(log N) instead of one per face count.
"""

from __future__ import annotations

import json

import numpy as np

THRESHOLDS = (0.6, 0.7, 0.7)
FACTOR = 0.709
MIN_SIZE = 20


# --------------------------------------------------------------------------
# networks
# --------------------------------------------------------------------------

def _build_nets():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    class PReLU(nn.Module):
        """Channel-wise PReLU with the torch parameter name ("weight")."""
        features: int

        @nn.compact
        def __call__(self, x):
            a = self.param("weight", nn.initializers.constant(0.25),
                           (self.features,))
            return jnp.where(x >= 0, x, a * x)

    def _pool(x, k, s):
        """Max pool with torch ceil_mode=True semantics: pad bottom/right
        with -inf so partial windows count."""
        n, h, w, c = x.shape
        ph = (-(h - k) % s) if h > k else 0
        pw = (-(w - k) % s) if w > k else 0
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=-jnp.inf)
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                     (1, k, k, 1), (1, s, s, 1), "VALID")

    def _conv(f, k, name):
        return nn.Conv(f, (k, k), padding="VALID", name=name)

    def _flatten_whc(x):
        # torch: x.permute(0, 3, 2, 1).reshape(N, -1) from NCHW == flatten
        # in (W, H, C) order; from NHWC that's a (0, 2, 1, 3) transpose
        return x.transpose(0, 2, 1, 3).reshape(x.shape[0], -1)

    class PNet(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = PReLU(10, name="prelu1")(_conv(10, 3, "conv1")(x))
            x = _pool(x, 2, 2)
            x = PReLU(16, name="prelu2")(_conv(16, 3, "conv2")(x))
            x = PReLU(32, name="prelu3")(_conv(32, 3, "conv3")(x))
            probs = jax.nn.softmax(_conv(2, 1, "conv4_1")(x), axis=-1)
            reg = _conv(4, 1, "conv4_2")(x)
            return reg, probs

    class RNet(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = PReLU(28, name="prelu1")(_conv(28, 3, "conv1")(x))
            x = _pool(x, 3, 2)
            x = PReLU(48, name="prelu2")(_conv(48, 3, "conv2")(x))
            x = _pool(x, 3, 2)
            x = PReLU(64, name="prelu3")(_conv(64, 2, "conv3")(x))
            x = PReLU(128, name="prelu4")(
                nn.Dense(128, name="dense4")(_flatten_whc(x)))
            probs = jax.nn.softmax(nn.Dense(2, name="dense5_1")(x), axis=-1)
            reg = nn.Dense(4, name="dense5_2")(x)
            return reg, probs

    class ONet(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = PReLU(32, name="prelu1")(_conv(32, 3, "conv1")(x))
            x = _pool(x, 3, 2)
            x = PReLU(64, name="prelu2")(_conv(64, 3, "conv2")(x))
            x = _pool(x, 3, 2)
            x = PReLU(64, name="prelu3")(_conv(64, 3, "conv3")(x))
            x = _pool(x, 2, 2)
            x = PReLU(128, name="prelu4")(_conv(128, 2, "conv4")(x))
            x = PReLU(256, name="prelu5")(
                nn.Dense(256, name="dense5")(_flatten_whc(x)))
            probs = jax.nn.softmax(nn.Dense(2, name="dense6_1")(x), axis=-1)
            reg = nn.Dense(4, name="dense6_2")(x)
            lmk = nn.Dense(10, name="dense6_3")(x)
            return reg, lmk, probs

    return PNet(), RNet(), ONet()


# --------------------------------------------------------------------------
# pipeline math (host, numpy) — Matlab-MTCNN conventions
# --------------------------------------------------------------------------

def generate_bounding_boxes(reg, probs, scale, thresh,
                            stride=2, cellsize=12):
    """PNet dense map -> candidate boxes in original-image coordinates.
    reg (H, W, 4), probs (H, W) — single image."""
    ys, xs = np.where(probs >= thresh)
    if ys.size == 0:
        return np.zeros((0, 9), np.float32)
    score = probs[ys, xs]
    r = reg[ys, xs]  # (K, 4)
    q1 = np.stack([xs, ys], -1) * stride + 1
    q2 = np.stack([xs, ys], -1) * stride + cellsize
    return np.concatenate([q1 / scale, q2 / scale, score[:, None], r],
                          axis=1).astype(np.float32)


def nms_mtcnn(boxes, scores, thresh, mode="union"):
    """Greedy NMS with MTCNN's 'Union' (IoU) or 'Min' overlap measures."""
    order = np.argsort(scores)[::-1]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        rest = order[1:]
        w = np.maximum(
            np.minimum(x2[i], x2[rest]) - np.maximum(x1[i], x1[rest]) + 1, 0)
        h = np.maximum(
            np.minimum(y2[i], y2[rest]) - np.maximum(y1[i], y1[rest]) + 1, 0)
        inter = w * h
        if mode == "min":
            o = inter / np.minimum(area[i], area[rest])
        else:
            o = inter / (area[i] + area[rest] - inter)
        order = rest[o <= thresh]
    return np.asarray(keep, np.int64)


def bbreg(boxes, reg):
    """Apply the per-stage box regression (+1 width convention)."""
    w = boxes[:, 2] - boxes[:, 0] + 1
    h = boxes[:, 3] - boxes[:, 1] + 1
    out = boxes.copy()
    out[:, 0] += reg[:, 0] * w
    out[:, 1] += reg[:, 1] * h
    out[:, 2] += reg[:, 2] * w
    out[:, 3] += reg[:, 3] * h
    return out


def rerec(boxes):
    """Square every box around its center (long side)."""
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    side = np.maximum(w, h)
    out = boxes.copy()
    out[:, 0] += w * 0.5 - side * 0.5
    out[:, 1] += h * 0.5 - side * 0.5
    out[:, 2] = out[:, 0] + side
    out[:, 3] = out[:, 1] + side
    return out


def _crop_resize(img, boxes, size):
    """Extract (clamped) box crops and resize to (size, size), area mode.

    Boxes are 1-INDEXED inclusive (the Matlab-MTCNN convention
    generate_bounding_boxes emits: q1 = stride*idx + 1); the pixel region
    of box (x1, y1, x2, y2) is img[y1-1:y2, x1-1:x2] — the same rows
    facenet_pytorch crops, so exported pretrained weights see the crops
    they were trained for."""
    import cv2 as cv

    h, w = img.shape[:2]
    crops = np.zeros((len(boxes), size, size, 3), np.float32)
    # facenet_pytorch pad(): trunc (not round), clamp to [1, w/h], then
    # resize the VISIBLE clamped region — a box past the frame edge is
    # stretched from its visible pixels, never embedded in zero padding
    for i, (x1, y1, x2, y2) in enumerate(
            np.trunc(boxes[:, :4]).astype(np.int64)):
        x1, y1 = max(x1, 1), max(y1, 1)
        x2, y2 = min(x2, w), min(y2, h)
        if x2 < x1 or y2 < y1:
            continue  # nothing visible: zero crop (scored, thresholds cull)
        patch = img[y1 - 1:y2, x1 - 1:x2]
        crops[i] = cv.resize(patch.astype(np.float32), (size, size),
                             interpolation=cv.INTER_AREA)
    return crops


def _norm(x):
    return (x - 127.5) * 0.0078125


def _pow2(n):
    return 1 << (n - 1).bit_length()


class MTCNNNativeDetector:
    """The three-stage cascade. Per-stage jitted forwards; crop batches
    pad to powers of two to bound jit specializations."""

    def __init__(self, min_size=MIN_SIZE, thresholds=THRESHOLDS,
                 factor=FACTOR):
        self.min_size, self.thresholds, self.factor = (min_size, thresholds,
                                                       factor)
        self.pnet, self.rnet, self.onet = _build_nets()
        self.params = None  # {"pnet": ..., "rnet": ..., "onet": ...}
        self._jits = {}

    def init(self, rng=None):
        import jax
        import jax.numpy as jnp

        rng = jax.random.PRNGKey(0) if rng is None else rng
        self.params = {
            "pnet": self.pnet.init(rng, jnp.zeros((1, 12, 12, 3))),
            "rnet": self.rnet.init(rng, jnp.zeros((1, 24, 24, 3))),
            "onet": self.onet.init(rng, jnp.zeros((1, 48, 48, 3))),
        }
        return self

    @classmethod
    def load(cls, npz_path: str, **kw):
        from ..utils.weight_import import import_state_dict

        data = np.load(npz_path)
        json.loads(str(data["__meta__"]))  # format check
        det = cls(**kw).init()
        for net in ("pnet", "rnet", "onet"):
            sd = {k[len(net) + 1:]: data[k] for k in data.files
                  if k.startswith(net + ".")}
            det.params[net] = import_state_dict(det.params[net], sd,
                                                strict="cover")
        return det

    def _run(self, net_name, x):
        import jax

        net = getattr(self, net_name)
        key = (net_name, x.shape)
        if key not in self._jits:
            self._jits[key] = jax.jit(net.apply)
        return self._jits[key](self.params[net_name], x)

    def _stage_batch(self, net_name, crops):
        """Pad the crop batch to the next power of two, run, un-pad."""
        n = crops.shape[0]
        m = _pow2(max(n, 1))
        if m != n:
            crops = np.concatenate(
                [crops, np.zeros((m - n,) + crops.shape[1:],
                                 crops.dtype)], 0)
        outs = self._run(net_name, crops)
        return [np.asarray(o)[:n] for o in outs]

    def detect(self, frame_rgb_uint8: np.ndarray):
        """Returns (boxes xyxy float (K, 4), scores (K,)) — the
        facenet_pytorch MTCNN.detect contract (video_coder.py:303-308)."""
        img = frame_rgb_uint8.astype(np.float32)
        h, w = img.shape[:2]
        t1, t2, t3 = self.thresholds

        import cv2 as cv

        # stage 1: PNet over the pyramid
        m = 12.0 / self.min_size
        minl = min(h, w) * m
        scales = []
        while minl >= 12:
            scales.append(m)
            m *= self.factor
            minl *= self.factor
        total = []
        for scale in scales:
            hs, ws = int(np.ceil(h * scale)), int(np.ceil(w * scale))
            im = cv.resize(img, (ws, hs), interpolation=cv.INTER_AREA)
            reg, probs = self._run("pnet", _norm(im)[None])
            boxes = generate_bounding_boxes(
                np.asarray(reg)[0], np.asarray(probs)[0, :, :, 1],
                scale, t1)
            if boxes.shape[0]:
                keep = nms_mtcnn(boxes[:, :4], boxes[:, 4], 0.5)
                total.append(boxes[keep])
        if not total:
            return np.zeros((0, 4), np.float32), np.zeros((0,), np.float32)
        boxes = np.concatenate(total, 0)
        keep = nms_mtcnn(boxes[:, :4], boxes[:, 4], 0.7)
        boxes = boxes[keep]
        # stage-1 regression uses the RAW extent (no +1), unlike bbreg in
        # stages 2/3 — facenet_pytorch detect_face qq1..qq4
        regw = boxes[:, 2] - boxes[:, 0]
        regh = boxes[:, 3] - boxes[:, 1]
        q = boxes[:, :5].copy()
        q[:, 0] += boxes[:, 5] * regw
        q[:, 1] += boxes[:, 6] * regh
        q[:, 2] += boxes[:, 7] * regw
        q[:, 3] += boxes[:, 8] * regh
        boxes = rerec(q)

        # stage 2: RNet on 24x24 crops
        crops = _norm(_crop_resize(img, boxes, 24))
        reg, probs = self._stage_batch("rnet", crops)
        score = probs[:, 1]
        sel = score >= t2
        boxes, reg, score = boxes[sel], reg[sel], score[sel]
        if not boxes.shape[0]:
            return np.zeros((0, 4), np.float32), np.zeros((0,), np.float32)
        keep = nms_mtcnn(boxes[:, :4], score, 0.7)
        boxes, reg, score = boxes[keep], reg[keep], score[keep]
        boxes = rerec(bbreg(np.concatenate(
            [boxes[:, :4], score[:, None]], 1), reg))

        # stage 3: ONet on 48x48 crops
        crops = _norm(_crop_resize(img, boxes, 48))
        reg, _lmk, probs = self._stage_batch("onet", crops)
        score = probs[:, 1]
        sel = score >= t3
        boxes, reg, score = boxes[sel], reg[sel], score[sel]
        if not boxes.shape[0]:
            return np.zeros((0, 4), np.float32), np.zeros((0,), np.float32)
        boxes = bbreg(np.concatenate([boxes[:, :4], score[:, None]], 1),
                      reg)
        keep = nms_mtcnn(boxes[:, :4], score, 0.7, mode="min")
        boxes, score = boxes[keep], score[keep]
        out = boxes[:, :4].copy()
        out[:, [0, 2]] = out[:, [0, 2]].clip(0, w)
        out[:, [1, 3]] = out[:, [1, 3]].clip(0, h)
        return out, score.astype(np.float32)


def build_face_adapter(npz_path: str):
    """vcm_pipeline.build_detector contract: frame -> (boxes, scores)."""
    det = MTCNNNativeDetector.load(npz_path)
    return det.detect
