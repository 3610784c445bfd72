"""Native license-plate OCR: a CRNN-CTC recognizer in Flax, trained
in-repo on synthetic plates — no external OCR package needed.

The reference's plate-text metric path runs PaddleOCR recognition-only on
cropped plates (benchmark_plot.py:17, 232-241: gray crop, 4x cubic
upscale, rec with det=False/cls=False, then `[^A-Z0-9]` filtering). That
puts a whole second framework (paddlepaddle) in the loop for a 36-symbol
recognition task. This module replaces it with a small TPU-native
recognizer:

- `PlateRecognizer`: NHWC conv stack (GroupNorm, so inference is
  stateless) collapsing 32xW gray crops to a W/4-step sequence, two
  BiLSTM layers (lax.scan under the hood via nn.RNN), and a CTC head
  over blank + [0-9A-Z] — the exact post-regex alphabet the reference
  keeps.
- `PlateOCRNative`: host-facing runner. Crops boxes from the frame,
  gray-scales, aspect-resizes to h=32, right-pads into a few static
  width buckets (one jit specialization per bucket, not per plate), and
  greedy-CTC-decodes.
- Weights: `tools/train_plate_ocr.py` trains from scratch on synthetic
  plates (PIL-rendered, augmented) and writes a torch-free .npz; ship
  `pretrained/plate_ocr.npz` and `benchmark_plot.build_ocr` picks this
  backend up automatically.

CTC blank is class 0 (optax.ctc_loss's default), characters are
1..36 in CHARSET order.
"""

from __future__ import annotations

import json

import numpy as np

CHARSET = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"
NUM_CLASSES = len(CHARSET) + 1  # + blank at index 0
IMG_H = 32
WIDTH_BUCKETS = (64, 96, 128, 160)


def encode_text(text: str, max_len: int) -> tuple[np.ndarray, np.ndarray]:
    """Text -> (labels, label_paddings) row for optax.ctc_loss."""
    ids = [CHARSET.index(c) + 1 for c in text]
    labels = np.zeros((max_len,), np.int32)
    pad = np.ones((max_len,), np.float32)
    labels[: len(ids)] = ids
    pad[: len(ids)] = 0.0
    return labels, pad


def ctc_greedy_decode(logits: np.ndarray) -> list[str]:
    """Greedy CTC decode of (B, T, NUM_CLASSES) logits: collapse repeats,
    drop blanks."""
    best = np.asarray(logits).argmax(axis=-1)  # (B, T)
    out = []
    for row in best:
        prev = 0
        chars = []
        for k in row:
            if k != prev and k != 0:
                chars.append(CHARSET[k - 1])
            prev = k
        out.append("".join(chars))
    return out


def _build_model():
    import jax.numpy as jnp
    from flax import linen as nn

    class BiLSTM(nn.Module):
        features: int

        @nn.compact
        def __call__(self, x):  # (B, T, C)
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.features), name="fwd")(x)
            bwd = nn.RNN(nn.OptimizedLSTMCell(self.features), name="bwd")(
                jnp.flip(x, axis=1))
            return jnp.concatenate([fwd, jnp.flip(bwd, axis=1)], axis=-1)

    class PlateRecognizer(nn.Module):
        """(B, 32, W, 1) gray in [-1, 1] -> (B, W/4, NUM_CLASSES) logits."""

        @nn.compact
        def __call__(self, x):
            stages = ((64, (2, 2)), (128, (2, 2)), (192, None),
                      (192, (2, 1)), (192, (2, 1)))
            for i, (feat, pool) in enumerate(stages):
                x = nn.Conv(feat, (3, 3), padding="SAME",
                            name=f"conv{i}")(x)
                x = nn.GroupNorm(num_groups=8, name=f"gn{i}")(x)
                x = nn.relu(x)
                if pool is not None:
                    x = nn.max_pool(x, pool, strides=pool)
            b, h, t, c = x.shape  # h == 2 for IMG_H == 32
            x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b, t, h * c)
            x = BiLSTM(96)(x)
            x = BiLSTM(96)(x)
            return nn.Dense(NUM_CLASSES, name="head")(x)

    return PlateRecognizer()


def _to_gray(rgb: np.ndarray) -> np.ndarray:
    """float [0,1] HxWx3 (or HxW) -> uint8 gray, ITU-R 601 like cv2."""
    a = np.asarray(rgb, np.float32)
    if a.ndim == 3:
        a = a @ np.array([0.299, 0.587, 0.114], np.float32)
    return np.rint(a * 255.0).clip(0, 255).astype(np.uint8)


def _resize_gray(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """uint8 gray resize; cv2 cubic when present (the reference's choice,
    benchmark_plot.py:237), PIL bicubic otherwise."""
    try:
        import cv2

        return cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
    except ImportError:
        from PIL import Image

        return np.asarray(
            Image.fromarray(img).resize((w, h), Image.BICUBIC))


def preprocess_crop(gray: np.ndarray) -> np.ndarray:
    """uint8 gray crop -> (32, bucket_w, 1) f32 in [-1, 1], aspect
    preserved, right-padded with 0 (mid-gray) into the width bucket."""
    h, w = gray.shape[:2]
    new_w = max(8, int(round(w * (IMG_H / max(h, 1)))))
    new_w = min(new_w, WIDTH_BUCKETS[-1])
    img = _resize_gray(gray, IMG_H, new_w).astype(np.float32) / 127.5 - 1.0
    bucket = next(b for b in WIDTH_BUCKETS if b >= new_w)
    out = np.zeros((IMG_H, bucket, 1), np.float32)
    out[:, :new_w, 0] = img
    return out


class PlateOCRNative:
    """Recognize plate text in frame crops with the native CRNN.

    Call contract matches benchmark_plot.build_ocr's runner: float [0,1]
    RGB frame + (N, 4) xyxy boxes -> list of A-Z0-9 strings.
    """

    def __init__(self, params):
        import jax

        self.model = _build_model()
        self.params = params
        self._jit = jax.jit(self.model.apply)

    @classmethod
    def load(cls, npz_path: str) -> "PlateOCRNative":
        data = np.load(npz_path)
        meta = json.loads(str(data["__meta__"]))
        if meta.get("charset", CHARSET) != CHARSET:
            raise ValueError(f"{npz_path}: charset mismatch")
        tree: dict = {}
        for key in data.files:
            if key == "__meta__":
                continue
            node = tree
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = np.asarray(data[key])
        return cls({"params": tree})

    def save(self, npz_path: str) -> None:
        flat = {}

        def walk(node, prefix):
            for k, v in node.items():
                path = f"{prefix}/{k}" if prefix else k
                if isinstance(v, dict):
                    walk(v, path)
                else:
                    flat[path] = np.asarray(v)

        walk(self.params["params"], "")
        flat["__meta__"] = np.asarray(json.dumps({"charset": CHARSET}))
        np.savez(npz_path, **flat)

    def recognize_crops(self, crops: list[np.ndarray]) -> list[str]:
        """uint8 gray crops -> decoded strings.

        Batches are zero-padded to the next power of two so the jit
        specializes per (pow2-batch, width-bucket), not per exact crop
        count — same static-shape discipline as rcnn/mtcnn_native."""
        if not crops:
            return []
        pre = [preprocess_crop(c) for c in crops]
        out = [""] * len(crops)
        by_w: dict[int, list[int]] = {}
        for i, p in enumerate(pre):
            by_w.setdefault(p.shape[1], []).append(i)
        for w, idxs in by_w.items():
            n = len(idxs)
            m = 1 << (n - 1).bit_length()
            batch = np.zeros((m,) + pre[idxs[0]].shape, np.float32)
            for j, i in enumerate(idxs):
                batch[j] = pre[i]
            logits = np.asarray(self._jit(self.params, batch))[:n]
            for i, text in zip(idxs, ctc_greedy_decode(logits)):
                out[i] = text
        return out

    def __call__(self, rgb: np.ndarray, boxes) -> list[str]:
        rgb = np.asarray(rgb)
        h, w = rgb.shape[:2]
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        out = [""] * len(boxes)
        crops, idxs = [], []
        for i, (x1, y1, x2, y2) in enumerate(boxes):
            x1, y1 = max(int(x1), 0), max(int(y1), 0)
            x2, y2 = min(int(np.ceil(x2)), w), min(int(np.ceil(y2)), h)
            if x2 <= x1 + 1 or y2 <= y1 + 1:
                continue  # degenerate box: no pixels to read
            crops.append(_to_gray(rgb[y1:y2, x1:x2]))
            idxs.append(i)
        for i, text in zip(idxs, self.recognize_crops(crops)):
            out[i] = text
        return out

    @classmethod
    def init_random(cls, seed: int = 0) -> "PlateOCRNative":
        import jax

        model = _build_model()
        x0 = np.zeros((1, IMG_H, WIDTH_BUCKETS[0], 1), np.float32)
        params = model.init(jax.random.PRNGKey(seed), x0)
        return cls(params)
