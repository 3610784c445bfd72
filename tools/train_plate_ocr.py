"""Train the native plate-OCR recognizer on synthetic plates.

The reference's plate-text path depends on a pretrained PaddleOCR English
model (benchmark_plot.py:17); plates post-filter to [A-Z0-9] only
(benchmark_plot.py:240), so the task is 36-symbol sequence recognition —
small enough to train from scratch in-repo. This tool renders synthetic
plates (PIL text + geometric/photometric augmentation), trains
eval/ocr_native.py's CRNN with CTC (optax.ctc_loss), and writes the
torch-free .npz that benchmark_plot.build_ocr auto-detects at
pretrained/plate_ocr.npz.

    python tools/train_plate_ocr.py --steps 3000 --out pretrained/plate_ocr.npz

Runs on TPU when the tunnel is up, CPU otherwise (JAX_PLATFORMS=cpu).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vcm_ts_tpu.eval.ocr_native import (CHARSET, IMG_H, WIDTH_BUCKETS,
                                        PlateOCRNative, ctc_greedy_decode,
                                        encode_text)

MAX_LEN = 9
# common plate shapes: L=letter, D=digit, plus fully random strings so the
# model never keys on a fixed grammar
FORMATS = ("LDDDLL", "LDDDLLDD", "DDDLLL", "LLDDDDL", "LLLDDDD", "DDDDLL",
           "RRRRR", "RRRRRR", "RRRRRRR", "RRRRRRRR")


def random_text(rng: np.random.Generator) -> str:
    fmt = FORMATS[rng.integers(len(FORMATS))]
    out = []
    for ch in fmt:
        if ch == "L":
            out.append(CHARSET[10 + rng.integers(26)])
        elif ch == "D":
            out.append(CHARSET[rng.integers(10)])
        else:
            out.append(CHARSET[rng.integers(len(CHARSET))])
    return "".join(out)


# Training font pool (round 5): the PIL default plus three DejaVu faces.
# The remaining three DejaVu faces (Sans-Bold, Serif regular, Mono-Bold)
# are NEVER trained on — tools/ocr_domain_gate.py evaluates on them as
# the held-out-font condition.
TRAIN_FONTS = (
    None,  # PIL default
    "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSerif-Bold.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf",
)
HELDOUT_FONTS = (
    "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSansMono-Bold.ttf",
)


def distort_perspective(img: np.ndarray, rng: np.random.Generator,
                        strength: float = 0.12) -> np.ndarray:
    """Random 4-corner homography jitter (plates shot off-axis)."""
    import cv2 as cv

    h, w = img.shape[:2]
    jx, jy = strength * w, strength * h
    src = np.float32([[0, 0], [w, 0], [w, h], [0, h]])
    dst = (src + rng.uniform(-1, 1, (4, 2)) * np.array([jx, jy])
           ).astype(np.float32)
    M = cv.getPerspectiveTransform(src, dst)
    return cv.warpPerspective(img, M, (w, h), borderMode=cv.BORDER_REPLICATE)


def distort_photometric(img: np.ndarray, rng: np.random.Generator
                        ) -> np.ndarray:
    """Blur (gaussian/motion) + contrast/brightness + noise + JPEG
    round-trip — the capture-chain artifacts real plate crops carry."""
    import cv2 as cv

    out = img.astype(np.float32)
    k = int(rng.choice([3, 5]))
    if rng.random() < 0.5:
        out = cv.GaussianBlur(out, (k, k), 0)
    else:
        kern = np.zeros((k, k), np.float32)
        kern[k // 2] = 1.0 / k
        out = cv.filter2D(out, -1, kern)
    out = out * float(rng.uniform(0.6, 1.2)) + float(rng.uniform(-30, 30))
    out += rng.normal(0, float(rng.uniform(4, 14)), out.shape)
    out = out.clip(0, 255).astype(np.uint8)
    ok, enc = cv.imencode(".jpg", out,
                          [cv.IMWRITE_JPEG_QUALITY,
                           int(rng.integers(35, 80))])
    if ok:
        out = cv.imdecode(enc, cv.IMREAD_GRAYSCALE)
    return out


def render_plate(text: str, rng: np.random.Generator,
                 augment: bool = True) -> np.ndarray:
    """Render one synthetic gray plate crop (uint8, random size/quality).

    augment=True (the round-5 default) draws a random TRAIN_FONTS face
    and applies perspective/photometric distortion with probability 0.5
    each — the domain-shift gate (tools/ocr_domain_gate.py) showed the
    font+geometry-naive round-4 model collapsing under exactly these
    shifts (perspective exact-match 0.08), so they are now part of the
    training distribution."""
    import os as _os

    from PIL import Image, ImageDraw, ImageFont

    size = int(rng.integers(22, 34))
    font_path = None
    if augment:
        cand = TRAIN_FONTS[int(rng.integers(len(TRAIN_FONTS)))]
        if cand is not None and _os.path.exists(cand):
            font_path = cand
    if font_path:
        font = ImageFont.truetype(font_path, size=size)
    else:
        try:
            font = ImageFont.load_default(size=size)
        except TypeError:  # older PIL: fixed-size bitmap font
            font = ImageFont.load_default()
    x0, y0, x1, y1 = font.getbbox(text)
    tw, th = x1 - x0, y1 - y0
    mx, my = int(rng.integers(3, 12)), int(rng.integers(2, 8))
    bg = int(rng.integers(150, 256))
    fg = int(rng.integers(0, 90))
    img = Image.new("L", (tw + 2 * mx, th + 2 * my), bg)
    ImageDraw.Draw(img).text((mx - x0, my - y0), text, fill=fg, font=font)
    if rng.random() < 0.7:
        img = img.rotate(float(rng.uniform(-4, 4)), expand=True,
                         fillcolor=bg, resample=Image.BILINEAR)
    # random plate-crop scale (detector crops arrive at many sizes)
    scale = float(rng.uniform(0.5, 1.6))
    w, h = img.size
    img = img.resize((max(12, int(w * scale)), max(10, int(h * scale))),
                     Image.BILINEAR)
    a = np.asarray(img, np.float32)
    a = a * float(rng.uniform(0.75, 1.1)) + float(rng.uniform(-20, 20))
    a += rng.normal(0.0, float(rng.uniform(0, 12)), a.shape)
    a = a.clip(0, 255).astype(np.uint8)
    if augment:
        if rng.random() < 0.5:
            a = distort_perspective(a, rng,
                                    strength=float(rng.uniform(0.04, 0.14)))
        if rng.random() < 0.5:
            a = distort_photometric(a, rng)
    return a


def make_batch(batch: int, rng: np.random.Generator, width: int,
               texts: list[str] | None = None):
    """Synthesize a training batch at one static width bucket."""
    from vcm_ts_tpu.eval.ocr_native import preprocess_crop

    images = np.zeros((batch, IMG_H, width, 1), np.float32)
    labels = np.zeros((batch, MAX_LEN), np.int32)
    label_pad = np.ones((batch, MAX_LEN), np.float32)
    out_texts = []
    for i in range(batch):
        text = texts[i] if texts is not None else random_text(rng)
        out_texts.append(text)
        crop = preprocess_crop(render_plate(text, rng))
        images[i, :, : crop.shape[1]] = crop[:, :width]
        labels[i], label_pad[i] = encode_text(text, MAX_LEN)
    return images, labels, label_pad, out_texts


def train(steps: int, batch: int, lr: float, seed: int, out: str,
          log_every: int = 50):
    import jax
    import jax.numpy as jnp
    import optax

    rng = np.random.default_rng(seed)
    ocr = PlateOCRNative.init_random(seed)
    width = WIDTH_BUCKETS[-1]

    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(lr, weight_decay=1e-4))
    opt_state = tx.init(ocr.params)

    def loss_fn(params, images, labels, label_pad):
        logits = ocr.model.apply(params, images)
        logit_pad = jnp.zeros(logits.shape[:2], logits.dtype)
        return optax.ctc_loss(logits, logit_pad, labels, label_pad).mean()

    @jax.jit
    def step(params, opt_state, images, labels, label_pad):
        loss, grads = jax.value_and_grad(loss_fn)(params, images, labels,
                                                  label_pad)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    for it in range(1, steps + 1):
        images, labels, label_pad, _ = make_batch(batch, rng, width)
        ocr.params, opt_state, loss = step(ocr.params, opt_state, images,
                                           labels, label_pad)
        if it % log_every == 0 or it == steps:
            print(f"step {it}/{steps} loss {float(loss):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    # held-out exact/char accuracy
    images, _, _, texts = make_batch(min(128, 4 * batch), rng, width)
    pred = ctc_greedy_decode(np.asarray(ocr.model.apply(ocr.params, images)))
    exact = float(np.mean([p == t for p, t in zip(pred, texts)]))
    print(f"held-out exact match: {exact:.3f}  (e.g. {texts[0]!r} -> "
          f"{pred[0]!r})", flush=True)

    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    ocr.save(out)
    print(f"saved {out}")
    return exact


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=os.path.join("pretrained",
                                                  "plate_ocr.npz"))
    a = ap.parse_args()
    train(a.steps, a.batch, a.lr, a.seed, a.out)


if __name__ == "__main__":
    main()
