"""Domain-shift gate for the shipped plate OCR (VERDICT r4 next-step 8).

pretrained/plate_ocr.npz reports 1.000 exact-match on held-out SYNTHETIC
plates rendered with the same PIL default font the trainer used
(tools/train_plate_ocr.py render_plate). This gate evaluates the same
weights on plates the model never saw the likes of:

- HELD-OUT FONTS: the three DejaVu faces the trainer never draws
  (train_plate_ocr.py HELDOUT_FONTS) — different glyph shapes, stroke
  widths and serifs than the training pool;
- PERSPECTIVE: random 4-corner homography jitter (plates photographed
  off-axis);
- PHOTOMETRICS: gaussian/motion blur, JPEG round-trip artifacts,
  contrast/brightness swings, additive noise.

Reports exact-match (full-plate) and symbol accuracy (1 - CER,
eval/text_metrics.py) per condition, and a combined worst-case row.
PaddleOCR context (reference benchmark_plot.py:795): the reference's
recognizer is a general scene-text model; this gate is the equivalent
robustness evidence for the in-repo recognizer.

    python tools/ocr_domain_gate.py [--n 64] [--npz pretrained/plate_ocr.npz]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from glob import glob

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.train_plate_ocr import (HELDOUT_FONTS, distort_perspective,
                                   distort_photometric, random_text)  # noqa: E402

def held_out_fonts():
    """The DejaVu faces the trainer NEVER draws (train_plate_ocr.py
    TRAIN_FONTS/HELDOUT_FONTS split)."""
    return [f for f in HELDOUT_FONTS if os.path.exists(f)]


def render_plate_font(text: str, rng: np.random.Generator,
                      font_path: str | None) -> np.ndarray:
    """Like train_plate_ocr.render_plate but with an explicit truetype
    font (held-out glyph shapes) and NO training-matched augmentation."""
    from PIL import Image, ImageDraw, ImageFont

    size = int(rng.integers(22, 34))
    if font_path:
        font = ImageFont.truetype(font_path, size=size)
    else:
        try:
            font = ImageFont.load_default(size=size)
        except TypeError:
            font = ImageFont.load_default()
    x0, y0, x1, y1 = font.getbbox(text)
    tw, th = x1 - x0, y1 - y0
    mx, my = int(rng.integers(4, 10)), int(rng.integers(3, 7))
    bg = int(rng.integers(170, 256))
    fg = int(rng.integers(0, 70))
    img = Image.new("L", (tw + 2 * mx, th + 2 * my), bg)
    ImageDraw.Draw(img).text((mx - x0, my - y0), text, fill=fg, font=font)
    return np.asarray(img, np.float32).clip(0, 255).astype(np.uint8)


def evaluate(npz: str, n: int, seed: int = 0) -> dict:
    from vcm_ts_tpu.eval.ocr_native import PlateOCRNative
    from vcm_ts_tpu.eval.text_metrics import cer

    ocr = PlateOCRNative.load(npz)
    fonts = held_out_fonts()
    conditions = {
        "train-font-clean": lambda t, r: render_plate_font(t, r, None),
        "heldout-fonts": lambda t, r: render_plate_font(
            t, r, fonts[int(r.integers(len(fonts)))]),
        "perspective": lambda t, r: distort_perspective(
            render_plate_font(t, r, fonts[int(r.integers(len(fonts)))]), r),
        "photometric": lambda t, r: distort_photometric(
            render_plate_font(t, r, fonts[int(r.integers(len(fonts)))]), r),
        "perspective+photometric": lambda t, r: distort_photometric(
            distort_perspective(render_plate_font(
                t, r, fonts[int(r.integers(len(fonts)))]), r), r),
    }
    report = {"npz": npz, "n_per_condition": n, "fonts": len(fonts)}
    for cond, make in conditions.items():
        rng = np.random.default_rng(seed)
        texts, crops = [], []
        for _ in range(n):
            t = random_text(rng)
            texts.append(t)
            crops.append(make(t, rng))  # raw uint8 gray (recognize_crops
            # preprocesses internally)
        preds = ocr.recognize_crops(crops)
        exact = float(np.mean([p == t for p, t in zip(preds, texts)]))
        sym = float(np.mean([1.0 - min(cer(t, p), 1.0)
                             for p, t in zip(preds, texts)]))
        report[cond] = {"exact": round(exact, 4),
                        "symbol_acc": round(sym, 4),
                        "example": f"{texts[0]!r} -> {preds[0]!r}"}
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", default=os.path.join("pretrained",
                                                  "plate_ocr.npz"))
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    print(json.dumps(evaluate(a.npz, a.n, a.seed), indent=2))


if __name__ == "__main__":
    main()
