"""Train the native license-plate detector from scratch on synthetic
traffic-like composites.

The reference's plate path depends on a pretrained ultralytics YOLOv8-LP
checkpoint (/root/reference/video_coder.py:261-306). Like the plate-OCR
precedent (tools/train_plate_ocr.py), the task reduces to single-class
detection of rendered text plates — small enough to train from scratch
in-repo on the one TPU chip, so the VCM pipeline runs with LEARNED
detection and zero external model zoos.

Architecture: the repo's own YOLOv8 graph (eval/yolo_native.py backbone +
v8 Detect head with DFL box decode) at nano scale (width 0.25, depth
0.34), nc=1. Training uses FCOS-style static center-sampling assignment
(the v8 TAL dynamic assigner is unnecessary at this domain's difficulty)
with the v8 loss family: BCE cls + DFL + IoU on assigned cells. The
export .npz is the same format tools/export_yolo_detector.py emits, so
YOLOv8NativeDetector.load / vcm_pipeline.build_detector pick it up
unchanged at pretrained/yolov8-lp.npz.

    python tools/train_plate_detector.py --steps 1500 \
        --out pretrained/yolov8-lp.npz
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.train_plate_ocr import random_text, render_plate  # noqa: E402

IMGSZ = 320
STRIDES = (8, 16, 32)
REG_MAX = 16
NANO = dict(width=0.25, depth=0.34, max_channels=1024)


# --------------------------------------------------------------------------
# scene composition
# --------------------------------------------------------------------------

def _background(rng: np.random.Generator, size: int) -> np.ndarray:
    """Procedural traffic-like scene: sky/road gradient + building/car
    rectangles + lane lines + sensor noise."""
    import cv2 as cv

    top = rng.integers(60, 200, 3)
    bot = rng.integers(30, 140, 3)
    t = np.linspace(0, 1, size)[:, None, None]
    img = (top[None, None] * (1 - t) + bot[None, None] * t).astype(np.float32)
    img = np.broadcast_to(img, (size, size, 3)).copy()
    for _ in range(int(rng.integers(3, 10))):  # blocks: buildings/cars
        x1, y1 = rng.integers(0, size - 20, 2)
        w, h = rng.integers(15, size // 2, 2)
        color = rng.integers(20, 230, 3).astype(np.float32)
        cv.rectangle(img, (int(x1), int(y1)),
                     (int(x1 + w), int(y1 + h)), color.tolist(), -1)
    for _ in range(int(rng.integers(2, 6))):  # lane/edge lines
        p1 = tuple(int(v) for v in rng.integers(0, size, 2))
        p2 = tuple(int(v) for v in rng.integers(0, size, 2))
        c = float(rng.integers(0, 255))
        cv.line(img, p1, p2, (c, c, c), int(rng.integers(1, 4)))
    img += rng.normal(0, rng.uniform(2, 10), img.shape)
    return img.clip(0, 255)


def _distractor(rng: np.random.Generator) -> np.ndarray:
    """Plate-shaped rectangle WITHOUT text: forces the model to key on
    text-ness, not on 'bright rectangle'."""
    w = int(rng.integers(30, 140))
    h = int(rng.integers(10, w // 2 + 11))
    bg = float(rng.integers(120, 255))
    img = np.full((h, w, 3), bg, np.float32)
    img += rng.normal(0, rng.uniform(0, 8), img.shape)
    if rng.random() < 0.5:  # border like a real plate
        img[:2] = img[-2:] = img[:, :2] = img[:, -2:] = rng.integers(0, 90)
    return img.clip(0, 255)


def compose_scene(rng: np.random.Generator, size: int = IMGSZ):
    """Returns (image float32 (size,size,3) in [0,255], boxes (K,4) xyxy)."""
    import cv2 as cv

    img = _background(rng, size)
    for _ in range(int(rng.integers(1, 4))):
        d = _distractor(rng)
        _paste(img, d, rng)
    boxes = []
    n_plates = int(rng.choice([0, 1, 1, 2, 2, 3]))
    for _ in range(n_plates):
        plate = render_plate(random_text(rng), rng).astype(np.float32)
        plate = np.repeat(plate[:, :, None], 3, axis=2)
        if rng.random() < 0.5:  # slight tint (eu-style blue strip absent)
            plate *= rng.uniform(0.85, 1.0, 3)
        # scale to a detectable on-canvas width
        tw = float(rng.uniform(36, 170))
        s = tw / plate.shape[1]
        nh = max(8, int(round(plate.shape[0] * s)))
        plate = cv.resize(plate, (int(tw), nh),
                          interpolation=cv.INTER_AREA)
        box = _paste(img, plate, rng, avoid=boxes)
        if box is not None:
            boxes.append(box)
    return img.clip(0, 255), np.asarray(boxes, np.float32).reshape(-1, 4)


def _paste(img, patch, rng, avoid=()):
    size = img.shape[0]
    ph, pw = patch.shape[:2]
    if ph >= size or pw >= size:
        return None
    for _ in range(10):
        x = int(rng.integers(0, size - pw))
        y = int(rng.integers(0, size - ph))
        box = (x, y, x + pw, y + ph)
        if all(_iou(box, b) < 0.1 for b in avoid):
            img[y:y + ph, x:x + pw] = patch
            return box
    return None


def _iou(a, b):
    ix = max(0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = ((a[2] - a[0]) * (a[3] - a[1])
          + (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return inter / max(ua, 1e-9)


# --------------------------------------------------------------------------
# target assignment (host, FCOS-style center sampling)
# --------------------------------------------------------------------------

def build_targets(boxes: np.ndarray, size: int = IMGSZ,
                  strides=STRIDES, reg_max: int = REG_MAX,
                  center_radius: float = 1.5):
    """Dense per-scale targets for one image.

    Returns per scale: cls (H,W), ltrb (H,W,4) in feature units, mask
    (H,W). A cell is positive for a gt when its center lies inside the gt
    box, within center_radius cells of the gt center, and all four ltrb
    distances fit the DFL support [0, reg_max-1]. Smallest-area gt wins
    contested cells.
    """
    out = []
    for s in strides:
        g = size // s
        cls = np.zeros((g, g), np.float32)
        ltrb = np.zeros((g, g, 4), np.float32)
        mask = np.zeros((g, g), np.float32)
        best_area = np.full((g, g), np.inf, np.float32)
        cx = (np.arange(g) + 0.5) * s
        cy = (np.arange(g) + 0.5) * s
        CX, CY = np.meshgrid(cx, cy)
        for (x1, y1, x2, y2) in boxes:
            l = (CX - x1) / s
            t = (CY - y1) / s
            r = (x2 - CX) / s
            b = (y2 - CY) / s
            inside = (l > 0) & (t > 0) & (r > 0) & (b > 0)
            fits = np.maximum(np.maximum(l, r), np.maximum(t, b)) \
                <= reg_max - 1
            gcx, gcy = (x1 + x2) / 2, (y1 + y2) / 2
            near = (np.abs(CX - gcx) <= center_radius * s) & \
                   (np.abs(CY - gcy) <= center_radius * s)
            area = (x2 - x1) * (y2 - y1)
            sel = inside & fits & near & (area < best_area)
            best_area[sel] = area
            cls[sel] = 1.0
            mask[sel] = 1.0
            for i, v in enumerate((l, t, r, b)):
                ltrb[..., i][sel] = v[sel]
        out.append((cls, ltrb.clip(0, reg_max - 1 - 1e-3), mask))
    return out


def make_batch(batch: int, rng: np.random.Generator, size: int = IMGSZ):
    imgs = np.zeros((batch, size, size, 3), np.float32)
    targets = None
    gt_boxes = []
    for i in range(batch):
        img, boxes = compose_scene(rng, size)
        imgs[i] = img / 255.0
        gt_boxes.append(boxes)
        t = build_targets(boxes, size)
        if targets is None:
            targets = [[np.zeros((batch,) + a.shape, np.float32)
                        for a in scale] for scale in t]
        for si, scale in enumerate(t):
            for ai, a in enumerate(scale):
                targets[si][ai][i] = a
    return imgs, targets, gt_boxes


# --------------------------------------------------------------------------
# loss + train step
# --------------------------------------------------------------------------

def make_model():
    from vcm_ts_tpu.eval.yolo_native import YOLOv8NativeDetector

    return YOLOv8NativeDetector(nc=1, reg_max=REG_MAX, imgsz=IMGSZ, **NANO)


def make_step(det, tx):
    import jax
    import jax.numpy as jnp
    import optax

    bins = jnp.arange(REG_MAX, dtype=jnp.float32)

    def loss_fn(params, imgs, targets):
        bb, hp = params
        taps = det.backbone.apply(bb, imgs)
        outs = det.head.apply(
            hp, [taps["3_deep"], taps["4_deep"], taps["5_deep"]])
        total_cls = 0.0
        total_dfl = 0.0
        total_iou = 0.0
        num_pos = 1e-3
        for (box_lg, cls_lg), (cls_t, ltrb_t, mask) in zip(outs, targets):
            n, h, w, _ = box_lg.shape
            cls_lg = cls_lg[..., 0]
            total_cls = total_cls + jnp.sum(
                optax.sigmoid_binary_cross_entropy(cls_lg, cls_t))
            num_pos = num_pos + jnp.sum(mask)
            # DFL: CE to the two adjacent integer bins of each distance
            lg = box_lg.reshape(n, h, w, 4, REG_MAX)
            logp = jax.nn.log_softmax(lg, axis=-1)
            tl = jnp.floor(ltrb_t)
            wr = ltrb_t - tl
            tl_i = tl.astype(jnp.int32)
            tr_i = jnp.minimum(tl_i + 1, REG_MAX - 1)
            lp_l = jnp.take_along_axis(logp, tl_i[..., None], -1)[..., 0]
            lp_r = jnp.take_along_axis(logp, tr_i[..., None], -1)[..., 0]
            dfl = -((1 - wr) * lp_l + wr * lp_r)
            total_dfl = total_dfl + jnp.sum(
                dfl.sum(-1) * mask)
            # IoU on decoded ltrb (same cell center => closed-form overlap)
            d = jax.nn.softmax(lg, axis=-1) @ bins
            iw = jnp.minimum(d[..., 0], ltrb_t[..., 0]) + \
                jnp.minimum(d[..., 2], ltrb_t[..., 2])
            ih = jnp.minimum(d[..., 1], ltrb_t[..., 1]) + \
                jnp.minimum(d[..., 3], ltrb_t[..., 3])
            inter = jnp.maximum(iw, 0) * jnp.maximum(ih, 0)
            a_p = (d[..., 0] + d[..., 2]) * (d[..., 1] + d[..., 3])
            a_t = (ltrb_t[..., 0] + ltrb_t[..., 2]) * \
                (ltrb_t[..., 1] + ltrb_t[..., 3])
            iou = inter / jnp.maximum(a_p + a_t - inter, 1e-9)
            total_iou = total_iou + jnp.sum((1 - iou) * mask)
        # v8 gain ratios: box 7.5, cls 0.5, dfl 1.5 (relative emphasis)
        return (0.5 * total_cls + 1.5 * total_dfl
                + 7.5 * total_iou) / num_pos

    @jax.jit
    def step(params, opt_state, imgs, targets):
        loss, grads = jax.value_and_grad(loss_fn)(params, imgs, targets)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax as _o
        return _o.apply_updates(params, updates), opt_state, loss

    return step


# --------------------------------------------------------------------------
# evaluation
# --------------------------------------------------------------------------

def evaluate(det, rng: np.random.Generator, n_scenes: int = 48,
             conf: float = 0.25, iou_thr: float = 0.5):
    """Precision/recall at IoU 0.5 over held-out composites."""
    tp = fp = fn = 0
    for _ in range(n_scenes):
        img, gts = compose_scene(rng)
        boxes, scores, _ = det.detect(img.astype(np.uint8), conf=conf)
        used = np.zeros(len(gts), bool)
        for b in boxes:
            ious = [_iou(b, g) if not used[i] else 0.0
                    for i, g in enumerate(gts)]
            if ious and max(ious) >= iou_thr:
                used[int(np.argmax(ious))] = True
                tp += 1
            else:
                fp += 1
        fn += int((~used).sum())
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    return prec, rec


# --------------------------------------------------------------------------
# export
# --------------------------------------------------------------------------

def export_npz(det, out: str):
    """Same key/meta format as tools/export_yolo_detector.py, so
    YOLOv8NativeDetector.load is the single load path."""
    from vcm_ts_tpu.utils.weight_export import flax_to_torch_state_dict

    sd = {}
    for k, v in flax_to_torch_state_dict(det.bb_params).items():
        sd[f"model.{k}"] = v
    for k, v in flax_to_torch_state_dict(det.head_params).items():
        sd[f"model.22.{k}"] = v
    meta = dict(nc=1, reg_max=REG_MAX, imgsz=IMGSZ, names=["plate"],
                trained="in-repo tools/train_plate_detector.py", **NANO)
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    np.savez(out, __meta__=json.dumps(meta), **sd)


def train(steps: int, batch: int, lr: float, seed: int, out: str,
          log_every: int = 50):
    import jax
    import optax

    rng = np.random.default_rng(seed)
    det = make_model().init(jax.random.PRNGKey(seed))
    params = (det.bb_params, det.head_params)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=min(100, steps // 10 + 1),
        decay_steps=steps, end_value=lr * 0.05)
    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.adamw(sched, weight_decay=5e-4))
    opt_state = tx.init(params)
    step = make_step(det, tx)

    t0 = time.time()
    for it in range(1, steps + 1):
        imgs, targets, _ = make_batch(batch, rng)
        params, opt_state, loss = step(params, opt_state, imgs, targets)
        if it % log_every == 0 or it == steps:
            print(f"step {it}/{steps} loss {float(loss):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    det.bb_params, det.head_params = params
    det._jit_fwd = None
    prec, rec = evaluate(det, np.random.default_rng(seed + 1))
    print(f"held-out precision {prec:.3f} recall {rec:.3f}", flush=True)
    export_npz(det, out)
    print(f"saved {out}")
    return prec, rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=os.path.join("pretrained",
                                                  "yolov8-lp.npz"))
    a = ap.parse_args()
    train(a.steps, a.batch, a.lr, a.seed, a.out)


if __name__ == "__main__":
    main()
