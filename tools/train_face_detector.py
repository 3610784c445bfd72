"""Train the native MTCNN face-detector cascade from scratch on synthetic
face composites.

The reference's face path depends on facenet_pytorch's pretrained MTCNN
(/root/reference/video_coder.py:296-310). Like the plate-OCR/-detector
precedents, the cascade (P/R/O-Net, ~600K params total) is small enough
to train from scratch in-repo, so the VCM pipeline's face branch runs
with LEARNED detection and zero external model zoos.

Faces are procedurally rendered (ellipse head + eyes/brows/nose/mouth +
hair cap, random pose/scale/photometrics) and pasted into the same
traffic-like scenes the plate trainer uses; distractors are featureless
skin-tone blobs so the nets must key on facial structure. Each net trains
on IoU-stratified square crops at its input size (12/24/48) with the
classic MTCNN objectives: 2-class softmax CE on pos/neg, L2 box
regression on pos+part (reg target = (gt - crop)/crop_side, the
convention eval/mtcnn_native.bbreg applies at inference).

The export .npz matches tools/export_mtcnn.py's key format
("pnet.conv1.weight", ...), so MTCNNNativeDetector.load /
vcm_pipeline.build_detector pick it up unchanged at pretrained/mtcnn.npz.

    python tools/train_face_detector.py --steps 1200 \
        --out pretrained/mtcnn.npz
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.train_plate_detector import _background, _iou  # noqa: E402

CROP_SIZES = {"pnet": 12, "rnet": 24, "onet": 48}


# --------------------------------------------------------------------------
# synthetic faces
# --------------------------------------------------------------------------

def render_face(rng: np.random.Generator, size: int) -> np.ndarray:
    """One procedural face patch (size, size, 4): RGB + alpha mask."""
    import cv2 as cv

    s = size
    img = np.zeros((s, s, 3), np.float32)
    alpha = np.zeros((s, s), np.float32)
    skin = np.array([rng.uniform(150, 240), rng.uniform(110, 190),
                     rng.uniform(90, 170)], np.float32)
    cx, cy = s // 2, s // 2
    ax, ay = int(s * rng.uniform(0.32, 0.42)), int(s * rng.uniform(0.42, 0.5))
    cv.ellipse(img, (cx, cy), (ax, ay), 0, 0, 360, skin.tolist(), -1)
    cv.ellipse(alpha, (cx, cy), (ax, ay), 0, 0, 360, 1.0, -1)
    # hair cap
    hair = rng.uniform(10, 90, 3)
    cv.ellipse(img, (cx, cy - int(ay * 0.55)), (ax, int(ay * 0.55)),
               0, 180, 360, hair.tolist(), -1)
    # eyes
    ey = cy - int(ay * rng.uniform(0.1, 0.25))
    ex = int(ax * rng.uniform(0.35, 0.55))
    er = max(1, int(s * rng.uniform(0.04, 0.07)))
    for sx in (-1, 1):
        cv.circle(img, (cx + sx * ex, ey), er + 1, (250, 250, 250), -1)
        cv.circle(img, (cx + sx * ex, ey),
                  max(1, int(er * 0.6)), (20, 20, 40), -1)
        # brow
        cv.line(img, (cx + sx * ex - er, ey - 2 * er),
                (cx + sx * ex + er, ey - 2 * er - int(sx * rng.integers(0, 3))),
                hair.tolist(), max(1, s // 40))
    # nose + mouth
    cv.line(img, (cx, ey + er), (cx - er // 2, cy + int(ay * 0.15)),
            (skin * 0.75).tolist(), max(1, s // 48))
    mw = int(ax * rng.uniform(0.4, 0.7))
    my = cy + int(ay * rng.uniform(0.4, 0.55))
    cv.ellipse(img, (cx, my), (mw, max(1, int(er * rng.uniform(0.6, 1.4)))),
               0, 0, 180, (120, 40, 50), -1)
    # pose/photometrics
    ang = float(rng.uniform(-18, 18))
    M = cv.getRotationMatrix2D((cx, cy), ang, 1.0)
    img = cv.warpAffine(img, M, (s, s))
    alpha = cv.warpAffine(alpha, M, (s, s))
    img = img * rng.uniform(0.7, 1.15) + rng.normal(0, 6, img.shape)
    return np.dstack([img.clip(0, 255), alpha])


def compose_scene(rng: np.random.Generator, size: int = 320):
    """(image float32 [0,255], face boxes (K,4) xyxy)."""
    import cv2 as cv

    img = _background(rng, size)
    # distractors: featureless skin-tone blobs
    for _ in range(int(rng.integers(1, 4))):
        bs = int(rng.integers(20, 90))
        rgb = np.zeros((bs, bs, 3), np.float32)
        a = np.zeros((bs, bs), np.float32)
        skin = (float(rng.uniform(150, 240)), float(rng.uniform(110, 190)),
                float(rng.uniform(90, 170)))
        axes = (int(bs * 0.4), int(bs * 0.48))
        cv.ellipse(rgb, (bs // 2, bs // 2), axes, 0, 0, 360, skin, -1)
        cv.ellipse(a, (bs // 2, bs // 2), axes, 0, 0, 360, 1.0, -1)
        _paste_rgba(img, np.dstack([rgb, a]), rng)
    boxes = []
    for _ in range(int(rng.choice([0, 1, 1, 2, 2, 3]))):
        fs = int(rng.integers(28, 150))
        face = render_face(rng, fs)
        box = _paste_rgba(img, face, rng, avoid=boxes)
        if box is not None:
            boxes.append(box)
    return img.clip(0, 255), np.asarray(boxes, np.float32).reshape(-1, 4)


def _paste_rgba(img, patch, rng, avoid=()):
    size = img.shape[0]
    ph, pw = patch.shape[:2]
    if ph >= size or pw >= size:
        return None
    for _ in range(10):
        x = int(rng.integers(0, size - pw))
        y = int(rng.integers(0, size - ph))
        box = (x, y, x + pw, y + ph)
        if all(_iou(box, b) < 0.1 for b in avoid):
            a = patch[:, :, 3:4]
            img[y:y + ph, x:x + pw] = (img[y:y + ph, x:x + pw] * (1 - a)
                                       + patch[:, :, :3] * a)
            return box
    return None


# --------------------------------------------------------------------------
# crop sampling (pos / part / neg, square, MTCNN reg targets)
# --------------------------------------------------------------------------

def sample_crops(rng: np.random.Generator, n_scenes: int, crop_size: int,
                 per_scene: int = 8):
    """Returns (crops (N,s,s,3) normalized, labels (N,) {1,0,-1}=pos/neg/
    part, regs (N,4))."""
    import cv2 as cv

    crops, labels, regs = [], [], []
    for _ in range(n_scenes):
        img, gts = compose_scene(rng)
        H, W = img.shape[:2]
        want_pos = per_scene // 2 if len(gts) else 0
        got = 0
        # positives/parts: jitter around gt squares
        attempts = 0
        while got < want_pos and attempts < 50:
            attempts += 1
            g = gts[rng.integers(len(gts))]
            side0 = max(g[2] - g[0], g[3] - g[1])
            side = side0 * rng.uniform(0.8, 1.25)
            cx = (g[0] + g[2]) / 2 + rng.uniform(-0.25, 0.25) * side0
            cy = (g[1] + g[3]) / 2 + rng.uniform(-0.25, 0.25) * side0
            x1, y1 = cx - side / 2, cy - side / 2
            x2, y2 = x1 + side, y1 + side
            if x1 < 0 or y1 < 0 or x2 > W or y2 > H:
                continue
            iou = max(_iou((x1, y1, x2, y2), g2) for g2 in gts)
            if iou < 0.4:
                continue
            lab = 1 if iou >= 0.65 else -1
            crop = cv.resize(img[int(y1):int(y2), int(x1):int(x2)],
                             (crop_size, crop_size),
                             interpolation=cv.INTER_AREA)
            reg = np.array([(g[0] - x1) / side, (g[1] - y1) / side,
                            (g[2] - x2) / side, (g[3] - y2) / side],
                           np.float32)
            crops.append(crop)
            labels.append(lab)
            regs.append(reg)
            got += 1
        # negatives: random squares with low IoU (half near-miss)
        neg = 0
        attempts = 0
        while neg < per_scene - got and attempts < 80:
            attempts += 1
            if len(gts) and rng.random() < 0.4:  # near-miss around a face
                g = gts[rng.integers(len(gts))]
                side = max(g[2] - g[0], g[3] - g[1]) * rng.uniform(0.5, 2.0)
                cx = (g[0] + g[2]) / 2 + rng.uniform(-1.2, 1.2) * side
                cy = (g[1] + g[3]) / 2 + rng.uniform(-1.2, 1.2) * side
                x1, y1 = cx - side / 2, cy - side / 2
            else:
                side = rng.uniform(14, min(H, W) * 0.6)
                x1 = rng.uniform(0, W - side)
                y1 = rng.uniform(0, H - side)
            x2, y2 = x1 + side, y1 + side
            if x1 < 0 or y1 < 0 or x2 > W or y2 > H:
                continue
            if len(gts) and max(_iou((x1, y1, x2, y2), g) for g in gts) \
                    >= 0.3:
                continue
            crop = cv.resize(img[int(y1):int(y2), int(x1):int(x2)],
                             (crop_size, crop_size),
                             interpolation=cv.INTER_AREA)
            crops.append(crop)
            labels.append(0)
            regs.append(np.zeros(4, np.float32))
            neg += 1
    crops = (np.stack(crops).astype(np.float32) - 127.5) * 0.0078125
    return crops, np.asarray(labels, np.int32), np.stack(regs)


# --------------------------------------------------------------------------
# per-net training
# --------------------------------------------------------------------------

def train_net(net_name: str, net, init_params, steps: int, batch_scenes: int,
              lr: float, rng: np.random.Generator, log_every: int = 50):
    import jax
    import jax.numpy as jnp
    import optax

    size = CROP_SIZES[net_name]

    def loss_fn(params, crops, labels, regs):
        outs = net.apply(params, crops)
        reg, probs = outs[0], outs[-1]  # ONet returns (reg, lmk, probs)
        if probs.ndim == 4:  # PNet dense map on 12x12 input -> (N,1,1,2)
            probs = probs[:, 0, 0]
            reg = reg[:, 0, 0]
        is_pos = (labels == 1)
        is_neg = (labels == 0)
        is_reg = is_pos | (labels == -1)  # pos + part (label -2 = pad)
        ce = -jnp.log(jnp.where(is_pos, probs[:, 1],
                                jnp.where(is_neg, probs[:, 0], 1.0))
                      + 1e-9)
        cls_loss = jnp.sum(ce * (is_pos | is_neg)) / \
            jnp.maximum(jnp.sum(is_pos | is_neg), 1)
        reg_loss = jnp.sum(jnp.sum((reg - regs) ** 2, -1) * is_reg) / \
            jnp.maximum(jnp.sum(is_reg), 1)
        return cls_loss + 0.5 * reg_loss

    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(lr))
    opt_state = tx.init(init_params)

    @jax.jit
    def step(params, opt_state, crops, labels, regs):
        loss, grads = jax.value_and_grad(loss_fn)(params, crops, labels,
                                                  regs)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = init_params
    # static batch: sample_crops yields variable counts; pad/trim to fixed
    fixed = batch_scenes * 8
    t0 = time.time()
    for it in range(1, steps + 1):
        crops, labels, regs = sample_crops(rng, batch_scenes, size)
        n = crops.shape[0]
        if n >= fixed:
            crops, labels, regs = crops[:fixed], labels[:fixed], regs[:fixed]
        else:
            pad = fixed - n
            crops = np.concatenate([crops, np.zeros((pad, size, size, 3),
                                                    np.float32)])
            labels = np.concatenate([labels, np.full(pad, -2, np.int32)])
            regs = np.concatenate([regs, np.zeros((pad, 4), np.float32)])
        params, opt_state, loss = step(params, opt_state, crops, labels,
                                       regs)
        if it % log_every == 0 or it == steps:
            print(f"[{net_name}] step {it}/{steps} loss {float(loss):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    return params


def evaluate(det, rng: np.random.Generator, n_scenes: int = 32,
             iou_thr: float = 0.5):
    tp = fp = fn = 0
    for _ in range(n_scenes):
        img, gts = compose_scene(rng)
        boxes, scores = det.detect(img.astype(np.uint8))
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
    return tp / max(tp + fp, 1), tp / max(tp + fn, 1)


def export_npz(params: dict, out: str):
    """tools/export_mtcnn.py key format: '<net>.<torch name>'."""
    from vcm_ts_tpu.utils.weight_export import flax_to_torch_state_dict

    sd = {}
    for net in ("pnet", "rnet", "onet"):
        for k, v in flax_to_torch_state_dict(params[net]).items():
            sd[f"{net}.{k}"] = v
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    np.savez(out, __meta__=json.dumps(
        {"format": "mtcnn-v1",
         "trained": "in-repo tools/train_face_detector.py"}), **sd)


def train(steps: int, batch_scenes: int, lr: float, seed: int, out: str):
    import jax

    from vcm_ts_tpu.eval.mtcnn_native import MTCNNNativeDetector

    det = MTCNNNativeDetector().init(jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    for net_name in ("pnet", "rnet", "onet"):
        det.params[net_name] = train_net(
            net_name, getattr(det, net_name), det.params[net_name],
            steps, batch_scenes, lr, rng)
    det._jits = {}
    prec, rec = evaluate(det, np.random.default_rng(seed + 1))
    print(f"held-out cascade precision {prec:.3f} recall {rec:.3f}",
          flush=True)
    export_npz(det.params, out)
    print(f"saved {out}")
    return prec, rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--batch-scenes", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=os.path.join("pretrained",
                                                  "mtcnn.npz"))
    a = ap.parse_args()
    train(a.steps, a.batch_scenes, a.lr, a.seed, a.out)


if __name__ == "__main__":
    main()
