"""Reference-protocol-scale evaluation run (VERDICT r4 next-step 3).

The reference's harness sweeps 96-frame sequences at GOP=32 over 4 rate
points with real bitstreams (/root/reference/DCVC_HEM/test_video.py:80-182,
dataset_config_example.json). This tool runs OUR test_video.py at exactly
that protocol on a generated 1080p clip: 96 frames, intra period 32 (3
GOPs -> 2 rekeys), 4 rate points, real container .bin streams, PSNR/
MS-SSIM per frame, generate_log_json output — proving long-GOP rekey,
error propagation, and the harness at the protocol the reference defines.

The clip is synthetic (no test sets ship in this image): a textured
scene under global translation + a moving occluder, giving the motion
path real work and P-frames real references.

    python tools/protocol_run.py --out artifacts/protocol_r5 \
        [--model-path artifacts/overfit_r5.pth] [--frames 96] [--gop 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def gen_sequence(root: str, n_frames: int, h: int, w: int, seed: int = 0):
    """96 PNG frames: textured background translating + moving occluder."""
    import cv2 as cv

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    # textured base, band-limited so flows are trackable: upsampled noise
    # octaves (kron at 3 scales)
    big_h, big_w = h + 256, w + 256
    base = np.zeros((big_h, big_w, 3), np.float32)
    for cell, amp in ((64, 0.5), (16, 0.3), (4, 0.2)):
        g = rng.random((big_h // cell + 2, big_w // cell + 2, 3))
        up = cv.resize(g, (big_w, big_h), interpolation=cv.INTER_CUBIC)
        base += amp * up
    base = (base / base.max() * 255).astype(np.uint8)
    oh, ow = max(16, h // 7), max(16, w // 8)  # occluder ~1.5% of frame
    occ = (rng.random((oh, ow, 3)) * 255).astype(np.uint8)
    for t in range(n_frames):
        ox = int(40 + 1.3 * t)     # global pan
        oy = int(30 + 0.6 * t)
        frame = base[oy:oy + h, ox:ox + w].copy()
        # occluder moves opposite the pan
        px = int(w - ow - 60 - 2.0 * t) % (w - ow)
        py = int(oh + 1.1 * t) % (h - oh)
        frame[py:py + oh, px:px + ow] = occ
        cv.imwrite(os.path.join(root, f"im{t + 1:05d}.png"), frame)
    return n_frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/protocol_r5")
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--gop", type=int, default=32)
    ap.add_argument("--rate-num", type=int, default=4)
    ap.add_argument("--size", default="1080x1920")
    ap.add_argument("--model-path", default=None,
                    help=".pth DMC weights (flax_to_torch export); "
                         "default random-init")
    ap.add_argument("--i-frame-model-path", default=None)
    ap.add_argument("--seq-root", default=None,
                    help="reuse an existing PNG sequence dir")
    a = ap.parse_args()

    h, w = (int(v) for v in a.size.split("x"))
    os.makedirs(a.out, exist_ok=True)
    seq_name = f"Synthetic_{w}x{h}_30"
    if a.seq_root:
        seq_dir = os.path.join(a.seq_root, "Synthetic", seq_name)
    else:
        seq_dir = os.path.join(a.out, "seq", "Synthetic", seq_name)
        print(f"generating {a.frames} frames at {w}x{h} ...", flush=True)
        gen_sequence(seq_dir, a.frames, h, w)
    root_path = os.path.dirname(os.path.dirname(seq_dir))

    cfg = {
        "root_path": root_path,
        "test_classes": {
            "Synthetic": {
                "test": 1,
                "base_path": "Synthetic",
                "src_type": "png",
                "sequences": {
                    seq_name: {"width": w, "height": h,
                               "frames": a.frames, "gop": a.gop},
                },
            },
        },
    }
    cfg_path = os.path.join(a.out, "dataset_config.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f, indent=2)

    out_json = os.path.join(a.out, "protocol_log.json")
    cmd = [sys.executable, os.path.join(REPO, "test_video.py"),
           "--test_config", cfg_path,
           "--rate_num", str(a.rate_num),
           "--write_stream", "True",
           "--stream_path", os.path.join(a.out, "bins"),
           "--output_path", out_json,
           "--verbose", "1"]
    if a.model_path:
        cmd += ["--model_path", a.model_path]
    if a.i_frame_model_path:
        cmd += ["--i_frame_model_path", a.i_frame_model_path]
    print("running:", " ".join(cmd), flush=True)
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO)
    dt = time.time() - t0
    if r.returncode != 0:
        raise SystemExit(f"test_video.py failed rc={r.returncode}")
    with open(out_json) as f:
        log = json.load(f)
    fps = a.frames * a.rate_num / dt
    summary = {"wall_s": round(dt, 1),
               "frames_total": a.frames * a.rate_num,
               "aggregate_fps": round(fps, 3),
               "log": out_json}
    with open(os.path.join(a.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    # one-line RD recap per rate point (generate_log_json schema)
    def walk(node, path=""):
        if isinstance(node, dict):
            if "ave_all_frame_bpp" in node:
                print(f"{path}: bpp={node['ave_all_frame_bpp']:.4f} "
                      f"psnr={node.get('ave_all_frame_psnr', 0):.3f} "
                      f"msssim={node.get('ave_all_frame_msssim', 0):.4f}")
                return
            for k, v in node.items():
                walk(v, f"{path}/{k}")

    walk(log)


if __name__ == "__main__":
    main()
