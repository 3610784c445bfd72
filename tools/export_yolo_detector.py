"""Export an ultralytics YOLOv8 .pt checkpoint to a torch-free .npz for
the native detector (vcm_ts_tpu/eval/yolo_native.py).

The .pt pickle references ultralytics classes (the same gate the
reference hits at video_coder.py:261), but this tool no longer needs the
package: utils/weight_import.load_torch_pickle_weights_only maps those
refs to opaque stand-ins and keeps the tensors. If the shim ever fails on
an exotic checkpoint, the ultralytics loader is the fallback.

    python tools/export_yolo_detector.py --pt pretrained/yolov8-lp.pt \
        --out pretrained/yolov8-lp.npz

The .npz holds the raw torch-named weight arrays plus a JSON meta record
(nc / width / depth / max_channels / reg_max, inferred from the state
dict so any v8 scale n/s/m/l/x exports without flags).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def infer_meta(sd) -> dict:
    """Scale hyperparameters from the state dict itself."""
    width = sd["model.0.conv.weight"].shape[0] / 64.0
    # depth from the layer-2 C2f bottleneck count: d(3) = round(3 * depth)
    n2 = 1 + max(int(k.split(".")[3]) for k in sd
                 if k.startswith("model.2.m."))
    depth = n2 / 3.0
    # the 1024-channel cap only ever binds at the c(1024) sites (SPPF):
    # using the observed channel count as the cap reproduces every scale
    max_channels = sd["model.9.cv2.conv.weight"].shape[0]
    nc = sd["model.22.cv3.0.2.weight"].shape[0]
    reg_max = sd["model.22.cv2.0.2.weight"].shape[0] // 4
    return {"nc": int(nc), "width": width, "depth": depth,
            "max_channels": int(max_channels), "reg_max": int(reg_max)}


def export(pt_path: str, out_path: str) -> dict:
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from vcm_ts_tpu.utils.weight_import import (
        extract_module_state_dict, load_torch_pickle_weights_only)

    try:
        ckpt = load_torch_pickle_weights_only(pt_path)
        model = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
        sd = extract_module_state_dict(model)
    except Exception:
        # fallback: ultralytics' own loader
        try:
            from ultralytics import YOLO
        except ImportError as e:
            raise SystemExit(
                f"failed to shim-deserialize {pt_path} and ultralytics is "
                f"not importable either ({e})") from e
        sd = {k: v.detach().cpu().numpy()
              for k, v in YOLO(pt_path).model.state_dict().items()}
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()
          if not k.endswith("num_batches_tracked")}
    meta = infer_meta(sd)
    np.savez(out_path, __meta__=json.dumps(meta), **sd)
    return meta


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pt", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)
    meta = export(args.pt, args.out)
    print(f"exported {args.pt} -> {args.out}: {meta}")


if __name__ == "__main__":
    sys.exit(main())
