"""Export facenet_pytorch MTCNN weights (P/R/O-Net) to a torch-free .npz
for the native face detector (vcm_ts_tpu/eval/mtcnn_native.py).

The only step that needs facenet_pytorch (whose package bundles the
pnet/rnet/onet weights — the same gate the reference hits at
video_coder.py:296). Run once wherever the package exists:

    python tools/export_mtcnn.py --out pretrained/mtcnn.npz
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def export(out_path: str) -> int:
    try:
        from facenet_pytorch.models.mtcnn import ONet, PNet, RNet
    except ImportError as e:
        raise SystemExit(
            f"facenet_pytorch is required to read the bundled MTCNN "
            f"weights ({e}); run this tool on a machine that has it — "
            f"the resulting .npz loads torch-free") from e

    sd = {}
    for name, cls in (("pnet", PNet), ("rnet", RNet), ("onet", ONet)):
        net = cls(pretrained=True)
        for k, v in net.state_dict().items():
            sd[f"{name}.{k}"] = v.detach().cpu().numpy()
    np.savez(out_path, __meta__=json.dumps({"format": "mtcnn-v1"}), **sd)
    return len(sd)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)
    n = export(args.out)
    print(f"exported {n} MTCNN tensors -> {args.out}")


if __name__ == "__main__":
    sys.exit(main())
