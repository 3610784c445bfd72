"""Checkpoint inspector: prints top-level key groups and q-scale vectors.

Port of the reference test_weights.py:6-38; also understands this
framework's native .ckpt format.
"""

from __future__ import annotations

import argparse

import numpy as np


def parse_weights(weights_path: str):
    if weights_path.endswith(".ckpt"):
        from flax import serialization

        with open(weights_path, "rb") as f:
            n = int.from_bytes(f.read(8), "little")
            blob = f.read(n)
        tree = serialization.msgpack_restore(blob)
        inner = tree.get("params", tree)
        flat = {}

        def walk(node, prefix):
            for k, v in node.items():
                path = f"{prefix}.{k}" if prefix else k
                if isinstance(v, dict):
                    walk(v, path)
                else:
                    flat[path] = np.asarray(v)

        walk(inner, "")
        return flat, {k.split(".")[0] for k in flat}

    import torch

    weights = torch.load(weights_path, map_location="cpu")
    if "model" in weights and isinstance(weights["model"], dict):
        weights = weights["model"]
    return weights, {k.split(".")[0] for k in weights}


def main():
    parser = argparse.ArgumentParser(description="Model weights inspector")
    parser.add_argument("--weights-path", dest="weights_path", type=str,
                        required=True)
    args = parser.parse_args()

    weights, names = parse_weights(args.weights_path)
    for name in sorted(names):
        print(name)
    for key, val in weights.items():
        if key in ("y_q_scale", "mv_y_q_scale", "q_scale"):
            print(key, np.asarray(val).reshape(-1).tolist())


if __name__ == "__main__":
    main()
