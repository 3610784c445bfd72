"""Export Flax parameter trees to reference-compatible PyTorch state dicts.

Inverse of utils/weight_import.py: kernels HWIO -> OIHW, Dense transposed,
per-channel (1,1,1,C) vectors -> (1,C,1,1). Enables the reference ecosystem
(DCVC_HEM test tools, upstream checkpoints) to consume models trained here
(parity with save_dcvc_weights.py's interop role)."""

from __future__ import annotations

import numpy as np


def flax_to_torch_state_dict(params: dict) -> dict:
    """params: {"params": {...}} or inner tree. Returns {key: np.ndarray}."""
    inner = params.get("params", params)
    out = {}

    def walk(node, prefix):
        for k, v in node.items():
            path = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, path)
                continue
            v = np.asarray(v)
            if k == "kernel":
                tkey = prefix + ".weight" if prefix else "weight"
                if v.ndim == 4:
                    out[tkey] = v.transpose(3, 2, 0, 1).copy()
                else:
                    out[tkey] = v.T.copy()
            elif k == "bias":
                out[prefix + ".bias" if prefix else "bias"] = v.copy()
            elif v.ndim == 4 and v.shape[:3] == (1, 1, 1):
                out[path] = v.transpose(0, 3, 1, 2).copy()
            else:
                out[path] = v.copy()

    walk(inner, "")
    return out


def save_torch_state_dict(params: dict, out_path: str):
    import torch

    sd = {k: torch.from_numpy(v) for k, v in
          flax_to_torch_state_dict(params).items()}
    torch.save(sd, out_path)
    return sd
