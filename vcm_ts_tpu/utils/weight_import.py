"""Reference (PyTorch) checkpoint importer.

Ports DCVC-HEM-format .pth state dicts into the Flax parameter trees of this
framework (reference loading logic: DCVC_HEM/src/utils/stream_helper.py:49-56
get_state_dict; q-scale extraction video_model.py:248-253,
image_model.py:108-112).

Mapping rules (validated by tests/test_weight_import.py):
- module paths match one-to-one because flax children are named with the
  reference's state-dict segments (Seq containers use torch Sequential
  indices; ModuleList entries use dotted names like "moduleBasic.0");
- conv "weight" OIHW -> "kernel" HWIO; linear "weight" (out,in) -> (in,out);
- per-channel vectors shaped (1,C,1,1) (Bitparm h/b/a, q_basic) -> (1,1,1,C);
- rate-anchor scales (A,1,1,1) keep their shape.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def load_torch_state_dict(ckpt_path: str) -> Dict[str, np.ndarray]:
    """torch.load + unwrap, as numpy (reference get_state_dict)."""
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    if "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    if "net" in ckpt:
        ckpt = ckpt["net"]
    out = {}
    for k, v in ckpt.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


_SAFE_PICKLE_PREFIXES = (
    "torch.", "collections.", "builtins.", "copyreg.", "numpy.", "numpy",
    "__builtin__.",
)


class _Opaque:
    """Stand-in for a class the pickle references but we don't have.

    Accepts every pickle construction protocol (REDUCE args, NEWOBJ,
    BUILD with dict or (dict, slots) state) and just keeps the state on
    __dict__ so the module tree can be walked afterwards.
    """

    def __init__(self, *args, **kwargs):
        self._ctor_args = args
        self._ctor_kwargs = kwargs

    def __setstate__(self, state):
        if isinstance(state, tuple) and len(state) == 2:
            d, slots = state
            state = dict(d or {})
            state.update(slots or {})
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state

    # some reduces call the "class" as a factory function
    def __call__(self, *args, **kwargs):
        return _Opaque()


def _make_opaque(module: str, name: str):
    cls = type(name, (_Opaque,), {"__module__": module})
    return cls


def load_torch_pickle_weights_only(path: str):
    """Deserialize a torch .pt/.pth whose pickle references third-party
    classes (e.g. ultralytics.nn.tasks.DetectionModel) WITHOUT those
    packages installed (reference load site:
    /root/reference/core/engine/losses.py:168-176, which needs the
    ultralytics graph importable just to unpickle yolov8m.pt).

    Mechanism: torch.load with a shim pickle module whose find_class
    returns the real class for torch/stdlib/numpy names (so tensor
    rebuilding uses torch's own machinery) and a generated _Opaque
    stand-in for everything else. Tensors come out real; the surrounding
    model objects come out as opaque attribute bags that
    extract_module_state_dict() can walk.

    This removes the *dependency*, not the trust decision: torch
    callables are still reachable from the pickle, so only load files you
    would have passed to torch.load anyway.
    """
    import importlib
    import io
    import pickle

    class _ShimUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module == "__builtin__":  # py2-era refs in old checkpoints
                module = "builtins"
            qual = module + "." + name
            if module == "collections" or any(
                    qual.startswith(p) or module == p
                    for p in _SAFE_PICKLE_PREFIXES):
                mod = importlib.import_module(module)
                return getattr(mod, name)
            return _make_opaque(module, name)

    class _ShimPickleModule:
        Unpickler = _ShimUnpickler
        load = staticmethod(pickle.load)
        # torch.serialization probes these
        __name__ = "vcm_ts_tpu_shim_pickle"

    import torch

    return torch.load(path, map_location="cpu", weights_only=False,
                      pickle_module=_ShimPickleModule)


def extract_module_state_dict(obj, prefix: str = "") -> Dict[str, np.ndarray]:
    """Flatten an unpickled (possibly _Opaque) nn.Module tree to a
    {dotted_name: numpy array} state dict, mirroring
    torch.nn.Module.state_dict() naming: _parameters and _buffers at each
    level, recursing through _modules."""
    out: Dict[str, np.ndarray] = {}
    d = getattr(obj, "__dict__", None)
    if d is None:
        return out
    for name, p in (d.get("_parameters") or {}).items():
        if p is not None:
            out[prefix + name] = p.detach().cpu().numpy()
    for name, b in (d.get("_buffers") or {}).items():
        if b is not None:
            out[prefix + name] = b.detach().cpu().numpy()
    for name, child in (d.get("_modules") or {}).items():
        if child is not None:
            out.update(extract_module_state_dict(child, prefix + name + "."))
    return out


def _convert_leaf(torch_key: str, leaf_name: str, value: np.ndarray,
                  template: np.ndarray) -> np.ndarray:
    if leaf_name == "kernel":
        if value.ndim == 4:        # conv OIHW -> HWIO
            value = value.transpose(2, 3, 1, 0)
        elif value.ndim == 2:      # linear (out,in) -> (in,out)
            value = value.T
    elif value.ndim == 4 and template.ndim == 4 and value.shape != template.shape:
        # per-channel (1,C,1,1) -> (1,1,1,C)
        if value.shape[1] == template.shape[3]:
            value = value.transpose(0, 2, 3, 1)
    if value.shape != template.shape:
        raise ValueError(
            f"shape mismatch importing {torch_key}: torch {value.shape} vs "
            f"flax {template.shape}")
    return np.ascontiguousarray(value, dtype=template.dtype)


def _resolve(tree: dict, segments: list, torch_key: str):
    """Greedy path walk, merging segments for dotted flax names."""
    node = tree
    path = []
    i = 0
    while i < len(segments):
        seg = segments[i]
        # try progressively longer dotted merges
        j = i
        cand = seg
        while cand not in node and j + 1 < len(segments):
            j += 1
            cand = cand + "." + segments[j]
        if cand not in node:
            raise KeyError(
                f"cannot resolve torch key '{torch_key}' at segment '{seg}' "
                f"(available: {sorted(node.keys())[:8]}...)")
        path.append(cand)
        node = node[cand]
        i = j + 1
        if not isinstance(node, dict):
            break
    return path, node


_LEAF_MAP = {"weight": "kernel", "bias": "bias"}


def import_state_dict(flax_params: dict, state_dict: Dict[str, np.ndarray],
                      strict=True) -> dict:
    """Returns a new params tree with imported values.

    flax_params: {"params": {...}} template (shapes/dtypes/structure).
    strict: True = error on unmatched torch keys AND uncovered flax
    params; "cover" = tolerate stray torch keys (aux heads, renamed
    extras) but still error if any flax param was left at init — the
    direction that silently poisons eval numbers; False = no checks.
    """
    import jax

    inner = flax_params["params"]
    flat = {}

    missing = []
    for tkey, value in state_dict.items():
        if tkey.endswith("num_batches_tracked"):
            continue  # BatchNorm bookkeeping, meaningless for frozen eval BN
        segments = tkey.split(".")
        leaf = segments[-1]
        try:
            # leaf name as-is first (e.g. frozen-BN "weight"/"running_mean"
            # params keep their torch names), then the conv/linear mapping
            path, node = _resolve(inner, segments, tkey)
        except KeyError:
            try:
                mapped = _LEAF_MAP.get(leaf, leaf)
                path, node = _resolve(inner, segments[:-1] + [mapped], tkey)
            except KeyError:
                missing.append(tkey)
                continue
        flat[tuple(path)] = _convert_leaf(tkey, path[-1], value, np.asarray(node))

    if strict is True and missing:
        raise KeyError(f"unmatched torch keys: {missing[:10]}"
                       f"{' ...' if len(missing) > 10 else ''}")

    def rebuild(node, prefix):
        if not isinstance(node, dict):
            return flat.get(prefix, node)
        return {k: rebuild(v, prefix + (k,)) for k, v in node.items()}

    new_inner = rebuild(inner, ())
    imported = {tuple(p) for p in flat}

    if strict in (True, "cover"):
        # every template leaf must have been covered
        uncovered = []

        def check(node, prefix):
            if not isinstance(node, dict):
                if prefix not in imported:
                    uncovered.append(".".join(prefix))
                return
            for k, v in node.items():
                check(v, prefix + (k,))

        check(inner, ())
        if uncovered:
            raise KeyError(f"flax params not covered by checkpoint: "
                           f"{uncovered[:10]}"
                           f"{' ...' if len(uncovered) > 10 else ''}")

    out = dict(flax_params)
    out["params"] = jax.tree_util.tree_map(lambda x: x, new_inner)
    return out


def get_q_scales_from_ckpt(ckpt_path: str):
    """(y_q_scales, mv_y_q_scales) from a DMC checkpoint
    (video_model.py:248-253)."""
    sd = load_torch_state_dict(ckpt_path)
    return (np.asarray(sd["y_q_scale"]).reshape(-1),
            np.asarray(sd["mv_y_q_scale"]).reshape(-1))


def get_i_frame_q_scales_from_ckpt(ckpt_path: str):
    """q_scales from an IntraNoAR checkpoint (image_model.py:108-112)."""
    sd = load_torch_state_dict(ckpt_path)
    return np.asarray(sd["q_scale"]).reshape(-1)
