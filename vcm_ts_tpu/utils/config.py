"""Minimal yacs-compatible config-tree implementation.

The reference builds everything on yacs CfgNode
(core/config/training_settings.py, core/config/codec_settings.py); yacs is
not in this image, so this provides the same surface: attribute access,
merge_from_file (YAML), merge_from_list (CLI opts), freeze/defrost, clone,
and dump.
"""

from __future__ import annotations

import copy
from typing import Any

import yaml


class CfgNode(dict):
    """Attribute-accessible dict with freeze semantics (yacs-compatible)."""

    _FROZEN = "_cfg_frozen"

    def __init__(self, init: dict | None = None):
        super().__init__()
        object.__setattr__(self, CfgNode._FROZEN, False)
        if init:
            for k, v in init.items():
                self[k] = CfgNode(v) if isinstance(v, dict) else v

    # attribute protocol ----------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any):
        if object.__getattribute__(self, CfgNode._FROZEN):
            raise AttributeError(
                f"Attempted to set {name} on a frozen CfgNode")
        self[name] = CfgNode(value) if isinstance(value, dict) and not \
            isinstance(value, CfgNode) else value

    def __setitem__(self, key, value):
        if object.__getattribute__(self, CfgNode._FROZEN):
            raise AttributeError(
                f"Attempted to set {key} on a frozen CfgNode")
        super().__setitem__(key, value)

    # freeze protocol -------------------------------------------------------
    def freeze(self):
        object.__setattr__(self, CfgNode._FROZEN, True)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.freeze()

    def defrost(self):
        object.__setattr__(self, CfgNode._FROZEN, False)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.defrost()

    def is_frozen(self) -> bool:
        return object.__getattribute__(self, CfgNode._FROZEN)

    def clone(self) -> "CfgNode":
        node = CfgNode()
        for k, v in self.items():
            node[k] = v.clone() if isinstance(v, CfgNode) else copy.deepcopy(v)
        return node

    # merging ---------------------------------------------------------------
    def _merge_dict(self, other: dict, path: str = ""):
        for k, v in other.items():
            full = f"{path}.{k}" if path else k
            if k not in self:
                raise KeyError(f"Non-existent config key: {full}")
            cur = self[k]
            if isinstance(cur, CfgNode):
                if not isinstance(v, dict):
                    raise TypeError(f"Cannot merge non-dict into {full}")
                cur._merge_dict(v, full)
            else:
                super().__setitem__(k, _coerce(v, cur, full))

    def merge_from_file(self, filename: str):
        frozen = self.is_frozen()
        if frozen:
            self.defrost()
        with open(filename) as f:
            data = yaml.safe_load(f) or {}
        self._merge_dict(data)
        if frozen:
            self.freeze()

    def merge_from_list(self, opts: list):
        assert len(opts) % 2 == 0, "Override list must be key value pairs"
        frozen = self.is_frozen()
        if frozen:
            self.defrost()
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            leaf = parts[-1]
            if leaf not in node:
                raise KeyError(f"Non-existent config key: {key}")
            if isinstance(value, str):
                try:
                    value = yaml.safe_load(value)
                except yaml.YAMLError:
                    pass
            dict.__setitem__(node, leaf, _coerce(value, node[leaf], key))
        if frozen:
            self.freeze()

    # output ----------------------------------------------------------------
    def to_dict(self) -> dict:
        return {k: v.to_dict() if isinstance(v, CfgNode) else v
                for k, v in self.items()}

    def dump(self) -> str:
        return yaml.safe_dump(self.to_dict(), default_flow_style=None)

    def __str__(self):
        return self.dump()


def _coerce(value, current, key):
    """Light type checking against the default value's type."""
    if current is None or value is None:
        return value
    if isinstance(current, bool):
        if isinstance(value, bool):
            return value
        raise TypeError(f"Type mismatch for {key}: expected bool")
    if isinstance(current, (int, float)) and isinstance(value, (int, float)):
        return type(current)(value)
    if isinstance(current, (list, tuple)) and isinstance(value, (list, tuple)):
        return list(value)
    if type(current) is not type(value):
        raise TypeError(
            f"Type mismatch for {key}: expected {type(current).__name__}, "
            f"got {type(value).__name__}")
    return value
