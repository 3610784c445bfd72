"""Checkpoint save/load with auto-resume.

Equivalent of the reference CheckPointer (core/utils/checkpoint.py:8-145):
saves {params, opt_state, extra-args} with a `last_checkpoint.txt` tag file
for auto-resume; tolerant loading covers (a) this framework's native msgpack
format and (b) reference PyTorch .pth checkpoints via utils/weight_import.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Optional

import jax
import numpy as np
from flax import serialization

_LAST_TAG = "last_checkpoint.txt"


class CheckPointer:
    def __init__(self, save_dir: str = "", logger: Optional[logging.Logger] = None):
        self.save_dir = save_dir
        self.logger = logger or logging.getLogger("CORE")

    # ------------------------------------------------------------------ save
    def save(self, name: str, params, opt_state=None, **kwargs):
        if not self.save_dir:
            return
        os.makedirs(self.save_dir, exist_ok=True)
        path = os.path.join(self.save_dir, f"{name}.ckpt")
        blob = {
            "params": serialization.to_bytes(params),
            "opt_state": (serialization.to_bytes(opt_state)
                          if opt_state is not None else b""),
            "extra": json.dumps(kwargs).encode(),
        }
        with open(path, "wb") as f:
            # simple length-prefixed container
            for key in ("params", "opt_state", "extra"):
                data = blob[key]
                f.write(len(data).to_bytes(8, "little"))
                f.write(data)
        self.tag_last_checkpoint(path)
        self.logger.info("Saved checkpoint to %s", path)

    # ------------------------------------------------------------------ load
    def load(self, template_params, template_opt_state=None,
             path: Optional[str] = None, use_latest: bool = True):
        """Returns (params, opt_state, extra_dict). Resume tag wins over the
        explicit path when use_latest and a tag exists (checkpoint.py:57-64)."""
        if self.has_checkpoint() and use_latest:
            path = self.get_checkpoint_file()
        if not path:
            self.logger.info("No checkpoint found.")
            return template_params, template_opt_state, {}

        self.logger.info("Loading checkpoint from %s", path)
        if path.endswith(".pth"):  # reference torch format
            from ..utils.weight_import import (import_state_dict,
                                               load_torch_state_dict)
            sd = load_torch_state_dict(path)
            params = import_state_dict(template_params, sd)
            return params, template_opt_state, {}

        with open(path, "rb") as f:
            blobs = []
            for _ in range(3):
                n = int.from_bytes(f.read(8), "little")
                blobs.append(f.read(n))
        params = serialization.from_bytes(template_params, blobs[0])
        opt_state = template_opt_state
        if blobs[1] and template_opt_state is not None:
            opt_state = serialization.from_bytes(template_opt_state, blobs[1])
        extra = json.loads(blobs[2].decode()) if blobs[2] else {}
        return params, opt_state, extra

    def load_opt_blob(self, path: Optional[str] = None,
                      use_latest: bool = True) -> bytes:
        """Raw serialized opt_state bytes from a checkpoint (b"" if absent).

        The optimizer template doesn't exist until do_train enters the
        resumed stage (make_stage_optimizer builds it from the stage's
        trainable mask), so resume callers pass these bytes to do_train's
        resume_opt_blob instead of deserializing here — otherwise a
        mid-stage resume would silently restart Adam moments from zero.
        """
        if self.has_checkpoint() and use_latest:
            path = self.get_checkpoint_file()
        if not path or path.endswith(".pth"):
            return b""
        with open(path, "rb") as f:
            n = int.from_bytes(f.read(8), "little")
            f.seek(n, 1)
            n = int.from_bytes(f.read(8), "little")
            return f.read(n)

    # ------------------------------------------------------------------ tags
    def has_checkpoint(self) -> bool:
        return bool(self.save_dir) and os.path.exists(
            os.path.join(self.save_dir, _LAST_TAG))

    def get_checkpoint_file(self) -> str:
        try:
            with open(os.path.join(self.save_dir, _LAST_TAG)) as f:
                return f.read().strip()
        except OSError:
            return ""

    def tag_last_checkpoint(self, path: str):
        with open(os.path.join(self.save_dir, _LAST_TAG), "w") as f:
            f.write(path)
