"""Training metric logging: TensorBoard scalars (when available) + JSONL.

Equivalent of core/utils/tensorboard.py:83-127 add_metrics (per-lambda
scalars for loss/dist/p_dist/bpp/psnr, lr, stage) with a plain JSONL fallback
so headless runs always leave an artifact.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np


class MetricWriter:
    def __init__(self, log_dir: str, enable_tb: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if enable_tb:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value: float, step: int):
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        self._jsonl.write(json.dumps(
            {"t": time.time(), "step": step, "tag": tag,
             "value": float(value)}) + "\n")

    def add_metrics(self, prefix: str, metrics: dict, lambdas, step: int):
        """Per-lambda dict logging (tensorboard.py:83-127 semantics)."""
        for key, values in metrics.items():
            values = np.asarray(values).reshape(-1)
            if values.size == len(lambdas):
                for lam, v in zip(lambdas, values):
                    self.add_scalar(f"{prefix}/{key}/lambda_{lam}", v, step)
            else:
                self.add_scalar(f"{prefix}/{key}", float(values.mean()), step)
        self.flush()

    def flush(self):
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
