"""Data transforms over (inputs, targets, masks, resids) 4-tuples.

Numpy/NHWC-native equivalents of the reference transform stack
(core/data/transforms/transforms.py:8-149, functional.py:4-17). The only
deliberate difference: ToTensor keeps (T, H, W, C) float32 — channels-last is
the TPU-native layout, so no permute to TCHW happens anywhere.
"""

from __future__ import annotations

import numpy as np


class TransformCompose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, inputs, targets, masks=None, resids=None):
        for t in self.transforms:
            inputs, targets, masks, resids = t(inputs, targets, masks, resids)
        return (inputs, targets,
                0 if masks is None else masks,
                0 if resids is None else resids)


class ConvertFromInts:
    def __call__(self, inputs, targets, masks=None, resids=None):
        inputs = inputs.astype(np.float32)
        targets = targets.astype(np.float32)
        if masks is not None:
            masks = masks.astype(np.float32)
        if resids is not None:
            resids = resids.astype(np.float32)
        return inputs, targets, masks, resids


class Clip:
    def __init__(self, vmin: float = 0.0, vmax: float = 255.0):
        assert vmax >= vmin
        self.vmin, self.vmax = vmin, vmax

    def __call__(self, inputs, targets, masks=None, resids=None):
        return (np.clip(inputs, self.vmin, self.vmax),
                np.clip(targets, self.vmin, self.vmax), masks, resids)


class Normalize:
    def __init__(self, norm_mask: bool = True, norm_resids: bool = True):
        self.norm_mask = norm_mask
        self.norm_resids = norm_resids

    def __call__(self, inputs, targets, masks=None, resids=None):
        inputs = inputs.astype(np.float32) / 255.0
        targets = targets.astype(np.float32) / 255.0
        if masks is not None and self.norm_mask:
            masks = masks.astype(np.float32) / 255.0
        if resids is not None and self.norm_resids:
            resids = resids.astype(np.float32) / 255.0
        return inputs, targets, masks, resids


class ToTensor:
    """Finalizes to float32 (T, H, W, C) — NHWC stays native on TPU."""

    def __call__(self, inputs, targets, masks=None, resids=None):
        inputs = np.ascontiguousarray(inputs, dtype=np.float32)
        targets = np.ascontiguousarray(targets, dtype=np.float32)
        if masks is not None:
            masks = np.ascontiguousarray(masks, dtype=np.float32)
        if resids is not None:
            resids = np.ascontiguousarray(resids, dtype=np.float32)
        return inputs, targets, masks, resids


def make_array_divisible_by(image: np.ndarray, div_factor: int):
    if image.ndim not in (3, 4):
        raise ValueError("Expected a 3D or 4D array as input")
    height, width = image.shape[-3:-1]
    rows = height // div_factor + (1 if height % div_factor else 0)
    cols = width // div_factor + (1 if width % div_factor else 0)
    padding = [(0, rows * div_factor - height),
               (0, cols * div_factor - width), (0, 0)]
    if image.ndim == 4:
        padding.insert(0, (0, 0))
    return np.pad(image, padding, mode="constant", constant_values=0)


class MakeDivisibleBy:
    def __init__(self, factor: int):
        self.factor = factor

    def __call__(self, inputs, targets, masks=None, resids=None):
        inputs = make_array_divisible_by(inputs, self.factor)
        targets = make_array_divisible_by(targets, self.factor)
        if masks is not None:
            masks = make_array_divisible_by(masks, self.factor)
        if resids is not None:
            resids = make_array_divisible_by(resids, self.factor)
        return inputs, targets, masks, resids


class ConvertColor:
    """BGR<->RGB over (T, H, W, C) stacks."""

    def __init__(self, current: str, transform: str):
        if {current, transform} != {"BGR", "RGB"}:
            raise NotImplementedError
        self.current, self.transform = current, transform

    def __call__(self, inputs, targets, masks=None, resids=None):
        inputs = inputs[..., ::-1].copy()
        targets = targets[..., ::-1].copy()
        return inputs, targets, masks, resids


class RandomCrop:
    def __init__(self, w: int, h: int, probability: float = 0.5,
                 rng: np.random.Generator | None = None):
        assert w > 0 and h > 0
        self.crop_w, self.crop_h = w, h
        self.p = float(np.clip(probability, 0.0, 1.0))
        self.rng = rng or np.random.default_rng()

    def __call__(self, inputs, targets, masks=None, resids=None):
        if self.rng.random() < self.p:
            _, h, w, _ = inputs.shape
            assert h >= self.crop_h and w >= self.crop_w, \
                "Image size must not be smaller than crop size"
            crop_x = int(self.rng.random() * (w - self.crop_w))
            crop_y = int(self.rng.random() * (h - self.crop_h))
            inputs = inputs[:, crop_y:crop_y + self.crop_h,
                            crop_x:crop_x + self.crop_w, :]
            targets = targets[:, crop_y:crop_y + self.crop_h,
                              crop_x:crop_x + self.crop_w, :]
            assert masks is None and resids is None, \
                "Cropping for masks/resids not implemented"
        return inputs, targets, masks, resids


class CentralCrop:
    def __init__(self, w: int, h: int, probability: float = 0.5):
        assert w > 0 and h > 0
        self.crop_w, self.crop_h = w, h
        self.p = float(np.clip(probability, 0.0, 1.0))

    def __call__(self, inputs, targets, masks=None, resids=None):
        if self.p >= 1.0 or np.random.random() < self.p:
            _, h, w, _ = inputs.shape
            crop_x = (w - self.crop_w) // 2
            crop_y = (h - self.crop_h) // 2
            assert crop_x >= 0 and crop_y >= 0, \
                "Image size must not be smaller than crop size"
            inputs = inputs[:, crop_y:crop_y + self.crop_h,
                            crop_x:crop_x + self.crop_w, :]
            targets = targets[:, crop_y:crop_y + self.crop_h,
                              crop_x:crop_x + self.crop_w, :]
            assert masks is None and resids is None, \
                "Cropping for masks/resids not implemented"
        return inputs, targets, masks, resids
