"""YOLOv8(m) backbone+neck in Flax for the YOLO perceptual loss.

Completes the reference's third perceptual-loss family
(core/engine/losses.py:168-239): feature taps at graph layers
[0, 1, 3, 5, 7, 15, 18, 21] of the ultralytics YOLOv8 DetectionModel
(backbone P1-P5 convs and the three neck C2f outputs), raw MSE over taps,
inputs padded to a multiple of 32.

The graph is re-implemented from the public yolov8 architecture
(Conv = conv+BN+SiLU, C2f with split/dense bottlenecks, SPPF, nearest
upsample + concat neck) at the m scale (depth 0.67, width 0.75,
max_channels 768). Children are named with ultralytics state-dict segments
("0".."21", cv1/cv2/m.N/conv/bn), so `import_yolo_weights` is a mechanical
pass through utils/weight_import. Deserializing pretrained/yolov8m.pt no
longer needs the ultralytics package: a weights-only shim unpickler
(utils/weight_import.load_torch_pickle_weights_only) maps its ultralytics
class refs to opaque stand-ins and keeps the tensors.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..codec.bitstream import get_padding_size
from .losses import FrozenBatchNorm


class ConvBnSiLU(nn.Module):
    """ultralytics Conv: conv(bias=False) + BN + SiLU."""

    features: int
    kernel: int = 1
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)), use_bias=False,
                    name="conv")(x)
        x = FrozenBatchNorm(self.features, eps=1e-3, name="bn")(x)
        return jax.nn.silu(x)


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True

    @nn.compact
    def __call__(self, x):
        out = ConvBnSiLU(self.features, 3, name="cv1")(x)
        out = ConvBnSiLU(self.features, 3, name="cv2")(out)
        return x + out if self.shortcut else out


class C2f(nn.Module):
    features: int
    n: int = 1
    shortcut: bool = False

    @nn.compact
    def __call__(self, x):
        c_ = self.features // 2
        y = ConvBnSiLU(2 * c_, 1, name="cv1")(x)
        parts = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            parts.append(Bottleneck(c_, self.shortcut, name=f"m.{i}")(
                parts[-1]))
        return ConvBnSiLU(self.features, 1, name="cv2")(
            jnp.concatenate(parts, axis=-1))


class SPPF(nn.Module):
    features: int
    pool: int = 5

    @nn.compact
    def __call__(self, x):
        c_ = x.shape[-1] // 2
        x = ConvBnSiLU(c_, 1, name="cv1")(x)
        k = self.pool
        pad = k // 2

        def mp(v):
            v = jnp.pad(v, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                        constant_values=-jnp.inf)
            return jax.lax.reduce_window(v, -jnp.inf, jax.lax.max,
                                         (1, k, k, 1), (1, 1, 1, 1), "VALID")

        y1 = mp(x)
        y2 = mp(y1)
        y3 = mp(y2)
        return ConvBnSiLU(self.features, 1, name="cv2")(
            jnp.concatenate([x, y1, y2, y3], axis=-1))


def _up2(x):
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * 2, w * 2, c), "nearest")


class YOLOv8Backbone(nn.Module):
    """DetectionModel graph minus the Detect head; returns the perceptual-
    loss taps keyed as in the reference (losses.py:195-204)."""

    width: float = 0.75   # m scale
    depth: float = 0.67
    max_channels: int = 768

    def _c(self, ch):
        return min(int(round(ch * self.width)), self.max_channels)

    def _n(self, n):
        return max(int(round(n * self.depth)), 1)

    @nn.compact
    def __call__(self, x):
        c, d = self._c, self._n
        taps = {}
        x0 = ConvBnSiLU(c(64), 3, 2, name="0")(x)
        taps["1"] = x0
        x1 = ConvBnSiLU(c(128), 3, 2, name="1")(x0)
        taps["2"] = x1
        x2 = C2f(c(128), d(3), True, name="2")(x1)
        x3 = ConvBnSiLU(c(256), 3, 2, name="3")(x2)
        taps["3"] = x3
        x4 = C2f(c(256), d(6), True, name="4")(x3)
        x5 = ConvBnSiLU(c(512), 3, 2, name="5")(x4)
        taps["4"] = x5
        x6 = C2f(c(512), d(6), True, name="6")(x5)
        x7 = ConvBnSiLU(c(1024), 3, 2, name="7")(x6)
        taps["5"] = x7
        x8 = C2f(c(1024), d(3), True, name="8")(x7)
        x9 = SPPF(c(1024), name="9")(x8)
        # neck
        x12 = C2f(c(512), d(3), False, name="12")(
            jnp.concatenate([_up2(x9), x6], axis=-1))
        x15 = C2f(c(256), d(3), False, name="15")(
            jnp.concatenate([_up2(x12), x4], axis=-1))
        taps["3_deep"] = x15
        x16 = ConvBnSiLU(c(256), 3, 2, name="16")(x15)
        x18 = C2f(c(512), d(3), False, name="18")(
            jnp.concatenate([x16, x12], axis=-1))
        taps["4_deep"] = x18
        x19 = ConvBnSiLU(c(512), 3, 2, name="19")(x18)
        x21 = C2f(c(1024), d(3), False, name="21")(
            jnp.concatenate([x19, x9], axis=-1))
        taps["5_deep"] = x21
        return taps


class YOLOV8PerceptualLoss(nn.Module):
    """(losses.py:168-239): pad to /32, tap 8 features, raw MSE sum."""

    width: float = 0.75
    depth: float = 0.67

    @nn.compact
    def __call__(self, target, input,
                 feature_layers: Sequence[str] = ("1", "2", "3", "4", "5",
                                                  "3_deep", "4_deep",
                                                  "5_deep")):
        input = jnp.clip(input, 0, 1)
        target = jnp.clip(target, 0, 1)
        _, h, w, _ = input.shape
        _, pr, _, pb = get_padding_size(h, w, p=32)
        if pr or pb:
            pad = ((0, 0), (0, pb), (0, pr), (0, 0))
            input = jnp.pad(input, pad)
            target = jnp.pad(target, pad)
        net = YOLOv8Backbone(self.width, self.depth, name="model")
        fs_in = net(input)
        fs_tg = net(target)
        losses = [jnp.mean((fs_in[k] - fs_tg[k]) ** 2, axis=(1, 2, 3))
                  for k in fs_in if k in feature_layers]
        return jnp.sum(jnp.stack(losses), axis=0)


def import_yolo_weights(params, weights_path: str):
    """Import pretrained/yolov8m.pt without needing ultralytics.

    The reference's load (core/engine/losses.py:168-176) requires the
    ultralytics package to even unpickle the checkpoint; here a shim
    unpickler (utils/weight_import.load_torch_pickle_weights_only) maps
    ultralytics class refs to opaque attribute bags and keeps the
    tensors, so the PL backbone runs with real weights in
    ultralytics-free environments. If ultralytics *is* importable, its
    loader is used as a cross-check-compatible fallback path.
    """
    from ..utils.weight_import import (extract_module_state_dict,
                                       import_state_dict,
                                       load_torch_pickle_weights_only)

    try:
        ckpt = load_torch_pickle_weights_only(weights_path)
        model = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
        if hasattr(model, "model") and not hasattr(model, "__dict__"):
            model = model.model
        sd = extract_module_state_dict(model)
    except Exception:
        # fallback: the ultralytics loader (original path)
        from ultralytics import YOLO
        sd = {k: v.detach().cpu().numpy()
              for k, v in YOLO(weights_path).model.state_dict().items()}
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()
          if not k.startswith("model.22.")  # drop the Detect head
          and not k.endswith("num_batches_tracked")}
    if not sd:
        raise RuntimeError(f"no tensors recovered from {weights_path}")
    return import_state_dict(params, sd, strict="cover")
