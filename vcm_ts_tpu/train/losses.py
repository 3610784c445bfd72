"""Task-aware perceptual losses.

TPU-native equivalents of the reference's detector-feature distances
(core/engine/losses.py:8-239):

- FasterRCNNResNetPerceptualLoss: 5 ResNet-50 slices, channel-normalized
  features, 224x224 resize (losses.py:8-101)
- FasterRCNNFPNPerceptualLoss: FPN pyramid features 0/1/2/3/pool
  (losses.py:104-165)
- YOLOv8 variant: requires the ultralytics graph to even deserialize its
  weights, so it is gated (see get_perceptual_loss).

The backbones are re-implemented in Flax (NHWC, frozen eval-mode BatchNorm)
with torchvision-compatible parameter naming so the reference's
`pretrained/fasterrcnn_resnet50_fpn_v2_coco-dd69338a.pth` imports directly
through utils/weight_import (torch.load of that file needs only torch).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.layers import Seq


class FrozenBatchNorm(nn.Module):
    """Eval-mode BatchNorm with imported running statistics; all parameters
    are frozen buffers (the perceptual net never trains)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        ones = nn.initializers.ones
        zeros = nn.initializers.zeros
        gamma = self.param("weight", ones, (self.features,))
        beta = self.param("bias", zeros, (self.features,))
        mean = self.param("running_mean", zeros, (self.features,))
        var = self.param("running_var", ones, (self.features,))
        inv = gamma * jax.lax.rsqrt(var + self.eps)
        return x * inv + (beta - mean * inv)


def _conv(features, kernel, stride=1, use_bias=False):
    pad = kernel // 2
    return partial(nn.Conv, features=features, kernel_size=(kernel, kernel),
                   strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)), use_bias=use_bias)


class Bottleneck(nn.Module):
    """torchvision ResNet bottleneck (expansion 4)."""

    width: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        out = _conv(self.width, 1)(name="conv1")(x)
        out = FrozenBatchNorm(self.width, name="bn1")(out)
        out = jax.nn.relu(out)
        out = _conv(self.width, 3, self.stride)(name="conv2")(out)
        out = FrozenBatchNorm(self.width, name="bn2")(out)
        out = jax.nn.relu(out)
        out = _conv(self.width * 4, 1)(name="conv3")(out)
        out = FrozenBatchNorm(self.width * 4, name="bn3")(out)
        if self.downsample:
            identity = Seq(parts=(
                ("0", _conv(self.width * 4, 1, self.stride)),
                ("1", partial(FrozenBatchNorm, self.width * 4)),
            ), name="downsample")(x)
        else:
            identity = x
        return jax.nn.relu(out + identity)


def _layer(width, blocks, stride):
    parts = [("0", partial(Bottleneck, width, stride, True))]
    parts += [(str(i), partial(Bottleneck, width))
              for i in range(1, blocks)]
    return partial(Seq, parts=tuple(parts))


class ResNet50Body(nn.Module):
    """torchvision resnet50 trunk; returns the 5 slice outputs the reference
    perceptual loss taps (losses.py:16-27)."""

    @nn.compact
    def __call__(self, x):
        from ..ops.resize import max_pool2

        f = _conv(64, 7, 2)(name="conv1")(x)
        f = FrozenBatchNorm(64, name="bn1")(f)
        f1 = jax.nn.relu(f)
        # torch maxpool k3 s2 p1
        f = jnp.pad(f1, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        f = jax.lax.reduce_window(f, -jnp.inf, jax.lax.max,
                                  (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
        f2 = _layer(64, 3, 1)(name="layer1")(f)
        f3 = _layer(128, 4, 2)(name="layer2")(f2)
        f4 = _layer(256, 6, 2)(name="layer3")(f3)
        f5 = _layer(512, 3, 2)(name="layer4")(f4)
        return {"1": f1, "2": f2, "3": f3, "4": f4, "5": f5}


class FPN(nn.Module):
    """torchvision FPN v2 head (Conv2dNormActivation inner/layer blocks +
    LastLevelMaxPool)."""

    out_channels: int = 256

    @nn.compact
    def __call__(self, feats):  # feats: dict {"2","3","4","5"} C2..C5
        names = ["2", "3", "4", "5"]
        inner = []
        for i, n in enumerate(names):
            blk = Seq(parts=(
                ("0", _conv(self.out_channels, 1)),
                ("1", partial(FrozenBatchNorm, self.out_channels)),
            ), name=f"inner_blocks.{i}")
            inner.append(blk(feats[n]))
        outs = [None] * 4
        last = inner[-1]
        outs[3] = last
        for i in range(2, -1, -1):
            up = jax.image.resize(last, inner[i].shape, "nearest")
            last = inner[i] + up
            outs[i] = last
        results = {}
        for i in range(4):
            blk = Seq(parts=(
                ("0", _conv(self.out_channels, 3)),
                ("1", partial(FrozenBatchNorm, self.out_channels)),
            ), name=f"layer_blocks.{i}")
            results[str(i)] = blk(outs[i])
        pool = jax.lax.reduce_window(
            results["3"], -jnp.inf, jax.lax.max, (1, 1, 1, 1), (1, 2, 2, 1),
            "VALID")
        results["pool"] = pool
        return results


_IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
_IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def _normalize_features(f, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(f ** 2, axis=-1, keepdims=True))
    return f / (norm + eps)


def _prep(x, resize):
    x = jnp.clip(x, 0, 1)
    x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
    if resize:
        n = x.shape[0]
        x = jax.image.resize(x, (n, 224, 224, 3), "bilinear", antialias=False)
    return x


class FasterRCNNResNetPerceptualLoss(nn.Module):
    """(losses.py:8-101); parameters live under child name "body" so torch
    keys `backbone.body.*` import directly."""

    @nn.compact
    def __call__(self, input, target, resize: bool = True,
                 feature_layers: Sequence[str] = ("1", "2", "3", "4", "5")):
        body = ResNet50Body(name="body")
        fs_in = body(_prep(input, resize))
        fs_tg = body(_prep(target, resize))
        losses = []
        for key in fs_in.keys():
            if key in feature_layers:
                a = _normalize_features(fs_in[key])
                b = _normalize_features(fs_tg[key])
                losses.append(jnp.mean((a - b) ** 2, axis=(1, 2, 3)))
        return jnp.sum(jnp.stack(losses), axis=0)


class FasterRCNNFPNPerceptualLoss(nn.Module):
    """(losses.py:104-165)"""

    @nn.compact
    def __call__(self, input, target, resize: bool = True,
                 feature_layers: Sequence[str] = ("0", "1", "2", "3", "pool")):
        body = ResNet50Body(name="body")
        fpn = FPN(name="fpn")

        def feats(x):
            f = body(_prep(x, resize))
            return fpn({k: f[k] for k in ("2", "3", "4", "5")})

        fs_in = feats(input)
        fs_tg = feats(target)
        losses = []
        for key in fs_in.keys():
            if key in feature_layers:
                a = _normalize_features(fs_in[key])
                b = _normalize_features(fs_tg[key])
                losses.append(jnp.mean((a - b) ** 2, axis=(1, 2, 3)))
        return jnp.sum(jnp.stack(losses), axis=0)


def get_perceptual_loss(cfg) -> Optional[callable]:
    """Factory (dcvc_hem.py:44-57): returns pl_fn(target, decoded) -> (N,)
    or None when the configured backbone/weights are unavailable."""
    import os

    logger = logging.getLogger("CORE")
    kind = cfg.SOLVER.PL_MODEL
    weights = "pretrained/fasterrcnn_resnet50_fpn_v2_coco-dd69338a.pth"

    if kind in ("resnet", "fpn"):
        model = (FasterRCNNResNetPerceptualLoss() if kind == "resnet"
                 else FasterRCNNFPNPerceptualLoss())
        x0 = jnp.zeros((1, 64, 64, 3))
        params = model.init(jax.random.PRNGKey(0), x0, x0)
        if os.path.exists(weights):
            from ..utils.weight_import import (import_state_dict,
                                               load_torch_state_dict)
            sd = load_torch_state_dict(weights)
            # flax children are named body/fpn, matching backbone.{body,fpn}.*
            sd = {k[len("backbone."):]: v for k, v in sd.items()
                  if k.startswith("backbone.")}
            if kind == "resnet":
                sd = {k: v for k, v in sd.items() if k.startswith("body.")}
            params = import_state_dict(params, sd, strict="cover")
        else:
            logger.warning(
                "Perceptual-loss weights '%s' not found; using random "
                "init (feature distance still provides a smoothness "
                "prior, but download the checkpoint for the reference "
                "behavior)", weights)
        layers = tuple(cfg.SOLVER.PL_LAYERS)

        def pl_fn(target, decoded):
            return model.apply(params, decoded, target,
                               feature_layers=layers)

        return pl_fn

    if kind == "yolo":
        from .yolo_v8 import YOLOV8PerceptualLoss, import_yolo_weights

        model = YOLOV8PerceptualLoss()
        x0 = jnp.zeros((1, 64, 64, 3))
        params = model.init(jax.random.PRNGKey(0), x0, x0)
        yolo_weights = "pretrained/yolov8m.pt"
        if os.path.exists(yolo_weights):
            params = import_yolo_weights(params, yolo_weights)
        else:
            logger.warning(
                "Perceptual-loss weights '%s' not found; using random init",
                yolo_weights)
        layers = tuple(cfg.SOLVER.PL_LAYERS)

        def pl_fn(target, decoded):
            return model.apply(params, target, decoded,
                               feature_layers=layers)

        return pl_fn
    raise ValueError(f"Invalid perceptual loss: {kind}")
