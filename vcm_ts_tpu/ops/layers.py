"""Core conv building blocks (Flax, NHWC) for the codec models.

TPU-native equivalents of the reference's layer zoo:
- conv3x3/conv1x1/subpel convs (DCVC_HEM/src/layers/layers.py:18-39)
- ResidualBlock{,WithStride,Upsample} (layers.py:42-127)
- ResBlock / SELayer / ConvBlockResidual / UNet / MEBasic
  (DCVC_HEM/src/models/video_net.py:74-223)

Conventions:
- NHWC data layout (TPU-native); channels last everywhere.
- Explicit torch-equivalent padding (k//2 per side) so strided convs produce
  identical shapes/values to the reference for ported weights.
- Parameterized children are named with the reference's state-dict path
  segments ("0", "conv1", "fc"...) so weight import is a mechanical
  OIHW->HWIO transpose keyed by identical paths.
- Default init: Xavier-normal with gain sqrt(2), bias 0.01, matching
  CompressionModel._initialize_weights (common_model.py:31-36).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# Xavier normal with gain sqrt(2): std = sqrt(2) * sqrt(2 / (fan_in+fan_out)).
kernel_init = jax.nn.initializers.variance_scaling(2.0, "fan_avg", "normal")
bias_init = jax.nn.initializers.constant(0.01)


def conv(features: int, kernel: int = 3, stride: int = 1) -> partial:
    """Factory for a torch-Conv2d-equivalent NHWC conv (explicit padding)."""
    pad = kernel // 2
    return partial(
        nn.Conv,
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        kernel_init=kernel_init,
        bias_init=bias_init,
    )


def pixel_shuffle(x, r: int):
    """Depth-to-space with torch.nn.PixelShuffle channel ordering.

    torch: out[c, h*r+dy, w*r+dx] = in[c*r*r + dy*r + dx, h, w]; here in NHWC.
    """
    n, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(n, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * r, w * r, c)


def leaky_relu(slope: float):
    return partial(jax.nn.leaky_relu, negative_slope=slope)


class Seq(nn.Module):
    """Sequential container; parameterized parts carry torch-style names.

    `parts` elements are either (name, module_factory) pairs — the factory is
    a functools.partial over a Module class — or plain activation callables.
    """

    parts: Tuple[Any, ...]

    @nn.compact
    def __call__(self, x):
        for p in self.parts:
            if isinstance(p, tuple):
                name, ctor = p
                x = ctor(name=name)(x)
            else:
                x = p(x)
        return x


class SubpelConv(nn.Module):
    """Conv + PixelShuffle upsampler (layers.py:23-34). Child conv named "0"
    to line up with torch's nn.Sequential indexing."""

    features: int
    r: int = 1
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        x = conv(self.features * self.r ** 2, self.kernel)(name="0")(x)
        return pixel_shuffle(x, self.r)


class ResidualBlock(nn.Module):
    """Two 3x3 convs + identity (layers.py:104-127)."""

    features: int
    slope: float = 0.01

    @nn.compact
    def __call__(self, x):
        out = conv(self.features)(name="conv1")(x)
        out = jax.nn.leaky_relu(out, self.slope)
        out = conv(self.features)(name="conv2")(out)
        out = jax.nn.leaky_relu(out, self.slope)
        return x + out


class ResidualBlockWithStride(nn.Module):
    """Strided residual downsampler (layers.py:42-73)."""

    features: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        out = conv(self.features, 3, self.stride)(name="conv1")(x)
        out = jax.nn.leaky_relu(out, 0.01)
        out = conv(self.features)(name="conv2")(out)
        out = jax.nn.leaky_relu(out, 0.1)
        if self.stride != 1:
            identity = conv(self.features, 1, self.stride)(name="downsample")(x)
        else:
            identity = x
        return out + identity


class ResidualBlockUpsample(nn.Module):
    """Subpixel-upsampling residual block (layers.py:76-101)."""

    features: int
    r: int = 2

    @nn.compact
    def __call__(self, x):
        out = SubpelConv(self.features, self.r, kernel=1, name="subpel_conv")(x)
        out = jax.nn.leaky_relu(out, 0.01)
        out = conv(self.features)(name="conv")(out)
        out = jax.nn.leaky_relu(out, 0.1)
        identity = SubpelConv(self.features, self.r, kernel=1, name="upsample")(x)
        return out + identity


class ResBlock(nn.Module):
    """video_net.py:74-96 residual block with optional bottleneck and
    relu placement flags; slope < 1e-4 degrades to plain ReLU."""

    features: int
    slope: float = 0.01
    start_from_relu: bool = True
    end_with_relu: bool = False
    bottleneck: bool = False

    @nn.compact
    def __call__(self, x):
        slope = 0.0 if self.slope < 0.0001 else self.slope

        def act(v):
            return jax.nn.leaky_relu(v, slope) if slope > 0 else jax.nn.relu(v)

        mid = self.features // 2 if self.bottleneck else self.features
        out = act(x) if self.start_from_relu else x
        out = conv(mid)(name="conv1")(out)
        out = act(out)
        out = conv(self.features)(name="conv2")(out)
        if self.end_with_relu:
            out = act(out)
        return x + out


class SELayer(nn.Module):
    """Squeeze-and-excitation (video_net.py:149-162)."""

    features: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2))
        y = Seq(parts=(
            ("0", partial(nn.Dense, self.features // self.reduction,
                          use_bias=False, kernel_init=kernel_init)),
            jax.nn.relu,
            ("2", partial(nn.Dense, self.features, use_bias=False,
                          kernel_init=kernel_init)),
            jax.nn.sigmoid,
        ), name="fc")(y)
        return x * y[:, None, None, :]


class ConvBlockResidual(nn.Module):
    """Conv-conv-SE with a 1x1 shortcut (video_net.py:165-179)."""

    features: int
    se_layer: bool = True

    @nn.compact
    def __call__(self, x):
        parts = [
            ("0", conv(self.features)),
            leaky_relu(0.01),
            ("2", conv(self.features)),
        ]
        if self.se_layer:
            parts.append(("3", partial(SELayer, self.features)))
        x1 = Seq(parts=tuple(parts), name="conv")(x)
        x2 = conv(self.features, 1)(name="up_dim")(x)
        return x1 + x2


class UNet(nn.Module):
    """Two-level UNet with SE conv blocks (video_net.py:182-223)."""

    features: int = 64  # out channels

    @nn.compact
    def __call__(self, x):
        from .resize import max_pool2

        x1 = ConvBlockResidual(32, name="conv1")(x)
        x2 = max_pool2(x1)
        x2 = ConvBlockResidual(64, name="conv2")(x2)
        x3 = max_pool2(x2)
        x3 = ConvBlockResidual(128, name="conv3")(x3)
        x3 = Seq(parts=(
            ("0", partial(ResBlock, 128, slope=0.0)),
            ("1", partial(ResBlock, 128, slope=0.0)),
            ("2", partial(ResBlock, 128, slope=0.0)),
            ("3", partial(ResBlock, 128, slope=0.0)),
        ), name="context_refine")(x3)

        d3 = SubpelConv(64, 2, kernel=1, name="up3")(x3)
        d3 = jnp.concatenate([x2, d3], axis=-1)
        d3 = ConvBlockResidual(64, name="up_conv3")(d3)

        d2 = SubpelConv(32, 2, kernel=1, name="up2")(d3)
        d2 = jnp.concatenate([x1, d2], axis=-1)
        d2 = ConvBlockResidual(self.features, name="up_conv2")(d2)
        return d2


class MEBasic(nn.Module):
    """One SpyNet pyramid level: five 7x7 convs (video_net.py:99-115)."""

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(conv(32, 7)(name="conv1")(x))
        x = jax.nn.relu(conv(64, 7)(name="conv2")(x))
        x = jax.nn.relu(conv(32, 7)(name="conv3")(x))
        x = jax.nn.relu(conv(16, 7)(name="conv4")(x))
        return conv(2, 7)(name="conv5")(x)


def enc_dec_models(input_ch: int, output_ch: int, ch: int):
    """Autoencoder stacks used by the MV codec and the intra codec
    (video_net.py:226-248). Returns (enc_factory, dec_factory) partials whose
    children are named with torch Sequential indices."""
    enc = partial(Seq, parts=(
        ("0", partial(ResidualBlockWithStride, ch, 2)),
        ("1", partial(ResidualBlock, ch)),
        ("2", partial(ResidualBlockWithStride, ch, 2)),
        ("3", partial(ResidualBlock, ch)),
        ("4", partial(ResidualBlockWithStride, ch, 2)),
        ("5", partial(ResidualBlock, ch)),
        ("6", conv(ch, 3, 2)),
    ))
    dec = partial(Seq, parts=(
        ("0", partial(ResidualBlock, ch)),
        ("1", partial(ResidualBlockUpsample, ch, 2)),
        ("2", partial(ResidualBlock, ch)),
        ("3", partial(ResidualBlockUpsample, ch, 2)),
        ("4", partial(ResidualBlock, ch)),
        ("5", partial(ResidualBlockUpsample, ch, 2)),
        ("6", partial(ResidualBlock, ch)),
        ("7", partial(SubpelConv, output_ch, 2, 1)),
    ))
    return enc, dec


def hyper_enc_dec_models(y_ch: int, z_ch: int):
    """Hyper-prior autoencoder stacks (video_net.py:251-276)."""
    enc = partial(Seq, parts=(
        ("0", conv(z_ch, 3)),
        leaky_relu(0.01),
        ("2", conv(z_ch, 3)),
        leaky_relu(0.01),
        ("4", conv(z_ch, 3, 2)),
        leaky_relu(0.01),
        ("6", conv(z_ch, 3)),
        leaky_relu(0.01),
        ("8", conv(z_ch, 3, 2)),
    ))
    dec = partial(Seq, parts=(
        ("0", conv(y_ch, 3)),
        leaky_relu(0.01),
        ("2", partial(SubpelConv, y_ch, 2, 1)),
        leaky_relu(0.01),
        ("4", conv(y_ch * 3 // 2, 3)),
        leaky_relu(0.01),
        ("6", partial(SubpelConv, y_ch * 3 // 2, 2, 1)),
        leaky_relu(0.01),
        ("8", conv(y_ch * 2, 3)),
    ))
    return enc, dec
