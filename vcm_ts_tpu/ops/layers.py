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

import os
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


_FAST_SHUFFLE = os.environ.get("VCM_FAST_SHUFFLE", "0") == "1"


def set_fast_shuffle(on: bool) -> None:
    """Route every SubpelConv through the Pallas subpel kernels
    (ops/subpel_pallas.py): k-major weight permutation + one-pass DMA
    relayout (kernel=3 sites) or the fully fused 1x1-conv+shuffle MXU
    kernel. EXACT math (pure relayout / same f32-accumulated dot) — unlike
    the quality-gated fast-warp — and differentiable (the kernels carry
    custom VJPs), so it composes with training too. Takes effect at the
    next trace (new jit or cache miss); also settable via env
    VCM_FAST_SHUFFLE=1."""
    global _FAST_SHUFFLE
    _FAST_SHUFFLE = bool(on)


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


class _ConvParams(nn.Module):
    """Bare parameter holder with nn.Conv's names/shapes/inits, so the
    fast-shuffle path can hand the weights to a Pallas kernel while staying
    checkpoint-interchangeable with the plain nn.Conv child."""

    cin: int
    cout: int
    k: int

    @nn.compact
    def __call__(self):
        w = self.param("kernel", kernel_init,
                       (self.k, self.k, self.cin, self.cout))
        b = self.param("bias", bias_init, (self.cout,))
        return w, b


class SubpelConv(nn.Module):
    """Conv + PixelShuffle upsampler (layers.py:23-34). Child conv named "0"
    to line up with torch's nn.Sequential indexing.

    With set_fast_shuffle(True), routes through ops/subpel_pallas: the conv
    weights are permuted to k-major channel order (trace-time transpose) and
    the depth-to-space becomes a one-pass DMA relayout; 1x1 convs fuse the
    MXU dot into the same kernel so the pre-shuffle tensor never hits HBM."""

    features: int
    r: int = 1
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        if not _FAST_SHUFFLE or self.r == 1:
            x = conv(self.features * self.r ** 2, self.kernel)(name="0")(x)
            return pixel_shuffle(x, self.r)

        from .subpel_pallas import (permute_out_channels,
                                    pixel_shuffle_relayout, subpel_conv1x1)

        cin = x.shape[-1]
        cout = self.features * self.r ** 2
        w, b = _ConvParams(cin, cout, self.kernel, name="0")()
        # match nn.Conv(dtype=None) promote_dtype semantics: compute in the
        # promoted dtype (f32 params + bf16 input -> f32), not x.dtype —
        # downcasting the weights would silently change mixed-precision
        # numerics and the output dtype vs the plain path
        dt = jnp.promote_types(x.dtype, w.dtype)
        x = x.astype(dt)
        wp = permute_out_channels(w.astype(dt), self.r)
        bp = permute_out_channels(b.astype(dt), self.r)
        interp = jax.default_backend() == "cpu"  # CPU tests: interpret mode
        if self.kernel == 1:
            wk = wp.reshape(cin, self.r ** 2, self.features)
            wk = wk.transpose(1, 0, 2)  # (r*r, Cin, C)
            bk = bp.reshape(self.r ** 2, self.features)
            return subpel_conv1x1(x, wk, bk, self.r, interpret=interp)
        pad = self.kernel // 2
        y = jax.lax.conv_general_dilated(
            x, wp, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bp
        return pixel_shuffle_relayout(y, self.r, interpret=interp)


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
        # global mean as an MXU contraction: XLA's fused reduce over the
        # (HW, C) plane runs at ~110 GB/s on v5e (2.4 ms at 1080p); a
        # ones-vector dot streams 1.7x faster. One algorithm for every
        # batch size (batched einsum, f32 accumulate) so single-frame and
        # batched codec paths produce identical DPBs — SE feeds the recon
        # UNets, and a per-n reduction-order difference would desync
        # chained rANS streams across compress()/compress_batch().
        n, h, w, c = x.shape
        ones = jnp.ones((h * w,), x.dtype)
        y = (jnp.einsum("s,nsc->nc", ones, x.reshape(n, h * w, c),
                        preferred_element_type=jnp.float32)
             / (h * w)).astype(x.dtype)
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


class Conv2dParams(nn.Module):
    """Bare conv parameters (kernel HWIO + bias) without an op, so callers
    can route the math through shape-specialized implementations while the
    param tree stays identical to nn.Conv (same names, shapes, inits)."""

    features: int
    in_features: int
    kernel: int = 7

    @nn.compact
    def __call__(self):
        k = self.param("kernel", kernel_init,
                       (self.kernel, self.kernel, self.in_features,
                        self.features))
        b = self.param("bias", bias_init, (self.features,))
        return k, b


def _conv_same(x, k, b):
    # promote like nn.Conv: mixed input/param dtypes meet at the wider one
    # (the codec's decode stages carry f32 symbol planes through bf16 params)
    dt = jnp.promote_types(x.dtype, k.dtype)
    pad = k.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x.astype(dt), k.astype(dt), (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b.astype(dt)


def _conv_same_cout_padded(x, k, b, pad_to: int):
    """Same conv, output channels zero-padded to `pad_to` then sliced.

    XLA:TPU picks a pathological space-to-batch lowering for wide-in /
    narrow-out 7x7 convs (64->32 at 1080p: 26.7 ms standalone); the same
    conv padded to 64 outputs runs at 19.7 ms despite 2x the FLOPs."""
    cout = k.shape[-1]
    if pad_to <= cout or jax.default_backend() != "tpu":
        return _conv_same(x, k, b)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, pad_to - cout)))
    bp = jnp.pad(b, (0, pad_to - cout))
    return _conv_same(x, kp, bp)[..., :cout]


def _conv_same_im2col_dot(x, k, b):
    """Same conv as 7 shifted (HW, 7*Cin) x (7*Cin, Cout) matmuls.

    For nearly-scalar output widths (the SpyNet flow head's 16->2) XLA's
    conv lowering is launch-bound (22.4 ms standalone at 1080p); the
    explicit im2col contraction runs in 8.9 ms."""
    if jax.default_backend() != "tpu":
        return _conv_same(x, k, b)
    dt = jnp.promote_types(x.dtype, k.dtype)
    x, k = x.astype(dt), k.astype(dt)
    n, h, w, cin = x.shape
    ks = k.shape[0]
    p = ks // 2
    cout = k.shape[-1]
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    cols = jnp.concatenate([xp[:, :, i:i + w, :] for i in range(ks)],
                           axis=-1)                 # (n, h+2p, w, ks*cin)
    kk = k.reshape(ks, ks * cin, cout)              # [ky][(kx, ci)]
    acc = jnp.zeros((n, h, w, cout), jnp.float32)
    for ky in range(ks):
        a = cols[:, ky:ky + h].reshape(n * h * w, ks * cin)
        acc = acc + jnp.dot(a, kk[ky],
                            preferred_element_type=jnp.float32
                            ).reshape(n, h, w, cout)
    return (acc + b.astype(jnp.float32)).astype(x.dtype)


class MEBasic(nn.Module):
    """One SpyNet pyramid level: five 7x7 convs (video_net.py:99-115).

    conv1/conv2/conv4 use XLA's conv; conv3 and conv5 route through
    shape-specialized forms (see helpers above) that are faster for their
    wide-in/narrow-out shapes on TPU. Parameters are identical to the plain
    nn.Conv stack (Conv2dParams), so weight import is unchanged."""

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k1, b1 = Conv2dParams(32, cin, name="conv1")()
        k2, b2 = Conv2dParams(64, 32, name="conv2")()
        k3, b3 = Conv2dParams(32, 64, name="conv3")()
        k4, b4 = Conv2dParams(16, 32, name="conv4")()
        k5, b5 = Conv2dParams(2, 16, name="conv5")()
        x = jax.nn.relu(_conv_same(x, k1, b1))
        x = jax.nn.relu(_conv_same(x, k2, b2))
        x = jax.nn.relu(_conv_same_cout_padded(x, k3, b3, pad_to=64))
        x = jax.nn.relu(_conv_same(x, k4, b4))
        return _conv_same_im2col_dot(x, k5, b5)


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
