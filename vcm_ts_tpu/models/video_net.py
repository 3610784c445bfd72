"""Video-model submodules: SpyNet motion estimation and the DMC conv stacks.

TPU-native equivalents of the reference's
DCVC_HEM/src/models/video_net.py:99-146 (ME_Spynet/MEBasic) and
video_model.py:17-128 (FeatureExtractor, MultiScaleContextFusion,
ContextualEncoder/Decoder, ReconGeneration). NHWC Flax modules; child names
mirror reference state-dict paths.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp
from flax import linen as nn

from ..ops.layers import MEBasic, ResBlock, SubpelConv, UNet, conv
from ..ops.resize import avg_pool2, bilinear_up2
from ..ops.warp import flow_warp


class MESpynet(nn.Module):
    """Coarse-to-fine 4-level SpyNet (video_net.py:118-146)."""

    levels: int = 4
    fast_warp: bool = False  # two-pass Pallas warp (see ops/warp_pallas.py)

    def _warp(self, im, flow, level):
        if self.fast_warp:
            from ..ops.warp_pallas import flow_warp_pallas
            # displacement bound shrinks with pyramid level resolution
            return flow_warp_pallas(im, flow, max_disp=max(4, 16 >> level))
        return flow_warp(im, flow)

    def setup(self):
        self.moduleBasic = [MEBasic(name=f"moduleBasic.{i}")
                            for i in range(self.levels)]

    def __call__(self, im1, im2):
        im1_list = [im1]
        im2_list = [im2]
        for _ in range(self.levels - 1):
            im1_list.append(avg_pool2(im1_list[-1]))
            im2_list.append(avg_pool2(im2_list[-1]))

        n, h_c, w_c, _ = im2_list[-1].shape
        flow = jnp.zeros((n, h_c // 2, w_c // 2, 2), im1.dtype)
        for level in range(self.levels):
            flow_up = bilinear_up2(flow) * 2.0
            img_index = self.levels - 1 - level
            flow = flow_up + self.moduleBasic[level](
                jnp.concatenate([im1_list[img_index],
                                 self._warp(im2_list[img_index], flow_up,
                                            img_index),
                                 flow_up], axis=-1))
        return flow


class FeatureExtractor(nn.Module):
    """3-scale conv+ResBlock pyramid (video_model.py:17-37)."""

    channel: int = 64

    @nn.compact
    def __call__(self, feature):
        layer1 = conv(self.channel)(name="conv1")(feature)
        layer1 = ResBlock(self.channel, name="res_block1")(layer1)
        layer2 = conv(self.channel, 3, 2)(name="conv2")(layer1)
        layer2 = ResBlock(self.channel, name="res_block2")(layer2)
        layer3 = conv(self.channel, 3, 2)(name="conv3")(layer2)
        layer3 = ResBlock(self.channel, name="res_block3")(layer3)
        return layer1, layer2, layer3


class MultiScaleContextFusion(nn.Module):
    """Cross-scale context mixer (video_model.py:40-68)."""

    channel: int = 64

    @nn.compact
    def __call__(self, context1, context2, context3):
        c = self.channel
        c3_up = SubpelConv(c, 2, kernel=3, name="conv3_up")(context3)
        c3_up = ResBlock(c, name="res_block3_up")(c3_up)
        c3_out = conv(c)(name="conv3_out")(context3)
        c3_out = ResBlock(c, name="res_block3_out")(c3_out)
        cat32 = jnp.concatenate((c3_up, context2), axis=-1)
        c2_up = SubpelConv(c, 2, kernel=3, name="conv2_up")(cat32)
        c2_up = ResBlock(c, name="res_block2_up")(c2_up)
        c2_out = conv(c)(name="conv2_out")(cat32)
        c2_out = ResBlock(c, name="res_block2_out")(c2_out)
        cat21 = jnp.concatenate((c2_up, context1), axis=-1)
        c1_out = conv(c)(name="conv1_out")(cat21)
        c1_out = ResBlock(c, name="res_block1_out")(c1_out)
        return context1 + c1_out, context2 + c2_out, context3 + c3_out


class ContextualEncoder(nn.Module):
    """x + multi-scale contexts -> latent y (video_model.py:71-90)."""

    channel_N: int = 64
    channel_M: int = 96

    @nn.compact
    def __call__(self, x, context1, context2, context3):
        n = self.channel_N
        res = partial(ResBlock, n * 2, bottleneck=True, slope=0.1,
                      start_from_relu=True, end_with_relu=True)
        f = conv(n, 3, 2)(name="conv1")(jnp.concatenate([x, context1], axis=-1))
        f = res(name="res1")(jnp.concatenate([f, context2], axis=-1))
        f = conv(n, 3, 2)(name="conv2")(f)
        f = res(name="res2")(jnp.concatenate([f, context3], axis=-1))
        f = conv(n, 3, 2)(name="conv3")(f)
        return conv(self.channel_M, 3, 2)(name="conv4")(f)


class ContextualDecoder(nn.Module):
    """latent y + contexts -> 32-ch recon features (video_model.py:93-112)."""

    channel_N: int = 64
    channel_M: int = 96

    @nn.compact
    def __call__(self, x, context2, context3):
        n = self.channel_N
        res = partial(ResBlock, n * 2, bottleneck=True, slope=0.1,
                      start_from_relu=True, end_with_relu=True)
        f = SubpelConv(n, 2, kernel=3, name="up1")(x)
        f = SubpelConv(n, 2, kernel=3, name="up2")(f)
        f = res(name="res1")(jnp.concatenate([f, context3], axis=-1))
        f = SubpelConv(n, 2, kernel=3, name="up3")(f)
        f = res(name="res2")(jnp.concatenate([f, context2], axis=-1))
        return SubpelConv(32, 2, kernel=3, name="up4")(f)


class ReconGeneration(nn.Module):
    """Context + recon features -> frame, via 2 UNets (video_model.py:115-128)."""

    channel: int = 64

    @nn.compact
    def __call__(self, ctx, res):
        f = conv(self.channel)(name="first_conv")(
            jnp.concatenate((ctx, res), axis=-1))
        f = UNet(self.channel, name="unet_1")(f)
        f = UNet(self.channel, name="unet_2")(f)
        recon = conv(3)(name="recon_conv")(f)
        return f, recon
