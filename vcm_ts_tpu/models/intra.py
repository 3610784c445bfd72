"""IntraNoAR — the I-frame (image) compression model.

TPU-native re-design of the reference IntraNoAR
(DCVC_HEM/src/models/image_model.py:16-200): hyperprior autoencoder (N=192)
with dual-spatial-prior checkerboard coding and a UNet refinement head.

Pure-functional Flax module over NHWC arrays. Device/host split: the
forward/compress paths are single jitted functions; decompression is staged
into three jitted methods around the host rANS reads (see codec/engine.py).
Child-module names mirror the reference state-dict paths for weight porting.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..entropy.bit_estimator import BitEstimator
from ..ops.layers import (Seq, UNet, conv, enc_dec_models,
                          hyper_enc_dec_models, leaky_relu)
from ..ops.math import add_uniform_noise, gaussian_bits, lower_bound
from . import common


def _prior_fusion(n: int):
    return Seq(parts=(
        ("0", conv(n * 3, 3)), leaky_relu(0.2),
        ("2", conv(n * 3, 3)), leaky_relu(0.2),
        ("4", conv(n * 3, 3)),
    ), name="y_prior_fusion")


def _spatial_prior(n: int):
    return Seq(parts=(
        ("0", conv(n * 3, 3)), leaky_relu(0.2),
        ("2", conv(n * 3, 3)), leaky_relu(0.2),
        ("4", conv(n * 2, 3)),
    ), name="y_spatial_prior")


class IntraNoAR(nn.Module):
    N: int = 192
    anchor_num: int = 4

    def setup(self):
        enc_f, dec_f = enc_dec_models(3, 16, self.N)
        self.enc = enc_f(name="enc")
        self.dec = dec_f(name="dec")
        self.refine = Seq(parts=(
            ("0", partial(UNet, 16)),
            ("1", conv(3, 3)),
        ), name="refine")
        he, hd = hyper_enc_dec_models(self.N, self.N)
        self.hyper_enc = he(name="hyper_enc")
        self.hyper_dec = hd(name="hyper_dec")
        self.y_prior_fusion = _prior_fusion(self.N)
        self.y_spatial_prior = _spatial_prior(self.N)
        self.q_basic = self.param(
            "q_basic", nn.initializers.ones, (1, 1, 1, self.N))
        self.q_scale = self.param(
            "q_scale", nn.initializers.ones, (self.anchor_num, 1, 1, 1))
        self.bit_estimator_z = BitEstimator(self.N, name="bit_estimator_z")

    @staticmethod
    def get_q_scales_from_ckpt(ckpt_path: str):
        """API parity with image_model.py:108-112; accepts .pth files."""
        from ..utils.weight_import import get_i_frame_q_scales_from_ckpt
        return get_i_frame_q_scales_from_ckpt(ckpt_path)

    # ------------------------------------------------------------------ util
    def get_curr_q(self, q_scale):
        return lower_bound(self.q_basic, 0.5) * q_scale

    def _fusion_params(self, z_hat):
        params = self.hyper_dec(z_hat)
        q_step, scales, means = jnp.split(
            self.y_prior_fusion(params), 3, axis=-1)
        return q_step, scales, means

    def _z_bits(self, z):
        probs = (self.bit_estimator_z(z + 0.5)
                 - self.bit_estimator_z(z - 0.5))
        from ..ops.math import probs_to_bits
        return probs_to_bits(probs)

    # --------------------------------------------------------------- forward
    def __call__(self, x, q_scale, training: bool = False,
                 noise_rng: Optional[jax.Array] = None):
        """Full differentiable forward with analytic bit costs
        (image_model.py:54-106)."""
        curr_q = self.get_curr_q(q_scale)

        y = self.enc(x) / curr_q
        z = self.hyper_enc(y)
        z_hat = common.quant(z, training)

        q_step, scales, means = self._fusion_params(z_hat)
        res = common.forward_dual_prior(
            y, means, scales, q_step, self.y_spatial_prior, training=training)

        y_hat = res.y_hat * curr_q
        x_hat = self.refine(self.dec(y_hat))

        if training and noise_rng is not None:
            k1, k2 = jax.random.split(noise_rng)
            y_for_bit = add_uniform_noise(res.y_res, k1)
            z_for_bit = add_uniform_noise(z, k2)
        else:
            y_for_bit = res.y_q
            z_for_bit = z_hat
        bits_y = gaussian_bits(y_for_bit, res.scales_hat)
        bits_z = self._z_bits(z_for_bit)
        mse = (x - x_hat) ** 2

        _, h, w, _ = x.shape
        pixel_num = h * w
        bpp_y = jnp.sum(bits_y, axis=(1, 2, 3)) / pixel_num
        bpp_z = jnp.sum(bits_z, axis=(1, 2, 3)) / pixel_num
        mse = jnp.sum(mse, axis=(1, 2, 3)) / pixel_num
        return {
            "x_hat": x_hat,
            "mse": mse,
            "bit": jnp.sum(bpp_y + bpp_z) * pixel_num,
            "bpp": bpp_y + bpp_z,
            "bpp_y": bpp_y,
            "bpp_z": bpp_z,
        }

    # -------------------------------------------------------------- compress
    def encode_front(self, x, q_scale):
        """Encoder-only analysis transform: y latent + rounded hyper symbols
        (image_model.py:148-160). All prior/scale math the stream depends on
        runs through the shared decompress stages (see common.py notes on
        encoder/decoder bit-exactness under XLA)."""
        curr_q = self.get_curr_q(q_scale)
        y = self.enc(x) / curr_q
        z = self.hyper_enc(y)
        return y, jnp.round(z)

    # ------------------------------------------------------------ decompress
    def decompress_stage1(self, z_hat, q_scale):
        """hyper decode + prior fusion -> step-0 coding scales
        (image_model.py:179-195 top)."""
        q_step, scales, means = self._fusion_params(z_hat)
        scales_r_0, q_step = common.decompress_stage_a(scales, q_step)
        return scales_r_0, (means, scales, q_step)

    def decompress_stage2(self, y_q_r_0, carry):
        means, scales, q_step = carry
        scales_r_1, carry2 = common.decompress_stage_b(
            y_q_r_0, means, scales, q_step, self.y_spatial_prior)
        return scales_r_1, carry2 + (q_step,)

    def decompress_stage3(self, y_q_r_1, carry, q_scale):
        y_hat_0_0, y_hat_1_1, means_0, means_1, q_step = carry
        y_hat = common.decompress_stage_c(
            y_q_r_1, (y_hat_0_0, y_hat_1_1, means_0, means_1), q_step)
        curr_q = self.get_curr_q(q_scale)
        y_hat = y_hat * curr_q
        x_hat = self.refine(self.dec(y_hat))
        return jnp.clip(x_hat, 0.0, 1.0)
