"""DMC — the conditional-coding P-frame (video) model.

TPU-native re-design of the reference DMC
(DCVC_HEM/src/models/video_model.py:131-596): SpyNet flow -> MV codec with
hyperprior + temporal prior fusion -> motion compensation over a 3-scale
feature pyramid -> contextual encoder/decoder with hybrid spatial-temporal
entropy modelling (dual-prior checkerboard) -> UNet reconstruction.

Functional design notes (vs the torch original):
- NHWC; the DPB (decoded picture buffer) is a dict of dense arrays — the
  reference's `None` entries become zeros plus a static `is_first_p` flag
  selecting the I-frame feature adaptor (video_model.py:226-231), giving two
  jit specializations instead of data-dependent control flow.
- The frame loop lives outside as `lax.scan` (training) or the codec engine
  (inference); this module is a pure per-frame function.
- Decompression is split into 4 device stages around the host rANS reads;
  stream order (mv_z, mv_y0, mv_y1, z, y0, y1) matches video_model.py:333-340.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..entropy.bit_estimator import BitEstimator
from ..ops.layers import (Seq, conv, enc_dec_models, hyper_enc_dec_models,
                          leaky_relu)
from ..ops.math import add_uniform_noise, laplace_bits, lower_bound, probs_to_bits
from ..ops.resize import bilinear_down2
from ..ops.warp import flow_warp
from . import common
from .video_net import (ContextualDecoder, ContextualEncoder, FeatureExtractor,
                        MESpynet, MultiScaleContextFusion, ReconGeneration)


def make_dpb(x, channel_N: int = 64, channel_M: int = 96):
    """Fresh decoded-picture buffer seeded with a reference frame.

    Dense-zero equivalents of the reference's None slots
    (core/model/dcvc_hem.py:168-180)."""
    n, h, w, _ = x.shape
    return {
        "ref_frame": x,
        "ref_feature": jnp.zeros((n, h, w, channel_N), x.dtype),
        "ref_y": jnp.zeros((n, h // 16, w // 16, channel_M), x.dtype),
        "ref_mv_y": jnp.zeros((n, h // 16, w // 16, channel_N), x.dtype),
    }


class DMC(nn.Module):
    anchor_num: int = 4
    channel_mv: int = 64
    channel_N: int = 64
    channel_M: int = 96
    # Use the fused two-pass Pallas warp kernel instead of the exact gather
    # warp (speed/parity tradeoff documented in ops/warp_pallas.py).
    fast_warp: bool = False

    def _warp(self, im, flow, scale: int):
        if self.fast_warp:
            from ..ops.warp_pallas import flow_warp_pallas
            return flow_warp_pallas(im, flow, max_disp=max(6, 24 >> scale))
        return flow_warp(im, flow)

    def setup(self):
        cm, cn, cM = self.channel_mv, self.channel_N, self.channel_M

        self.optic_flow = MESpynet(name="optic_flow",
                                   fast_warp=self.fast_warp)

        mv_enc, mv_dec = enc_dec_models(2, 2, cm)
        self.mv_encoder = mv_enc(name="mv_encoder")
        self.mv_decoder = mv_dec(name="mv_decoder")
        mv_he, mv_hd = hyper_enc_dec_models(cm, cn)
        self.mv_hyper_prior_encoder = mv_he(name="mv_hyper_prior_encoder")
        self.mv_hyper_prior_decoder = mv_hd(name="mv_hyper_prior_decoder")

        self.mv_y_prior_fusion = Seq(parts=(
            ("0", conv(cm * 3, 3)), leaky_relu(0.2),
            ("2", conv(cm * 3, 3)), leaky_relu(0.2),
            ("4", conv(cm * 3, 3)),
        ), name="mv_y_prior_fusion")
        self.mv_y_spatial_prior = Seq(parts=(
            ("0", conv(cm * 3, 3)), leaky_relu(0.2),
            ("2", conv(cm * 3, 3)), leaky_relu(0.2),
            ("4", conv(cm * 2, 3)),
        ), name="mv_y_spatial_prior")

        self.feature_adaptor_I = conv(cn, 3)(name="feature_adaptor_I")
        self.feature_adaptor_P = conv(cn, 1)(name="feature_adaptor_P")
        self.feature_extractor = FeatureExtractor(cn, name="feature_extractor")
        self.context_fusion_net = MultiScaleContextFusion(
            cn, name="context_fusion_net")

        self.contextual_encoder = ContextualEncoder(
            cn, cM, name="contextual_encoder")
        self.contextual_hyper_prior_encoder = Seq(parts=(
            ("0", conv(cn, 3)), leaky_relu(0.01),
            ("2", conv(cn, 3, 2)), leaky_relu(0.01),
            ("4", conv(cn, 3, 2)),
        ), name="contextual_hyper_prior_encoder")

        from ..ops.layers import SubpelConv
        from functools import partial
        self.contextual_hyper_prior_decoder = Seq(parts=(
            ("0", conv(cM, 3)), leaky_relu(0.01),
            ("2", partial(SubpelConv, cM, 2, 1)), leaky_relu(0.01),
            ("4", conv(cM * 3 // 2, 3)), leaky_relu(0.01),
            ("6", partial(SubpelConv, cM * 3 // 2, 2, 1)), leaky_relu(0.01),
            ("8", conv(cM * 2, 3)),
        ), name="contextual_hyper_prior_decoder")

        self.temporal_prior_encoder = Seq(parts=(
            ("0", conv(cM * 3 // 2, 3, 2)), leaky_relu(0.1),
            ("2", conv(cM * 2, 3, 2)),
        ), name="temporal_prior_encoder")

        self.y_prior_fusion = Seq(parts=(
            ("0", conv(cM * 4, 3)), leaky_relu(0.2),
            ("2", conv(cM * 3, 3)), leaky_relu(0.2),
            ("4", conv(cM * 3, 3)),
        ), name="y_prior_fusion")
        self.y_spatial_prior = Seq(parts=(
            ("0", conv(cM * 3, 3)), leaky_relu(0.2),
            ("2", conv(cM * 3, 3)), leaky_relu(0.2),
            ("4", conv(cM * 2, 3)),
        ), name="y_spatial_prior")

        self.contextual_decoder = ContextualDecoder(
            cn, cM, name="contextual_decoder")
        self.recon_generation_net = ReconGeneration(
            cn, name="recon_generation_net")

        self.mv_y_q_basic = self.param(
            "mv_y_q_basic", nn.initializers.ones, (1, 1, 1, cm))
        self.mv_y_q_scale = self.param(
            "mv_y_q_scale", nn.initializers.ones, (self.anchor_num, 1, 1, 1))
        self.y_q_basic = self.param(
            "y_q_basic", nn.initializers.ones, (1, 1, 1, cM))
        self.y_q_scale = self.param(
            "y_q_scale", nn.initializers.ones, (self.anchor_num, 1, 1, 1))

        self.bit_estimator_z = BitEstimator(cn, name="bit_estimator_z")
        self.bit_estimator_z_mv = BitEstimator(cn, name="bit_estimator_z_mv")

    # ------------------------------------------------------------------ utils
    def get_curr_mv_y_q(self, q_scale):
        return lower_bound(self.mv_y_q_basic, 0.5) * q_scale

    def get_curr_y_q(self, q_scale):
        return lower_bound(self.y_q_basic, 0.5) * q_scale

    def multi_scale_feature_extractor(self, dpb, is_first_p: bool):
        if is_first_p:
            feature = self.feature_adaptor_I(dpb["ref_frame"])
        else:
            feature = self.feature_adaptor_P(dpb["ref_feature"])
        return self.feature_extractor(feature)

    def motion_compensation(self, dpb, mv, is_first_p: bool):
        """Multi-scale warped contexts (video_model.py:233-246).

        The reference frame and the full-res feature plane share one flow at
        one resolution, so they ride a single packed gather (per-index cost
        dominates TPU gathers; bit-identical to separate warps)."""
        mv2 = bilinear_down2(mv) / 2
        mv3 = bilinear_down2(mv2) / 2
        f1, f2, f3 = self.multi_scale_feature_extractor(dpb, is_first_p)
        if self.fast_warp:
            warpframe = self._warp(dpb["ref_frame"], mv, 0)
            context1 = self._warp(f1, mv, 0)
        else:
            from ..ops.warp import flow_warp_packed
            warpframe, context1 = flow_warp_packed(
                (dpb["ref_frame"], f1), mv)
        context2 = self._warp(f2, mv2, 1)
        context3 = self._warp(f3, mv3, 2)
        context1, context2, context3 = self.context_fusion_net(
            context1, context2, context3)
        return context1, context2, context3, warpframe

    def _mv_prior(self, mv_z_hat, ref_mv_y):
        mv_params = self.mv_hyper_prior_decoder(mv_z_hat)
        mv_params = jnp.concatenate((mv_params, ref_mv_y), axis=-1)
        return jnp.split(self.mv_y_prior_fusion(mv_params), 3, axis=-1)

    def _y_prior(self, z_hat, context3, ref_y):
        hierarchical = self.contextual_hyper_prior_decoder(z_hat)
        temporal = self.temporal_prior_encoder(context3)
        params = jnp.concatenate((temporal, hierarchical, ref_y), axis=-1)
        return jnp.split(self.y_prior_fusion(params), 3, axis=-1)

    def _z_bits(self, z, which: str):
        est = (self.bit_estimator_z if which == "z"
               else self.bit_estimator_z_mv)
        return probs_to_bits(est(z + 0.5) - est(z - 0.5))

    @staticmethod
    def get_q_scales_from_ckpt(ckpt_path: str):
        """(y_q_scales, mv_y_q_scales) — API parity with
        video_model.py:248-253; accepts reference .pth files."""
        from ..utils.weight_import import get_q_scales_from_ckpt
        return get_q_scales_from_ckpt(ckpt_path)

    def init_all(self, x, dpb, mv_y_q_scale, y_q_scale):
        """Init-only entry: touches the P-frame feature adaptor too, so one
        `model.init(..., method='init_all')` creates the full parameter set
        (the forward path only traces one adaptor per is_first_p value)."""
        _ = self.feature_adaptor_P(dpb["ref_feature"])
        return self(x, dpb, mv_y_q_scale, y_q_scale, is_first_p=True)

    # ---------------------------------------------------------------- forward
    def __call__(self, x, dpb, mv_y_q_scale, y_q_scale,
                 is_first_p: bool = False, training: bool = False,
                 noise_rng: Optional[jax.Array] = None):
        """Per-frame forward with analytic bit costs
        (video_model.py:470-592)."""
        curr_mv_y_q = self.get_curr_mv_y_q(mv_y_q_scale)
        curr_y_q = self.get_curr_y_q(y_q_scale)

        est_mv = self.optic_flow(x, dpb["ref_frame"])
        mv_y = self.mv_encoder(est_mv) / curr_mv_y_q
        mv_z = self.mv_hyper_prior_encoder(mv_y)
        mv_z_hat = common.quant(mv_z, training)
        mv_q_step, mv_scales, mv_means = self._mv_prior(
            mv_z_hat, dpb["ref_mv_y"])
        mv_res = common.forward_dual_prior(
            mv_y, mv_means, mv_scales, mv_q_step, self.mv_y_spatial_prior,
            training=training)
        mv_y_hat = mv_res.y_hat * curr_mv_y_q

        mv_hat = self.mv_decoder(mv_y_hat)
        context1, context2, context3, warp_frame = self.motion_compensation(
            dpb, mv_hat, is_first_p)

        y = self.contextual_encoder(x, context1, context2, context3) / curr_y_q
        z = self.contextual_hyper_prior_encoder(y)
        z_hat = common.quant(z, training)
        q_step, scales, means = self._y_prior(z_hat, context3, dpb["ref_y"])
        y_res = common.forward_dual_prior(
            y, means, scales, q_step, self.y_spatial_prior, training=training)
        y_hat = y_res.y_hat * curr_y_q

        recon_feat = self.contextual_decoder(y_hat, context2, context3)
        feature, recon_image = self.recon_generation_net(recon_feat, context1)

        _, h, w, _ = x.shape
        pixel_num = h * w
        mse = jnp.sum((x - recon_image) ** 2, axis=(1, 2, 3)) / pixel_num
        me_mse = jnp.sum((x - warp_frame) ** 2, axis=(1, 2, 3)) / pixel_num

        if training and noise_rng is not None:
            k1, k2, k3, k4 = jax.random.split(noise_rng, 4)
            y_for_bit = add_uniform_noise(y_res.y_res, k1)
            mv_y_for_bit = add_uniform_noise(mv_res.y_res, k2)
            z_for_bit = add_uniform_noise(z, k3)
            mv_z_for_bit = add_uniform_noise(mv_z, k4)
        else:
            y_for_bit = y_res.y_q
            mv_y_for_bit = mv_res.y_q
            z_for_bit = z_hat
            mv_z_for_bit = mv_z_hat

        bits_y = laplace_bits(y_for_bit, y_res.scales_hat)
        bits_mv_y = laplace_bits(mv_y_for_bit, mv_res.scales_hat)
        bits_z = self._z_bits(z_for_bit, "z")
        bits_mv_z = self._z_bits(mv_z_for_bit, "z_mv")

        bpp_y = jnp.sum(bits_y, axis=(1, 2, 3)) / pixel_num
        bpp_z = jnp.sum(bits_z, axis=(1, 2, 3)) / pixel_num
        bpp_mv_y = jnp.sum(bits_mv_y, axis=(1, 2, 3)) / pixel_num
        bpp_mv_z = jnp.sum(bits_mv_z, axis=(1, 2, 3)) / pixel_num
        bpp = bpp_y + bpp_z + bpp_mv_y + bpp_mv_z

        return {
            "bpp_mv_y": bpp_mv_y,
            "bpp_mv_z": bpp_mv_z,
            "bpp_y": bpp_y,
            "bpp_z": bpp_z,
            "bpp": bpp,
            "me_mse": me_mse,
            "mse": mse,
            "dpb": {
                "ref_frame": recon_image,
                "ref_feature": feature,
                "ref_y": y_hat,
                "ref_mv_y": mv_y_hat,
            },
            "bit": jnp.sum(bpp) * pixel_num,
            "bit_y": jnp.sum(bpp_y) * pixel_num,
            "bit_z": jnp.sum(bpp_z) * pixel_num,
            "bit_mv_y": jnp.sum(bpp_mv_y) * pixel_num,
            "bit_mv_z": jnp.sum(bpp_mv_z) * pixel_num,
        }

    forward_one_frame = __call__

    # -------------------------------------------------------------- compress
    # The encoder is the decoder's stage chain plus three encoder-only
    # programs; every prior/scale the written stream depends on comes out of
    # the SAME jitted decompress stages the decoder runs, so encode/decode
    # stay bit-exact across chained P-frames (see common.py encoder-side
    # notes; reference equivalence: video_model.py:263-352 runs both halves
    # as the same torch kernels).

    def encode_front(self, x, dpb, mv_y_q_scale):
        """Encoder-only MV analysis: flow estimation -> mv latent + rounded
        hyper symbols (video_model.py:263-276)."""
        curr_mv_y_q = self.get_curr_mv_y_q(mv_y_q_scale)
        est_mv = self.optic_flow(x, dpb["ref_frame"])
        mv_y = self.mv_encoder(est_mv) / curr_mv_y_q
        mv_z = self.mv_hyper_prior_encoder(mv_y)
        return mv_y, jnp.round(mv_z)

    def encode_latent(self, x, contexts, y_q_scale):
        """Encoder-only contextual analysis against the DECODER's contexts
        (from decompress_stage3a): y latent + rounded hyper symbols."""
        context1, context2, context3, _ = contexts
        y = self.contextual_encoder(
            x, context1, context2, context3) / self.get_curr_y_q(y_q_scale)
        z = self.contextual_hyper_prior_encoder(y)
        return y, jnp.round(z)

    # ------------------------------------------------------------ decompress
    # Stage 1: mv hyper decode -> step-0 mv coding scales.
    def decompress_stage1(self, mv_z_hat, dpb):
        mv_q_step, mv_scales, mv_means = self._mv_prior(
            mv_z_hat, dpb["ref_mv_y"])
        scales_r_0, mv_q_step = common.decompress_stage_a(mv_scales, mv_q_step)
        return scales_r_0, (mv_means, mv_scales, mv_q_step)

    # Stage 2: decoded mv step-0 symbols -> step-1 mv coding scales.
    def decompress_stage2(self, mv_y_q_r_0, carry):
        mv_means, mv_scales, mv_q_step = carry
        scales_r_1, carry2 = common.decompress_stage_b(
            mv_y_q_r_0, mv_means, mv_scales, mv_q_step,
            self.mv_y_spatial_prior)
        return scales_r_1, carry2 + (mv_q_step,)

    # Stage 3a: finish mv reconstruction and motion-compensate. Split from
    # 3b so the ENCODER can reuse it: it needs these contexts to compute the
    # y latent before the y-prior stage can run.
    def decompress_stage3a(self, mv_y_q_r_1, carry, dpb,
                           mv_y_q_scale, is_first_p: bool = False):
        y_hat_0_0, y_hat_1_1, means_0, means_1, mv_q_step = carry
        mv_y_hat = common.decompress_stage_c(
            mv_y_q_r_1, (y_hat_0_0, y_hat_1_1, means_0, means_1), mv_q_step)
        mv_y_hat = mv_y_hat * self.get_curr_mv_y_q(mv_y_q_scale)

        mv_hat = self.mv_decoder(mv_y_hat)
        context1, context2, context3, _ = self.motion_compensation(
            dpb, mv_hat, is_first_p)
        return (context1, context2, context3, mv_y_hat)

    # Stage 3b: consume z (decoded from static channel indexes on the host),
    # emit step-0 y coding scales.
    def decompress_stage3b(self, z_hat, context3, dpb):
        q_step, scales, means = self._y_prior(z_hat, context3, dpb["ref_y"])
        scales_r_0, q_step = common.decompress_stage_a(scales, q_step)
        return scales_r_0, (means, scales, q_step)

    # Stage 5: decoded y step-0 symbols -> step-1 y coding scales.
    def decompress_stage5(self, y_q_r_0, carry):
        means, scales, q_step = carry
        scales_r_1, carry2 = common.decompress_stage_b(
            y_q_r_0, means, scales, q_step, self.y_spatial_prior)
        return scales_r_1, carry2 + (q_step,)

    # Stage 6: reassemble y, reconstruct the frame, emit the new DPB.
    def decompress_stage6(self, y_q_r_1, carry, contexts, y_q_scale):
        y_hat_0_0, y_hat_1_1, means_0, means_1, q_step = carry
        context1, context2, context3, mv_y_hat = contexts
        y_hat = common.decompress_stage_c(
            y_q_r_1, (y_hat_0_0, y_hat_1_1, means_0, means_1), q_step)
        y_hat = y_hat * self.get_curr_y_q(y_q_scale)

        recon_feat = self.contextual_decoder(y_hat, context2, context3)
        feature, recon_image = self.recon_generation_net(recon_feat, context1)
        recon_image = jnp.clip(recon_image, 0.0, 1.0)
        return {
            "dpb": {
                "ref_frame": recon_image,
                "ref_feature": feature,
                "ref_y": y_hat,
                "ref_mv_y": mv_y_hat,
            },
        }
