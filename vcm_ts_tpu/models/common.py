"""Shared compression-model machinery: quantization and the two-step
dual-spatial-prior (checkerboard) entropy model.

TPU-native equivalent of the reference CompressionModel
(DCVC_HEM/src/models/common_model.py:14-217), as pure functions over NHWC
arrays so they can be reused by both the intra and inter models and freely
jitted/vmapped. The channel dimension is last; the reference's chunk(k, 1)
becomes a split over axis -1.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..ops.math import lower_bound, quant_ste, quant_round


def quant(x, training: bool):
    """STE round in training, plain round in eval (common_model.py:38-44)."""
    return quant_ste(x) if training else quant_round(x)


def checkerboard_masks(h: int, w: int, dtype=jnp.float32):
    """mask_0 has 1s where (y+x) even; mask_1 is its complement
    (common_model.py:82-89). Shapes (1, H, W, 1) for NHWC broadcast."""
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    mask0 = ((ys + xs) % 2 == 0).astype(dtype)
    mask0 = mask0[None, :, :, None]
    return mask0, 1.0 - mask0


def process_with_mask(y, scales, means, mask, training: bool):
    """One checkerboard half-step (common_model.py:91-102)."""
    scales_hat = scales * mask
    means_hat = means * mask
    y_res = (y - means_hat) * mask
    y_q = quant(y_res, training)
    y_hat = y_q + means_hat
    return y_res, y_q, y_hat, scales_hat


class DualPriorForward(NamedTuple):
    y_res: jnp.ndarray
    y_q: jnp.ndarray
    y_hat: jnp.ndarray
    scales_hat: jnp.ndarray


def forward_dual_prior(y, means, scales, quant_step,
                       spatial_prior: Callable, *, training: bool = False):
    """Two-step dual-prior coding (common_model.py:104-177).

    spatial_prior: callable mapping the concatenated step-0 context
    (y_hat_0_0, y_hat_1_1, means, scales, quant_step) -> 4-way channel split
    (scales_0, means_0, scales_1, means_1) for step 1.
    """
    _, h, w, _ = y.shape
    mask0, mask1 = checkerboard_masks(h, w, y.dtype)

    quant_step = lower_bound(quant_step, 0.5)
    y = y / quant_step
    y_0, y_1 = jnp.split(y, 2, axis=-1)
    scales_0, scales_1 = jnp.split(scales, 2, axis=-1)
    means_0, means_1 = jnp.split(means, 2, axis=-1)

    y_res_0_0, y_q_0_0, y_hat_0_0, s_hat_0_0 = process_with_mask(
        y_0, scales_0, means_0, mask0, training)
    y_res_1_1, y_q_1_1, y_hat_1_1, s_hat_1_1 = process_with_mask(
        y_1, scales_1, means_1, mask1, training)

    params = jnp.concatenate(
        (y_hat_0_0, y_hat_1_1, means, scales, quant_step), axis=-1)
    scales_0, means_0, scales_1, means_1 = jnp.split(
        spatial_prior(params), 4, axis=-1)

    y_res_0_1, y_q_0_1, y_hat_0_1, s_hat_0_1 = process_with_mask(
        y_0, scales_0, means_0, mask1, training)
    y_res_1_0, y_q_1_0, y_hat_1_0, s_hat_1_0 = process_with_mask(
        y_1, scales_1, means_1, mask0, training)

    y_hat = jnp.concatenate(
        (y_hat_0_0 + y_hat_0_1, y_hat_1_1 + y_hat_1_0), axis=-1) * quant_step

    return DualPriorForward(
        y_res=jnp.concatenate((y_res_0_0 + y_res_0_1,
                               y_res_1_1 + y_res_1_0), axis=-1),
        y_q=jnp.concatenate((y_q_0_0 + y_q_0_1,
                             y_q_1_1 + y_q_1_0), axis=-1),
        y_hat=y_hat,
        scales_hat=jnp.concatenate((s_hat_0_0 + s_hat_0_1,
                                    s_hat_1_1 + s_hat_1_0), axis=-1))


# --------------------------------------------------------------------------
# Encoder-side symbol quantization against the DECODER's prior buffers.
#
# The reference runs compress and decompress as the same torch kernels, so
# its encoder-side means/scales are bit-identical to the decoder's by
# construction (common_model.py:104-217). Under XLA, a fused one-program
# encoder recomputes the priors with different fusion boundaries — ULP
# drift can flip a scale-table index or a symbol rounding and desync the
# rANS stream on chained P-frames. The codec engines therefore derive every
# prior through the *decoder's own jitted stage programs* and quantize the
# encoder latent against those buffers with the two helpers below; the
# written stream then decodes bit-exactly on any frame chain.
# --------------------------------------------------------------------------

def encode_symbols_step0(y, means, quant_step):
    """Checkerboard step-0 symbols of latent `y` given stage-A prior buffers
    (means full-width, quant_step already lower-bounded). Equals
    forward_dual_prior's y_q_w_0 when the priors agree."""
    _, h, w, _ = y.shape
    mask0, mask1 = checkerboard_masks(h, w, y.dtype)
    y = y / quant_step
    y_0, y_1 = jnp.split(y, 2, axis=-1)
    means_0, means_1 = jnp.split(means, 2, axis=-1)
    q00 = quant_round((y_0 - means_0 * mask0) * mask0)
    q11 = quant_round((y_1 - means_1 * mask1) * mask1)
    return q00 + q11


def encode_symbols_step1(y, means_0, means_1, quant_step):
    """Checkerboard step-1 symbols given stage-B prior buffers (means halves
    from the spatial prior). Equals forward_dual_prior's y_q_w_1."""
    _, h, w, _ = y.shape
    mask0, mask1 = checkerboard_masks(h, w, y.dtype)
    y = y / quant_step
    y_0, y_1 = jnp.split(y, 2, axis=-1)
    q01 = quant_round((y_0 - means_0 * mask1) * mask1)
    q10 = quant_round((y_1 - means_1 * mask0) * mask0)
    return q01 + q10


# --------------------------------------------------------------------------
# Decompress side, split into device stages around the two host rANS reads
# (common_model.py:182-217). Stage A emits the step-0 coding scales; stage B
# consumes decoded step-0 symbols and emits step-1 scales; stage C consumes
# step-1 symbols and reassembles y_hat.
# --------------------------------------------------------------------------

def decompress_stage_a(scales, quant_step):
    _, h, w, _ = scales.shape
    mask0, mask1 = checkerboard_masks(h, w, scales.dtype)
    quant_step = jnp.maximum(quant_step, 0.5)
    scales_0, scales_1 = jnp.split(scales, 2, axis=-1)
    scales_r_0 = scales_0 * mask0 + scales_1 * mask1
    return scales_r_0, quant_step


def decompress_stage_b(y_q_r_0, means, scales, quant_step,
                       spatial_prior: Callable):
    _, h, w, _ = means.shape
    mask0, mask1 = checkerboard_masks(h, w, means.dtype)
    means_0, means_1 = jnp.split(means, 2, axis=-1)
    y_hat_0_0 = (y_q_r_0 + means_0) * mask0
    y_hat_1_1 = (y_q_r_0 + means_1) * mask1

    params = jnp.concatenate(
        (y_hat_0_0, y_hat_1_1, means, scales, quant_step), axis=-1)
    scales_0, means_0, scales_1, means_1 = jnp.split(
        spatial_prior(params), 4, axis=-1)
    scales_r_1 = scales_0 * mask1 + scales_1 * mask0
    return scales_r_1, (y_hat_0_0, y_hat_1_1, means_0, means_1)


def decompress_stage_c(y_q_r_1, carry, quant_step):
    y_hat_0_0, y_hat_1_1, means_0, means_1 = carry
    _, h, w, _ = means_0.shape
    mask0, mask1 = checkerboard_masks(h, w, means_0.dtype)
    y_hat_0_1 = (y_q_r_1 + means_0) * mask1
    y_hat_1_0 = (y_q_r_1 + means_1) * mask0
    y_hat = jnp.concatenate(
        (y_hat_0_0 + y_hat_0_1, y_hat_1_1 + y_hat_1_0), axis=-1)
    return y_hat * quant_step
