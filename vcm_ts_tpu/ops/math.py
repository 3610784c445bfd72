"""Differentiable scalar/elementwise primitives for the codec.

TPU-native equivalents of the reference's autograd helpers:
- lower_bound: max(x, bound) with the straight-through-ish gradient rule of
  reference LowerBound (DCVC_HEM/src/models/video_net.py:14-28).
- quant_ste: round with straight-through gradients, matching
  CompressionModel.quant in training mode (common_model.py:38-44).
- add_uniform_noise: additive U(-0.5, 0.5) for differentiable bit estimation
  (common_model.py:46-49).
- probs_to_bits: -log2(p) clamped at 0 (common_model.py:51-55).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


@jax.custom_vjp
def lower_bound(x, bound):
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    # Gradient passes when the input is above the bound, or when the gradient
    # pushes the input upward (toward validity) — identical rule to the
    # reference implementation.
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0).astype(g.dtype), None)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


def quant_ste(x):
    """Round to nearest with straight-through gradient."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def quant_round(x):
    return jnp.round(x)


def add_uniform_noise(x, rng):
    noise = jax.random.uniform(rng, x.shape, x.dtype, -0.5, 0.5)
    return x + jax.lax.stop_gradient(noise)


_LOG2 = math.log(2.0)


def probs_to_bits(probs):
    bits = -jnp.log(probs + 1e-5) / _LOG2
    return lower_bound(bits, 0.0)


def laplace_cdf(x, scale):
    """CDF of Laplace(mu=0, b=scale)."""
    return 0.5 - 0.5 * jnp.sign(x) * jnp.expm1(-jnp.abs(x) / scale)


def normal_cdf(x, scale):
    """CDF of Normal(mu=0, sigma=scale)."""
    return 0.5 * (1.0 + jax.lax.erf(x / (scale * math.sqrt(2.0))))


def gaussian_bits(y, sigma):
    """Bit cost of y under quantized N(0, sigma) — common_model.py:57-62."""
    sigma = jnp.clip(sigma, 0.11, 1e10)
    probs = normal_cdf(y + 0.5, sigma) - normal_cdf(y - 0.5, sigma)
    return probs_to_bits(probs)


def laplace_bits(y, sigma):
    """Bit cost of y under quantized Laplace(0, sigma) — common_model.py:64-69."""
    sigma = jnp.clip(sigma, 1e-5, 1e10)
    probs = laplace_cdf(y + 0.5, sigma) - laplace_cdf(y - 0.5, sigma)
    return probs_to_bits(probs)
