"""Resampling ops (NHWC) with torch-interpolate-compatible semantics.

Equivalents of the reference's bilinearupsacling/bilineardownsacling
(DCVC_HEM/src/models/video_net.py:58-71, F.interpolate align_corners=False)
and the SpyNet pyramid's avg_pool2d (video_net.py:132-133).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_up2(x):
    """2x bilinear upsampling, half-pixel centers (align_corners=False)."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * 2, w * 2, c), method="bilinear",
                            antialias=False)


def bilinear_down2(x):
    """0.5x bilinear downsampling, half-pixel centers, no antialias filter
    (matches torch F.interpolate(..., mode='bilinear', align_corners=False))."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h // 2, w // 2, c), method="bilinear",
                            antialias=False)


def avg_pool2(x):
    """2x2 average pooling with stride 2 (NHWC)."""
    out = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID")
    return out * 0.25


def max_pool2(x):
    """2x2 max pooling with stride 2 (NHWC) — UNet downsampling."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID")
