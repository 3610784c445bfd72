"""Backward warping (motion compensation) on TPU.

Equivalent of the reference's flow_warp/torch_warp
(DCVC_HEM/src/models/video_net.py:32-55): bilinear sampling at
(x + u, y + v) with border clamping and align_corners=True grid semantics —
under which the flow is exactly a pixel-space displacement field.

Implemented as four gathers + lerp in pure XLA (gather lowers to dynamic
slicing on TPU); a fused Pallas kernel can replace this for the hot path
without changing the interface.
"""

from __future__ import annotations

import jax.numpy as jnp


def flow_warp(im, flow):
    """Backward-warp `im` by `flow`.

    Args:
      im: (N, H, W, C) source image/features.
      flow: (N, H, W, 2) displacement in pixels; channel 0 = horizontal (x),
        channel 1 = vertical (y) — same convention as the reference.

    Returns:
      (N, H, W, C) warped tensor, border-clamped bilinear samples.
    """
    n, h, w, c = im.shape
    dtype = im.dtype

    ys = jnp.arange(h, dtype=dtype)[None, :, None]
    xs = jnp.arange(w, dtype=dtype)[None, None, :]
    px = xs + flow[..., 0]
    py = ys + flow[..., 1]

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = (px - x0)[..., None]
    wy = (py - y0)[..., None]

    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)

    im_flat = im.reshape(n, h * w, c)

    def gather(yi, xi):
        idx = (yi * w + xi).reshape(n, h * w, 1)
        return jnp.take_along_axis(im_flat, idx, axis=1).reshape(n, h, w, c)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy
