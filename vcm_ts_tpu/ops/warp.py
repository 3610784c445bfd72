"""Backward warping (motion compensation) on TPU.

Equivalent of the reference's flow_warp/torch_warp
(DCVC_HEM/src/models/video_net.py:32-55): bilinear sampling at
(x + u, y + v) with border clamping and align_corners=True grid semantics —
under which the flow is exactly a pixel-space displacement field.

Exact formulation: ONE gather over a precomputed 4C-wide neighbor-block
array — per-index cost dominates TPU gathers, so folding the four bilinear
taps into one gather wins at every channel width measured on v5e at 1080p
(C=64: 119 -> 76 ms; C=3: 90 -> 44 ms, i.e. the narrow-row penalty is far
smaller than the 4x index-count saving). `flow_warp_packed` additionally
folds several same-resolution tensors sharing one flow (the DMC warps the
reference frame and the full-res feature plane with the same mv) into a
single gather: 3ch + 64ch separately cost 44 + 78 ms, packed 104 ms.

Coordinates are clamped BEFORE flooring; for border-clamped bilinear this is
exactly equivalent to clamping the two tap indices independently (out-of-
range samples always collapse both taps onto the same edge pixel).

A fused Pallas kernel with two-pass semantics lives in warp_pallas.py
(model flag fast_warp).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _clamped_coords(im, flow):
    # coordinate math always in f32: bf16 cannot represent pixel indices
    # above 256 exactly (spacing 8 at x >= 1024), which would shift samples
    # by multiple pixels on 1080p frames
    n, h, w, c = im.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    fx = flow[..., 0].astype(jnp.float32)
    fy = flow[..., 1].astype(jnp.float32)
    px = jnp.clip(xs + fx, 0.0, w - 1.0)
    py = jnp.clip(ys + fy, 0.0, h - 1.0)
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = (px - x0)[..., None]
    wy = (py - y0)[..., None]
    return x0.astype(jnp.int32), y0.astype(jnp.int32), wx, wy


def _warp_one_gather(im, flow):
    n, h, w, c = im.shape
    x0i, y0i, wx, wy = _clamped_coords(im, flow)

    # neighbor blocks: B[y, x] = [im[y,x], im[y,x+1], im[y+1,x], im[y+1,x+1]]
    # with edge padding, so x0 == w-1 taps the border pixel (weight wx == 0
    # there anyway once coords are clamped).
    ime = jnp.pad(im, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    block = jnp.concatenate(
        [ime[:, :h, :w], ime[:, :h, 1:w + 1],
         ime[:, 1:h + 1, :w], ime[:, 1:h + 1, 1:w + 1]], axis=-1)
    block = block.reshape(n, h * w, 4 * c)
    idx = (y0i * w + x0i).reshape(n, h * w, 1)
    # combine the taps with flat lane slices of the gather output — a 5-D
    # (n,h,w,4,c) reshape here costs two full-tensor relayout copies at
    # 1080p (measured 23.5 ms/frame); the sliced form fuses into the lerp.
    # Indices are clamped in-range by construction, so promise_in_bounds
    # drops the out-of-bounds select XLA otherwise inserts after the gather
    # (another full-tensor pass, ~4.7 ms at 1080p).
    g = jnp.take_along_axis(block, idx, axis=1, mode="promise_in_bounds")
    wxf = wx.reshape(n, h * w, 1)
    wyf = wy.reshape(n, h * w, 1)
    v00 = g[:, :, :c]
    v01 = g[:, :, c:2 * c]
    v10 = g[:, :, 2 * c:3 * c]
    v11 = g[:, :, 3 * c:]
    out = ((v00 * (1.0 - wxf) + v01 * wxf) * (1.0 - wyf)
           + (v10 * (1.0 - wxf) + v11 * wxf) * wyf)
    return out.reshape(n, h, w, c).astype(im.dtype)


def flow_warp(im, flow):
    """Backward-warp `im` by `flow`.

    Args:
      im: (N, H, W, C) source image/features.
      flow: (N, H, W, 2) displacement in pixels; channel 0 = horizontal (x),
        channel 1 = vertical (y) — same convention as the reference.

    Returns:
      (N, H, W, C) warped tensor, border-clamped bilinear samples.
    """
    return _warp_one_gather(im, flow)


def flow_warp_packed(ims, flow):
    """Backward-warp several same-resolution tensors by ONE flow in a single
    gather (bit-identical to separate flow_warp calls: the gather is
    per-channel independent).

    Args:
      ims: sequence of (N, H, W, C_i) tensors.
      flow: (N, H, W, 2) shared displacement field.

    Returns:
      list of (N, H, W, C_i) warped tensors.
    """
    widths = [im.shape[-1] for im in ims]
    out = _warp_one_gather(jnp.concatenate(ims, axis=-1), flow)
    splits = list(np.cumsum(widths[:-1]))
    return jnp.split(out, splits, axis=-1)
