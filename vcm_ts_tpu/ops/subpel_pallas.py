"""Pallas TPU kernels for the subpel-conv + pixel-shuffle block.

Round-3 tracing showed ~170 ms/frame of XLA layout copies + pad/reshape
plumbing at 1080p, a large slice of it around the subpel upsamplers
(conv -> depth-to-space, reference layers.py:23-34): XLA lowers
pixel_shuffle's reshape-transpose-reshape to multiple HBM relayout passes.

Key idea: re-order the conv's OUTPUT channels from torch's c-major
(o = c*r^2 + dy*r + dx) to k-major (o = (dy*r + dx)*C + c) by permuting the
conv WEIGHTS (free: a trace-time transpose of a weight-sized tensor). In
k-major order, depth-to-space becomes a pure *block copy*: output viewed as
(N, H, r, W, r, C) takes plane k = dy*r+dx contiguously from input channels
[k*C, (k+1)*C) — no in-register lane shuffles, no gathers, and the final
(N,H,r,W,r,C) -> (N,Hr,Wr,C) reshape is a row-major dim merge (bitcast).

Two kernels:
- pixel_shuffle_relayout: one-pass HBM->HBM DMA relayout (any conv kernel
  size; follows a regular XLA conv that was given k-major weights);
- subpel_conv1x1: the fully fused 1x1-conv (MXU dot) + shuffle — the conv
  output is never materialized in HBM at all (ResidualBlockUpsample and the
  decoders' SubpelConv(kernel=1) sites).

Both are EXACT relayouts/matmuls (no approximation; unlike the quality-gated
fast-warp kernel). Both carry custom VJPs (the relayout's inverse
permutation, the dot's standard matmul cotangents — expressed in plain XLA
ops, since training throughput is conv-bound, not shuffle-bound), so
ops/layers.set_fast_shuffle is safe under jax.grad as well as inference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def permute_out_channels(w, r: int):
    """HWIO conv weights, torch subpel channel order -> k-major order.

    torch PixelShuffle reads o = c*r^2 + dy*r + dx (layers.py:23-34); the
    kernels here want o' = (dy*r + dx)*C + c. A weight-tensor transpose at
    trace time; XLA folds it into the conv's weight load."""
    *lead, o = w.shape
    c = o // (r * r)
    w = w.reshape(*lead, c, r * r)
    w = jnp.swapaxes(w, -1, -2)
    return w.reshape(*lead, o)


def _largest_divisor(n: int, cap: int) -> int:
    for b in range(min(cap, n), 0, -1):
        if n % b == 0:
            return b
    return 1


def _relayout_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...].reshape(o_ref.shape)


def _kmajor_depth_to_space_xla(x, r: int):
    """Plain-XLA depth-to-space for k-major channel order (fallback for
    shapes whose per-dy lane slice isn't 128-divisible — Mosaic requires
    lane-dim blocks divisible by 128 or full)."""
    n, h, w, crr = x.shape
    c = crr // (r * r)
    x6 = x.reshape(n, h, w, r, r, c)
    return x6.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * r, w * r, c)


def _relayout_full_kernel(x_ref, o_ref, *, r: int, rc: int):
    v = x_ref[...]
    for dy in range(r):
        o_ref[0, :, dy, :, :] = v[0, :, :, dy * rc:(dy + 1) * rc]


def _relayout_impl_fulllane(x, r: int, block_h: int, interpret: bool):
    """Variant for ANY channel count: grid has no dy axis; each instance
    loads a full-lane input block (always Mosaic-legal) and writes the r
    dy-planes with static in-register lane slices. The output block is
    full in its trailing two dims, so no divisibility constraint — the
    cost vs the dy-grid variant is the sub-register lane slice when
    r*c < 128 (a VPU rotate, not extra HBM traffic)."""
    n, h, w, crr = x.shape
    c = crr // (r * r)
    rc = r * c
    bh = _largest_divisor(h, block_h)
    out5 = pl.pallas_call(
        functools.partial(_relayout_full_kernel, r=r, rc=rc),
        grid=(n, h // bh),
        in_specs=[pl.BlockSpec(
            (1, bh, w, crr), lambda ni, i: (ni, i, 0, 0))],
        out_specs=pl.BlockSpec(
            (1, bh, r, w, rc), lambda ni, i: (ni, i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, r, w, rc), x.dtype),
        interpret=interpret,
    )(x)
    return out5.reshape(n, h * r, w * r, c)


def _relayout_impl(x, r: int, block_h: int, interpret: bool):
    """Grid over dy only: the (dx, c) pair rides the LANE dim as one
    contiguous r*c-wide slice (k-major order makes it contiguous), so every
    block is Mosaic-legal when r*c % 128 == 0 (lane blocks must be
    128-divisible or full; trailing w is always full). The 5D->4D output
    reshape is a pure row-major reinterpretation — no data movement.

    r*c % 128 != 0 sites fall back to plain XLA until the full-lane
    variant (_relayout_impl_fulllane) is chip-proven by the smoke tool."""
    n, h, w, crr = x.shape
    c = crr // (r * r)
    rc = r * c
    if rc % 128 != 0:
        return _kmajor_depth_to_space_xla(x, r)
    bh = _largest_divisor(h, block_h)
    out5 = pl.pallas_call(
        _relayout_kernel,
        grid=(n, h // bh, r),
        in_specs=[pl.BlockSpec(
            (1, bh, w, rc), lambda ni, i, dy: (ni, i, 0, dy))],
        out_specs=pl.BlockSpec(
            (1, bh, 1, w, rc), lambda ni, i, dy: (ni, i, dy, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, r, w, rc), x.dtype),
        interpret=interpret,
    )(x)
    return out5.reshape(n, h * r, w * r, c)


def _kmajor_space_to_depth(g, r: int):
    """Inverse of the k-major depth-to-space (plain XLA; used in VJPs —
    training cost lives in the convs, not the shuffle)."""
    n, hr, wr, c = g.shape
    h, w = hr // r, wr // r
    g6 = g.reshape(n, h, r, w, r, c)
    return g6.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, w, r * r * c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _relayout_vjp(x, r, block_h, interpret):
    return _relayout_impl(x, r, block_h, interpret)


def _relayout_fwd(x, r, block_h, interpret):
    return _relayout_impl(x, r, block_h, interpret), None


def _relayout_bwd(r, block_h, interpret, _res, g):
    return (_kmajor_space_to_depth(g, r),)


_relayout_vjp.defvjp(_relayout_fwd, _relayout_bwd)


@functools.partial(jax.jit, static_argnames=("r", "block_h", "interpret"))
def pixel_shuffle_relayout(x, r: int = 2, block_h: int = 8,
                           interpret: bool = False):
    """Depth-to-space for K-MAJOR channel order in one DMA pass.

    x: (N, H, W, r*r*C) with channels ordered (dy*r+dx) major (see
    permute_out_channels). Returns (N, H*r, W*r, C) == ops.layers.
    pixel_shuffle of the equivalent c-major tensor (exactness pinned by
    tests/test_subpel_pallas.py). Differentiable (custom VJP: the inverse
    permutation)."""
    return _relayout_vjp(x, r, block_h, interpret)


def _conv1x1_kernel(x_ref, w_ref, b_ref, o_ref):
    bh, wdim = x_ref.shape[1], x_ref.shape[2]
    xm = x_ref[0].reshape(bh * wdim, x_ref.shape[3])
    y = jnp.dot(xm, w_ref[0], preferred_element_type=jnp.float32)
    y = y + b_ref[0, 0].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype).reshape(o_ref.shape)


def _conv1x1_impl(x, w_kmajor, bias_kmajor, r: int, block_h: int,
                  interpret: bool):
    """Grid over (n, h-block, dy). The per-dx weight planes for a given dy
    are concatenated along output channels AT TRACE TIME (a weight-sized
    transpose, folded by XLA), so each grid step is ONE full-width MXU dot
    whose (bh*W, r*C) result IS the output block — no in-kernel stacking,
    and every block is full in its trailing two dims (Mosaic-legal for any
    channel count). The final 5D->4D reshape is a pure row-major
    reinterpretation."""
    n, h, wdim, cin = x.shape
    rr, cin_w, c = w_kmajor.shape
    assert rr == r * r and cin_w == cin
    rc = r * c
    # (rr, Cin, C) -> (r[dy], Cin, r*C): lane dim becomes the (dx, c) pair
    w2 = w_kmajor.reshape(r, r, cin, c).transpose(0, 2, 1, 3)
    w2 = w2.reshape(r, cin, rc)
    b2 = bias_kmajor.reshape(r, 1, rc)
    bh = _largest_divisor(h, block_h)
    out5 = pl.pallas_call(
        _conv1x1_kernel,
        grid=(n, h // bh, r),
        in_specs=[
            pl.BlockSpec((1, bh, wdim, cin), lambda ni, i, dy: (ni, i, 0, 0)),
            pl.BlockSpec((1, cin, rc), lambda ni, i, dy: (dy, 0, 0)),
            pl.BlockSpec((1, 1, rc), lambda ni, i, dy: (dy, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, bh, 1, wdim, rc), lambda ni, i, dy: (ni, i, dy, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, r, wdim, rc), x.dtype),
        interpret=interpret,
    )(x, w2, b2)
    return out5.reshape(n, h * r, wdim * r, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _conv1x1_vjp(x, w_kmajor, bias_kmajor, r, block_h, interpret):
    return _conv1x1_impl(x, w_kmajor, bias_kmajor, r, block_h, interpret)


def _conv1x1_fwd(x, w_kmajor, bias_kmajor, r, block_h, interpret):
    return (_conv1x1_impl(x, w_kmajor, bias_kmajor, r, block_h, interpret),
            (x, w_kmajor))


def _conv1x1_bwd(r, block_h, interpret, res, g):
    x, w = res
    rr = r * r
    gk = _kmajor_space_to_depth(g, r)  # (n, h, w, rr*C)
    n, h, wd, _ = gk.shape
    gk5 = gk.reshape(n, h, wd, rr, w.shape[-1])
    dx = jnp.einsum("nhwkc,kic->nhwi", gk5, w,
                    preferred_element_type=jnp.float32).astype(x.dtype)
    dw = jnp.einsum("nhwi,nhwkc->kic", x, gk5,
                    preferred_element_type=jnp.float32).astype(w.dtype)
    db = gk5.sum((0, 1, 2)).astype(w.dtype)
    return dx, dw, db


_conv1x1_vjp.defvjp(_conv1x1_fwd, _conv1x1_bwd)


@functools.partial(jax.jit,
                   static_argnames=("r", "block_h", "interpret"))
def subpel_conv1x1(x, w_kmajor, bias_kmajor, r: int = 2, block_h: int = 8,
                   interpret: bool = False):
    """Fused 1x1 conv + pixel shuffle: MXU dot per (dy,dx) plane, shuffled
    write, conv output never hits HBM.

    x: (N, H, W, Cin); w_kmajor: (r*r, Cin, C); bias_kmajor: (r*r, C).
    Returns (N, H*r, W*r, C). Equivalent to
    pixel_shuffle(conv1x1(x, w, b), r) with torch channel order when
    w/b were permuted via reshape from permute_out_channels (exactness
    pinned by tests/test_subpel_pallas.py). Differentiable (custom VJP:
    matmul cotangents over the inverse permutation)."""
    return _conv1x1_vjp(x, w_kmajor, bias_kmajor, r, block_h, interpret)
