"""Parity tests for NHWC Flax ops vs PyTorch (CPU) reference semantics.

These pin down the conventions that make reference-checkpoint porting
possible: explicit conv padding, PixelShuffle channel order, bilinear resize
(align_corners=False), grid-sample warping (align_corners=True, border), and
the LowerBound gradient rule.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from vcm_ts_tpu.ops import layers as L
from vcm_ts_tpu.ops import math as M
from vcm_ts_tpu.ops import resize as R
from vcm_ts_tpu.ops.warp import flow_warp


def nchw(x):  # jax NHWC array -> torch NCHW tensor
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))


def nhwc(t):  # torch NCHW tensor -> numpy NHWC
    return t.detach().numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize("stride,kernel", [(1, 3), (2, 3), (1, 1), (2, 1), (1, 7)])
def test_conv_matches_torch(stride, kernel):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 10, 5)).astype(np.float32)
    w = rng.normal(size=(7, 5, kernel, kernel)).astype(np.float32)  # OIHW
    b = rng.normal(size=(7,)).astype(np.float32)

    mod = L.conv(7, kernel, stride)()
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                         "bias": jnp.asarray(b)}}
    out = mod.apply(params, jnp.asarray(x))

    tout = F.conv2d(nchw(x), torch.from_numpy(w), torch.from_numpy(b),
                    stride=stride, padding=kernel // 2)
    np.testing.assert_allclose(np.asarray(out), nhwc(tout), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("r", [2, 4])
def test_pixel_shuffle_matches_torch(r):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 5, 6 * r * r)).astype(np.float32)
    out = L.pixel_shuffle(jnp.asarray(x), r)
    tout = F.pixel_shuffle(nchw(x), r)
    np.testing.assert_allclose(np.asarray(out), nhwc(tout), atol=1e-6)


def test_bilinear_resize_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 6, 8, 3)).astype(np.float32)
    up = R.bilinear_up2(jnp.asarray(x))
    tup = F.interpolate(nchw(x), scale_factor=2, mode="bilinear",
                        align_corners=False)
    np.testing.assert_allclose(np.asarray(up), nhwc(tup), rtol=1e-5, atol=1e-5)

    down = R.bilinear_down2(jnp.asarray(x))
    tdown = F.interpolate(nchw(x), scale_factor=0.5, mode="bilinear",
                          align_corners=False)
    np.testing.assert_allclose(np.asarray(down), nhwc(tdown), rtol=1e-5, atol=1e-5)


def test_avg_and_max_pool_match_torch():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 8, 6, 4)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(R.avg_pool2(jnp.asarray(x))),
        nhwc(F.avg_pool2d(nchw(x), 2, 2)), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(R.max_pool2(jnp.asarray(x))),
        nhwc(F.max_pool2d(nchw(x), 2, 2)), rtol=1e-6, atol=1e-6)


def test_flow_warp_matches_torch_grid_sample():
    """Reference torch_warp (video_net.py:32-55): align_corners=True grid +
    pixel-displacement flow + border padding + bilinear."""
    rng = np.random.default_rng(4)
    n, h, w, c = 2, 9, 12, 3
    im = rng.normal(size=(n, h, w, c)).astype(np.float32)
    flow = (rng.normal(size=(n, h, w, 2)) * 3).astype(np.float32)

    out = flow_warp(jnp.asarray(im), jnp.asarray(flow))

    tim = nchw(im)
    tflow = nchw(flow)
    ys = torch.linspace(-1, 1, h).view(1, 1, h, 1).expand(n, 1, h, w)
    xs = torch.linspace(-1, 1, w).view(1, 1, 1, w).expand(n, 1, h, w)
    grid = torch.cat([xs, ys], 1)
    norm_flow = torch.cat([tflow[:, 0:1] / ((w - 1) / 2.0),
                           tflow[:, 1:2] / ((h - 1) / 2.0)], 1)
    tout = F.grid_sample(tim, (grid + norm_flow).permute(0, 2, 3, 1),
                         mode="bilinear", padding_mode="border",
                         align_corners=True)
    np.testing.assert_allclose(np.asarray(out), nhwc(tout), rtol=1e-4, atol=1e-4)


def test_lower_bound_gradient_rule():
    def f(x):
        return jnp.sum(M.lower_bound(x, 1.0) * jnp.array([1.0, 1.0, -1.0, -1.0]))

    # below bound & grad pushes down -> blocked; below bound & grad pushes up -> passes
    x = jnp.array([0.5, 2.0, 0.5, 2.0])
    g = jax.grad(f)(x)
    # upstream grads are [1, 1, -1, -1]
    np.testing.assert_allclose(np.asarray(g), [0.0, 1.0, -1.0, -1.0])


def test_laplace_gaussian_bits_match_torch_distributions():
    rng = np.random.default_rng(5)
    y = rng.normal(size=(4, 6, 6, 8)).astype(np.float32) * 3
    sig = (0.1 + rng.random((4, 6, 6, 8)).astype(np.float32) * 5)

    ty, tsig = torch.from_numpy(y), torch.from_numpy(sig)

    lap = torch.distributions.laplace.Laplace(
        torch.zeros_like(tsig), tsig.clamp(1e-5, 1e10))
    probs = lap.cdf(ty + 0.5) - lap.cdf(ty - 0.5)
    ref_bits = torch.clamp_min(-torch.log(probs + 1e-5) / np.log(2.0), 0)
    np.testing.assert_allclose(np.asarray(M.laplace_bits(jnp.asarray(y), jnp.asarray(sig))),
                               ref_bits.numpy(), rtol=5e-3, atol=5e-3)

    nrm = torch.distributions.normal.Normal(
        torch.zeros_like(tsig), tsig.clamp(0.11, 1e10))
    probs = nrm.cdf(ty + 0.5) - nrm.cdf(ty - 0.5)
    ref_bits = torch.clamp_min(-torch.log(probs + 1e-5) / np.log(2.0), 0)
    np.testing.assert_allclose(np.asarray(M.gaussian_bits(jnp.asarray(y), jnp.asarray(sig))),
                               ref_bits.numpy(), rtol=5e-3, atol=5e-3)


def test_quant_ste_gradient_is_identity():
    g = jax.grad(lambda x: jnp.sum(M.quant_ste(x) ** 2))(jnp.array([0.3, 1.7]))
    # d/dx (round(x)^2) with STE = 2*round(x)
    np.testing.assert_allclose(np.asarray(g), [0.0, 4.0])


def test_unet_and_blocks_shapes():
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 16, 16, 64))
    unet = L.UNet(64)
    params = unet.init(rng, x)
    out = unet.apply(params, x)
    assert out.shape == (1, 16, 16, 64)

    enc, dec = L.enc_dec_models(2, 2, 16)
    e = enc()
    p = e.init(rng, jnp.zeros((1, 32, 32, 2)))
    y = e.apply(p, jnp.zeros((1, 32, 32, 2)))
    assert y.shape == (1, 2, 2, 16)
    d = dec()
    pd = d.init(rng, y)
    xr = d.apply(pd, y)
    assert xr.shape == (1, 32, 32, 2)


def test_flow_warp_one_gather_path_matches_torch():
    """C >= 32 dispatches to the single-gather formulation; verify it against
    torch grid_sample too (exactness of the folded taps + clamped coords)."""
    rng = np.random.default_rng(7)
    n, h, w, c = 1, 16, 24, 32
    im = rng.normal(size=(n, h, w, c)).astype(np.float32)
    flow = (rng.normal(size=(n, h, w, 2)) * 4).astype(np.float32)

    out = flow_warp(jnp.asarray(im), jnp.asarray(flow))

    tim = nchw(im)
    tflow = nchw(flow)
    ys = torch.linspace(-1, 1, h).view(1, 1, h, 1).expand(n, 1, h, w)
    xs = torch.linspace(-1, 1, w).view(1, 1, 1, w).expand(n, 1, h, w)
    grid = torch.cat([xs, ys], 1)
    norm_flow = torch.cat([tflow[:, 0:1] / ((w - 1) / 2.0),
                           tflow[:, 1:2] / ((h - 1) / 2.0)], 1)
    tout = F.grid_sample(tim, (grid + norm_flow).permute(0, 2, 3, 1),
                         mode="bilinear", padding_mode="border",
                         align_corners=True)
    np.testing.assert_allclose(np.asarray(out), nhwc(tout), rtol=1e-4,
                               atol=1e-4)


def test_flow_warp_packed_matches_separate():
    """Packing several tensors into one gather must be bit-identical to
    separate flow_warp calls (gather is per-channel independent)."""
    from vcm_ts_tpu.ops.warp import flow_warp_packed

    rng = np.random.default_rng(11)
    a = rng.normal(size=(1, 16, 24, 3)).astype(np.float32)
    b = rng.normal(size=(1, 16, 24, 64)).astype(np.float32)
    flow = (rng.normal(size=(1, 16, 24, 2)) * 5).astype(np.float32)

    wa, wb = flow_warp_packed((jnp.asarray(a), jnp.asarray(b)),
                              jnp.asarray(flow))
    np.testing.assert_array_equal(np.asarray(wa),
                                  np.asarray(flow_warp(jnp.asarray(a),
                                                       jnp.asarray(flow))))
    np.testing.assert_array_equal(np.asarray(wb),
                                  np.asarray(flow_warp(jnp.asarray(b),
                                                       jnp.asarray(flow))))


def test_flow_warp_narrow_channels_matches_torch():
    """3-channel (frame) warp through the one-gather path vs grid_sample."""
    rng = np.random.default_rng(13)
    n, h, w, c = 2, 16, 24, 3
    im = rng.normal(size=(n, h, w, c)).astype(np.float32)
    flow = (rng.normal(size=(n, h, w, 2)) * 6).astype(np.float32)

    out = flow_warp(jnp.asarray(im), jnp.asarray(flow))

    tim = nchw(im)
    tflow = nchw(flow)
    ys = torch.linspace(-1, 1, h).view(1, 1, h, 1).expand(n, 1, h, w)
    xs = torch.linspace(-1, 1, w).view(1, 1, 1, w).expand(n, 1, h, w)
    grid = torch.cat([xs, ys], 1)
    norm_flow = torch.cat([tflow[:, 0:1] / ((w - 1) / 2.0),
                           tflow[:, 1:2] / ((h - 1) / 2.0)], 1)
    tout = F.grid_sample(tim, (grid + norm_flow).permute(0, 2, 3, 1),
                         mode="bilinear", padding_mode="border",
                         align_corners=True)
    np.testing.assert_allclose(np.asarray(out), nhwc(tout), rtol=1e-4,
                               atol=1e-4)


def test_debug_nans_sanitizer_raises_at_producing_op():
    """cfg.SOLVER.DEBUG_NANS wiring (utils/common.enable_debug_nans): a NaN
    produced inside a jitted program must raise FloatingPointError instead
    of silently poisoning downstream training state."""
    import jax

    from vcm_ts_tpu.utils.common import enable_debug_nans

    @jax.jit
    def bad(x):
        return jnp.log(x) * 2.0

    enable_debug_nans()
    try:
        with np.testing.assert_raises(FloatingPointError):
            jax.block_until_ready(bad(jnp.asarray(-1.0)))
        # and clean inputs still work with the sanitizer on
        assert np.isfinite(float(bad(jnp.asarray(1.0))))
    finally:
        enable_debug_nans(False)
