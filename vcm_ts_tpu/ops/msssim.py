"""MS-SSIM in pure JAX (NHWC), matching pytorch_msssim defaults.

The reference evaluates MS-SSIM via the pytorch_msssim package
(DCVC_HEM/test_video.py:161, common_model.py:29): win_size=11, sigma=1.5,
K=(0.01, 0.03), weights (0.0448, 0.2856, 0.3001, 0.2363, 0.1333),
5 scales, data_range=1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_kernel(win_size: int = 11, sigma: float = 1.5):
    xs = np.arange(win_size, dtype=np.float64) - (win_size - 1) / 2.0
    g = np.exp(-(xs ** 2) / (2 * sigma ** 2))
    return jnp.asarray((g / g.sum()).astype(np.float32))


def _blur(x, kernel):
    """Separable depthwise gaussian filter, VALID padding (NHWC)."""
    c = x.shape[-1]
    win = kernel.shape[0]
    kh = jnp.tile(kernel.reshape(win, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(kernel.reshape(1, win, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, (win, 1, 1, c),
                                        ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c)
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, win, 1, c),
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                        dimension_numbers=dn,
                                        feature_group_count=c)


def _ssim_per_channel(x, y, kernel, data_range=1.0, k=(0.01, 0.03)):
    c1 = (k[0] * data_range) ** 2
    c2 = (k[1] * data_range) ** 2

    mu_x = _blur(x, kernel)
    mu_y = _blur(y, kernel)
    sigma_x = _blur(x * x, kernel) - mu_x ** 2
    sigma_y = _blur(y * y, kernel) - mu_y ** 2
    sigma_xy = _blur(x * y, kernel) - mu_x * mu_y

    cs = (2 * sigma_xy + c2) / (sigma_x + sigma_y + c2)
    ssim = ((2 * mu_x * mu_y + c1) / (mu_x ** 2 + mu_y ** 2 + c1)) * cs
    # mean over spatial, per (N, C)
    return jnp.mean(ssim, axis=(1, 2)), jnp.mean(cs, axis=(1, 2))


def _downsample2(x):
    """avg_pool 2x2 matching pytorch_msssim: F.avg_pool2d(x, 2,
    padding=s % 2) pads SYMMETRICALLY and includes the pad in the average
    (count_include_pad=True); output size floor(h/2) + (h % 2)."""
    n, h, w, c = x.shape
    x = jnp.pad(x, ((0, 0), (h % 2, h % 2), (w % 2, w % 2), (0, 0)))
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") * 0.25


def ms_ssim(x, y, data_range: float = 1.0, win_size: int = 11,
            sigma: float = 1.5, weights=_WEIGHTS):
    """Multi-scale SSIM; returns per-batch values (N,)."""
    kernel = _gaussian_kernel(win_size, sigma).astype(x.dtype)
    levels = len(weights)
    mcs = []
    ssim = None
    for i in range(levels):
        ssim, cs = _ssim_per_channel(x, y, kernel, data_range)
        if i < levels - 1:
            mcs.append(jax.nn.relu(cs))
            x = _downsample2(x)
            y = _downsample2(y)
    ssim = jax.nn.relu(ssim)
    weights = jnp.asarray(weights, x.dtype)
    mcs_stack = jnp.stack(mcs + [ssim], axis=0)  # (L, N, C)
    out = jnp.prod(mcs_stack ** weights[:, None, None], axis=0)
    return jnp.mean(out, axis=-1)


def psnr(x, y, data_range: float = 1.0):
    """Per-batch PSNR (test_video.py:74-77 computes a scalar; this returns
    (N,) means over all other axes)."""
    mse = jnp.mean((x - y) ** 2, axis=tuple(range(1, x.ndim)))
    return 20 * jnp.log10(data_range / jnp.sqrt(jnp.maximum(mse, 1e-12)))
