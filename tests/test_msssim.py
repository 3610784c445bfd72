"""MS-SSIM/PSNR metric tests (pytorch_msssim is not in the image, so the
gaussian-window SSIM core is validated against a direct numpy computation
and MS-SSIM against its invariants)."""

import jax.numpy as jnp
import numpy as np
from scipy.ndimage import convolve

from vcm_ts_tpu.ops.msssim import (_gaussian_kernel, _ssim_per_channel,
                                   ms_ssim, psnr)


def test_psnr_formula():
    x = jnp.zeros((2, 8, 8, 3))
    y = jnp.full((2, 8, 8, 3), 0.1)
    out = np.asarray(psnr(x, y))
    np.testing.assert_allclose(out, 20 * np.log10(1 / 0.1), rtol=1e-5)


def test_ssim_matches_numpy_reference():
    rng = np.random.default_rng(0)
    x = rng.random((1, 32, 32, 1)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.05, x.shape), 0, 1).astype(np.float32)

    k = np.asarray(_gaussian_kernel())
    win = np.outer(k, k)

    def blur(a):
        return convolve(a, win, mode="constant")[5:-5, 5:-5]

    xs, ys = x[0, :, :, 0], y[0, :, :, 0]
    mu_x, mu_y = blur(xs), blur(ys)
    sx = blur(xs * xs) - mu_x ** 2
    sy = blur(ys * ys) - mu_y ** 2
    sxy = blur(xs * ys) - mu_x * mu_y
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    cs = (2 * sxy + c2) / (sx + sy + c2)
    ssim_ref = np.mean((2 * mu_x * mu_y + c1) / (mu_x ** 2 + mu_y ** 2 + c1) * cs)

    ssim_jax, _ = _ssim_per_channel(jnp.asarray(x), jnp.asarray(y),
                                    jnp.asarray(k, jnp.float32))
    np.testing.assert_allclose(float(ssim_jax[0, 0]), ssim_ref, atol=2e-4)


def test_ms_ssim_invariants():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 192, 192, 3)), jnp.float32)
    assert float(ms_ssim(x, x)[0]) > 0.9999

    y1 = jnp.clip(x + 0.02 * rng.standard_normal(x.shape).astype(np.float32), 0, 1)
    y2 = jnp.clip(x + 0.10 * rng.standard_normal(x.shape).astype(np.float32), 0, 1)
    v1, v2 = float(ms_ssim(x, y1)[0]), float(ms_ssim(x, y2)[0])
    assert 0 < v2 < v1 < 1.0
