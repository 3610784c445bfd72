"""Pallas warp kernel tests (interpret mode on CPU).

The kernel implements two-pass separable warping (documented in
ops/warp_pallas.py): exact vs the gather warp for axis-aligned flows, and
exactly equal to a direct numpy two-pass evaluation for arbitrary flows.
"""

import jax.numpy as jnp
import numpy as np

from vcm_ts_tpu.ops.warp import flow_warp
from vcm_ts_tpu.ops.warp_pallas import flow_warp_pallas


def _two_pass_ref(im, flow, D):
    n, h, w, c = im.shape
    out = np.zeros_like(im)
    for b in range(n):
        fy, fx = flow[b, ..., 1], flow[b, ..., 0]
        gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
        py = np.clip(gy + fy, 0, h - 1)
        px = np.clip(gx + fx, 0, w - 1)
        y0, x0 = np.floor(py), np.floor(px)
        wy, wx = py - y0, px - x0
        dy = np.clip(y0 - gy, -D, D).astype(int)
        dx = np.clip(x0 - gx, -D, D).astype(int)
        v = np.zeros((h, w, c), np.float32)
        pad = np.pad(im[b], ((D, D + 1), (0, 0), (0, 0)))
        for i in range(h):
            for j in range(w):
                yy = i + dy[i, j] + D
                v[i, j] = (1 - wy[i, j]) * pad[yy, j] + wy[i, j] * pad[yy + 1, j]
        for i in range(h):
            for j in range(w):
                xx = (j + dx[i, j]) % w
                xx1 = (j + dx[i, j] + 1) % w
                out[b, i, j] = ((1 - wx[i, j]) * v[i, xx]
                                + wx[i, j] * v[i, xx1])
    return out


def test_axis_aligned_flows_exact_vs_gather():
    rng = np.random.default_rng(0)
    im = jnp.asarray(rng.random((1, 16, 128, 8)), jnp.float32)
    for f in [(0.0, 0.0), (1.5, 0.0), (0.0, -2.25), (3.0, 0.0)]:
        flow = jnp.zeros((1, 16, 128, 2)).at[..., 0].set(f[0]).at[..., 1].set(f[1])
        out = flow_warp_pallas(im, flow, max_disp=8, block_h=8, block_c=8,
                               interpret=True)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(flow_warp(im, flow)), atol=1e-5)


def test_matches_two_pass_reference_general_flows():
    rng = np.random.default_rng(1)
    im = rng.random((1, 16, 128, 8)).astype(np.float32)
    flow = rng.normal(0, 2.5, (1, 16, 128, 2)).astype(np.float32)
    ref = _two_pass_ref(im, flow, 8)
    out = flow_warp_pallas(jnp.asarray(im), jnp.asarray(flow), max_disp=8,
                           block_h=8, block_c=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_odd_shapes_and_channel_padding():
    rng = np.random.default_rng(2)
    im = rng.random((2, 24, 100, 3)).astype(np.float32)
    flow = rng.normal(0, 1.5, (2, 24, 100, 2)).astype(np.float32)
    out = flow_warp_pallas(jnp.asarray(im), jnp.asarray(flow), max_disp=8,
                           block_h=8, block_c=8, interpret=True)
    ref = _two_pass_ref(im, flow, 8)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_quality_gate_two_pass_not_bd_neutral():
    """Round-2 quality gate (VERDICT item 6): on realistic smooth flow
    fields the two-pass kernel deviates from the exact warp by far more
    than quantization noise, so it must NOT be the default. This test
    pins the measured numbers; if the kernel is ever made exact, these
    bounds flip and the default decision should be revisited."""
    rng = np.random.default_rng(0)
    H, W, C = 128, 256, 32

    img = np.kron(rng.random((1, H // 8, W // 8, C)),
                  np.ones((1, 8, 8, 1))).astype(np.float32)
    img += 0.1 * rng.standard_normal((1, H, W, C)).astype(np.float32)
    img = jnp.asarray(img)

    def smooth_field(scale, mag, seed):
        r = np.random.default_rng(seed)
        base = r.standard_normal((2, H // scale + 2, W // scale + 2))
        up = np.stack([np.kron(b, np.ones((scale, scale)))[:H, :W]
                       for b in base], -1)
        k = scale
        up = np.cumsum(np.cumsum(up, 0), 1)
        up = (up[k:, k:] - up[:-k, k:] - up[k:, :-k] + up[:-k, :-k]) / (k * k)
        up = np.pad(up, ((0, H - up.shape[0]), (0, W - up.shape[1]), (0, 0)),
                    mode="edge")
        return (up / np.abs(up).max() * mag).astype(np.float32)[None]

    def psnr(a, b):
        mse = float(jnp.mean((a.astype(jnp.float32)
                              - b.astype(jnp.float32)) ** 2))
        return 99.0 if mse < 1e-12 else -10 * np.log10(mse)

    flow = jnp.asarray(smooth_field(16, 12.0, 2))
    exact = flow_warp(img, flow)
    fast = flow_warp_pallas(img, flow, interpret=True)
    p = psnr(exact, fast)
    # measured ~20 dB on smooth +-12 px fields — a visible-error regime,
    # nowhere near BD-neutral (quantization noise would be > 40 dB)
    assert p < 35.0, f"two-pass kernel now at {p:.1f} dB vs exact — " \
        "re-evaluate making it the default"
