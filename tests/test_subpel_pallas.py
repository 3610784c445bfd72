"""Pallas subpel-shuffle kernels: exactness vs the reference formulation
(interpret mode on CPU).

Unlike fast-warp these are EXACT relayouts/matmuls — the gate here is
bit-level (relayout) / f32-tight (fused dot), not a quality tolerance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vcm_ts_tpu.ops import layers
from vcm_ts_tpu.ops.layers import pixel_shuffle
from vcm_ts_tpu.ops.subpel_pallas import (permute_out_channels,
                                          pixel_shuffle_relayout,
                                          subpel_conv1x1)


def _kmajor(y, r):
    """Re-order a c-major (torch PixelShuffle) channel dim to k-major."""
    *lead, o = y.shape
    c = o // (r * r)
    return np.asarray(y).reshape(*lead, c, r * r).swapaxes(-1, -2) \
        .reshape(*lead, o)


def test_relayout_matches_pixel_shuffle():
    rng = np.random.default_rng(0)
    for (h, w, c, r) in [(8, 16, 8, 2), (5, 7, 3, 2), (4, 4, 2, 3)]:
        y = rng.standard_normal((2, h, w, c * r * r)).astype(np.float32)
        want = np.asarray(pixel_shuffle(jnp.asarray(y), r))
        got = np.asarray(pixel_shuffle_relayout(
            jnp.asarray(_kmajor(y, r)), r, interpret=True))
        np.testing.assert_array_equal(got, want)


def test_permute_out_channels_roundtrip():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((3, 3, 5, 4 * 6)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(permute_out_channels(jnp.asarray(w), 2)), _kmajor(w, 2))


def test_fused_conv1x1_matches_conv_plus_shuffle():
    rng = np.random.default_rng(2)
    n, h, w, cin, c, r = 1, 8, 12, 16, 8, 2
    x = rng.standard_normal((n, h, w, cin)).astype(np.float32)
    wt = rng.standard_normal((1, 1, cin, c * r * r)).astype(np.float32)
    b = rng.standard_normal((c * r * r,)).astype(np.float32)

    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(wt), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    want = np.asarray(pixel_shuffle(ref, r))

    wp = permute_out_channels(jnp.asarray(wt), r)
    wk = wp.reshape(cin, r * r, c).transpose(1, 0, 2)
    bk = permute_out_channels(jnp.asarray(b), r).reshape(r * r, c)
    got = np.asarray(subpel_conv1x1(jnp.asarray(x), wk, bk, r,
                                    interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_gradients_match_plain_path():
    """jax.grad through the fast path == grad through conv+pixel_shuffle
    (custom VJPs), for both the relayout and the fused 1x1 kernel."""
    from vcm_ts_tpu.ops.layers import SubpelConv

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 8, 12, 6)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((1, 16, 24, 4)), jnp.float32)
    for kernel in (1, 3):
        mod = SubpelConv(4, 2, kernel=kernel)
        params = mod.init(jax.random.PRNGKey(0), x)

        def loss(p, xx):
            return jnp.mean((mod.apply(p, xx) - tgt) ** 2)

        gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
        layers.set_fast_shuffle(True)
        try:
            gp_f, gx_f = jax.grad(loss, argnums=(0, 1))(params, x)
        finally:
            layers.set_fast_shuffle(False)
        np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"dx kernel={kernel}")
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            gp_f, gp)


def test_subpel_conv_module_fast_path():
    """SubpelConv with the flag on == plain path, for both kernel sizes,
    with the SAME param tree (checkpoint-interchangeable)."""
    from vcm_ts_tpu.ops.layers import SubpelConv

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 8, 12, 6)), jnp.float32)
    for kernel in (1, 3):
        mod = SubpelConv(4, 2, kernel=kernel)
        params = mod.init(jax.random.PRNGKey(0), x)
        want = np.asarray(mod.apply(params, x))
        layers.set_fast_shuffle(True)
        try:
            params_fast = mod.init(jax.random.PRNGKey(0), x)
            got = np.asarray(mod.apply(params, x))
        finally:
            layers.set_fast_shuffle(False)
        # identical parameter trees (names + shapes + init values)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), params, params_fast)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5,
                                   err_msg=f"kernel={kernel}")


def test_subpel_conv_module_fast_path_mixed_precision():
    """bf16 input + f32 params: the fast path must follow nn.Conv's
    promote_dtype semantics (compute in f32, f32 output), not downcast
    the weights to the activation dtype."""
    from vcm_ts_tpu.ops.layers import SubpelConv

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 8, 12, 6)), jnp.bfloat16)
    for kernel in (1, 3):
        mod = SubpelConv(4, 2, kernel=kernel)
        params = mod.init(jax.random.PRNGKey(0), x)  # params stay f32
        want = mod.apply(params, x)
        layers.set_fast_shuffle(True)
        try:
            got = mod.apply(params, x)
        finally:
            layers.set_fast_shuffle(False)
        assert got.dtype == want.dtype == jnp.float32, (
            f"kernel={kernel}: dtype {got.dtype} vs plain {want.dtype}")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-5,
            err_msg=f"kernel={kernel}")
