"""Entropy-model layer tests: analytic bit costs vs real bitstream sizes,
table construction, and round-trips through the learned/conditional coders.

This covers SURVEY.md section 4's implied contract (b): train-mode (analytic)
and eval-mode (real rANS) bit counts must agree closely.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vcm_ts_tpu.entropy import bit_estimator as be
from vcm_ts_tpu.entropy.coder import EntropyCoder
from vcm_ts_tpu.entropy.gaussian import GaussianCoder
from vcm_ts_tpu.ops.math import laplace_bits, gaussian_bits


def test_bit_estimator_cdf_monotone_and_bounded():
    model = be.BitEstimator(channel=8)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 1, 8)))
    xs = jnp.linspace(-30, 30, 61)[:, None, None, None]
    xs = jnp.broadcast_to(xs, (61, 1, 1, 8))
    cdf = np.asarray(model.apply(params, xs))[:, 0, 0, :]
    assert np.all(cdf >= 0) and np.all(cdf <= 1)
    assert np.all(np.diff(cdf, axis=0) >= -1e-6), "CDF must be monotone in x"


def test_bit_estimator_table_round_trip_and_bits_match():
    model = be.BitEstimator(channel=16)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 1, 16)))
    table = be.build_table(model, params)
    assert table.n == 16

    rng = np.random.default_rng(0)
    z = rng.normal(0, 3, size=(1, 6, 8, 16)).round().astype(np.int32)
    indexes = be.build_indexes(z.shape)

    coder = EntropyCoder()
    coder.encode_with_indexes(z, indexes, table)
    stream = coder.flush_encoder()

    coder.set_stream(stream)
    out = coder.decode_stream(indexes, table)
    np.testing.assert_array_equal(out, z)

    # analytic bits vs real bytes: within ~6% + small constant
    bits_est = float(np.sum(np.asarray(
        be.z_bits(model, params, jnp.asarray(z, jnp.float32)))))
    bits_real = len(stream) * 8
    assert bits_real < bits_est * 1.06 + 64
    assert bits_real > bits_est * 0.8


def _gaussian_coder_round_trip(distribution):
    gc = GaussianCoder(distribution)
    table = gc.build_table()
    assert table.n == 256

    rng = np.random.default_rng(2)
    n = 4096
    scales = np.exp(rng.uniform(np.log(0.2), np.log(16.0), n)).astype(np.float32)
    if distribution == "laplace":
        y = rng.laplace(0, scales).round().astype(np.int32)
    else:
        y = rng.normal(0, scales).round().astype(np.int32)

    indexes = np.asarray(gc.build_indexes(jnp.asarray(scales)))
    coder = EntropyCoder()
    coder.encode_with_indexes(y, indexes, table)
    stream = coder.flush_encoder()
    coder.set_stream(stream)
    out = coder.decode_stream(indexes, table)
    np.testing.assert_array_equal(out, y)

    bits_fn = laplace_bits if distribution == "laplace" else gaussian_bits
    bits_est = float(np.sum(np.asarray(
        bits_fn(jnp.asarray(y, jnp.float32), jnp.asarray(scales)))))
    bits_real = len(stream) * 8
    # real coding overhead vs analytic estimate stays small
    assert bits_real < bits_est * 1.08 + 64, (bits_real, bits_est)


def test_gaussian_coder_laplace_round_trip():
    _gaussian_coder_round_trip("laplace")


def test_gaussian_coder_gaussian_round_trip():
    _gaussian_coder_round_trip("gaussian")


def test_build_indexes_clamps_to_table():
    gc = GaussianCoder("laplace")
    scales = jnp.asarray([1e-9, 0.01, 1.0, 64.0, 1e9])
    idx = np.asarray(gc.build_indexes(scales))
    assert idx[0] == 0 and idx[1] == 0
    assert idx[-1] == 255 and idx[-2] == 255
    assert 0 < idx[2] < 255


def test_interleaved_planes_one_stream():
    """z plane (learned CDF) + y plane (scale-table CDF) through one buffered
    encoder, decoded sequentially — the per-frame pattern of compress()
    (reference video_model.py:333-340)."""
    model = be.BitEstimator(channel=4)
    params = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 1, 1, 4)))
    z_table = be.build_table(model, params)
    gc = GaussianCoder("laplace")
    y_table = gc.build_table()

    rng = np.random.default_rng(4)
    z = rng.normal(0, 2, size=(1, 4, 4, 4)).round().astype(np.int32)
    z_idx = be.build_indexes(z.shape)
    scales = np.full((1, 4, 4, 4), 2.0, np.float32)
    y = rng.laplace(0, 2, size=(1, 4, 4, 4)).round().astype(np.int32)
    y_idx = np.asarray(gc.build_indexes(jnp.asarray(scales)))

    coder = EntropyCoder()
    coder.encode_with_indexes(z, z_idx, z_table)
    coder.encode_with_indexes(y, y_idx, y_table)
    stream = coder.flush_encoder()

    coder.set_stream(stream)
    np.testing.assert_array_equal(coder.decode_stream(z_idx, z_table), z)
    np.testing.assert_array_equal(coder.decode_stream(y_idx, y_table), y)


def test_shipped_gaussian_tables_present_and_consistent():
    """The shipped format constant (tools/gen_gaussian_tables.py) must be
    packaged, parse, and agree with the analytic fallback on everything
    except sleef-vs-numpy count rounding: same window sizes/offsets, every
    row a valid 16-bit CDF, and counts within 1 of the fallback's."""
    from vcm_ts_tpu.entropy import gaussian as g

    for dist in ("laplace", "gaussian"):
        shipped = g._load_shipped(dist)
        assert shipped is not None, "gaussian_cdf.npz missing from package"
        gc = g.GaussianCoder(dist)
        assert gc.build_table() is shipped  # default path serves the constant

        # analytic numpy fallback: identical symbol windows (the shipped
        # constant and the f64 rebuild must agree on sizes/offsets — only
        # quantized counts may differ, by ~0.15% of 2^16 where the f32 vs
        # f64 CDF evaluation diverges in the distribution tails)
        orig = g._load_shipped
        g._load_shipped = lambda d: None
        try:
            fallback = gc.build_table()
        finally:
            g._load_shipped = orig
        np.testing.assert_array_equal(shipped.sizes, fallback.sizes)
        np.testing.assert_array_equal(shipped.offsets, fallback.offsets)
        for i, s in enumerate(shipped.sizes):
            row = shipped.cdf[i, :s]
            assert row[0] == 0 and row[-1] == 1 << 16
            assert (np.diff(row) > 0).all(), f"{dist} row {i} not strict"
            np.testing.assert_allclose(
                row, fallback.cdf[i, :s], atol=0.002 * (1 << 16),
                err_msg=f"{dist} row {i}")
