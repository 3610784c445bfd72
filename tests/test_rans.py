"""Round-trip tests for the native rANS layer (symbols -> bytes -> symbols).

Covers the behaviors the reference validates only implicitly through its
encode-then-decode eval harnesses (SURVEY.md section 4): exact round-trip,
bypass escape coding for out-of-range symbols, multi-CDF indexing, and
CDF quantization invariants.
"""

import numpy as np
import pytest

from vcm_ts_tpu.entropy import rans
from vcm_ts_tpu.entropy.rans import (BufferedRansEncoder, RansDecoder,
                                     pmf_to_quantized_cdf)


def _gaussian_pmf(n, sigma):
    xs = np.arange(n) - n // 2
    pmf = np.exp(-0.5 * (xs / sigma) ** 2)
    return pmf / pmf.sum()


def _make_tables(sigmas, n=33, precision=16):
    cdfs, sizes, offsets = [], [], []
    for s in sigmas:
        pmf = _gaussian_pmf(n, s)
        # one extra slot for the escape symbol (tail mass)
        pmf_full = np.concatenate([pmf * 0.999, [0.001]])
        cdf = pmf_to_quantized_cdf(pmf_full, precision)
        cdfs.append(cdf)
        sizes.append(len(cdf))
        offsets.append(-(n // 2))
    max_len = max(len(c) for c in cdfs)
    table = np.zeros((len(cdfs), max_len), dtype=np.int32)
    for i, c in enumerate(cdfs):
        table[i, :len(c)] = c
    return table, np.asarray(sizes, np.int32), np.asarray(offsets, np.int32)


def test_native_library_builds():
    assert rans.native_available(), "native rANS library failed to build"


def test_pmf_to_quantized_cdf_invariants():
    for sigma in [0.5, 2.0, 10.0]:
        pmf = _gaussian_pmf(65, sigma)
        cdf = pmf_to_quantized_cdf(pmf, 16)
        assert cdf[0] == 0
        assert cdf[-1] == 1 << 16
        assert np.all(np.diff(cdf) >= 1), "every symbol needs freq >= 1"


def test_pmf_to_quantized_cdf_matches_python_fallback():
    for sigma in [0.3, 1.7, 25.0]:
        pmf = _gaussian_pmf(41, sigma).astype(np.float32)
        native = pmf_to_quantized_cdf(pmf, 16)
        pure = rans._py_pmf_to_quantized_cdf(pmf, 16)
        np.testing.assert_array_equal(native, pure)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_round_trip_in_range(seed):
    rng = np.random.default_rng(seed)
    table, sizes, offsets = _make_tables([1.0, 3.0, 8.0, 20.0])
    n = 5000
    indexes = rng.integers(0, 4, n).astype(np.int32)
    symbols = (rng.normal(0, 3, n).round().clip(-14, 14).astype(np.int32)
               + offsets[indexes] + 16)

    enc = BufferedRansEncoder()
    enc.encode_with_indexes(symbols, indexes, table, sizes, offsets)
    stream = enc.flush()
    assert len(stream) > 0 and len(stream) % 4 == 0

    dec = RansDecoder()
    dec.set_stream(stream)
    out = dec.decode_stream(indexes, table, sizes, offsets)
    np.testing.assert_array_equal(out, symbols)


def test_round_trip_bypass_escapes():
    """Symbols far outside the CDF alphabet must survive via bypass coding."""
    table, sizes, offsets = _make_tables([2.0, 5.0])
    rng = np.random.default_rng(7)
    n = 512
    indexes = rng.integers(0, 2, n).astype(np.int32)
    symbols = rng.integers(-4000, 4000, n).astype(np.int32)
    # sprinkle extreme values (2^30 exercises the >=8-chunk bypass chain that
    # would hit undefined 32-bit shifts if raw_val were not widened to 64-bit)
    symbols[::50] = 1 << 30
    symbols[1::50] = -(1 << 30)

    enc = BufferedRansEncoder()
    enc.encode_with_indexes(symbols, indexes, table, sizes, offsets)
    stream = enc.flush()
    dec = RansDecoder()
    dec.set_stream(stream)
    out = dec.decode_stream(indexes, table, sizes, offsets)
    np.testing.assert_array_equal(out, symbols)


def test_multiple_encode_calls_one_flush():
    """The buffered encoder interleaves several planes into one stream,
    mirroring how compress() concatenates z/mv/y planes
    (reference video_model.py:333-340)."""
    table, sizes, offsets = _make_tables([1.0, 4.0, 12.0])
    rng = np.random.default_rng(3)
    planes = []
    enc = BufferedRansEncoder()
    for _ in range(6):
        n = int(rng.integers(100, 400))
        idx = rng.integers(0, 3, n).astype(np.int32)
        sym = rng.integers(-20, 20, n).astype(np.int32)
        enc.encode_with_indexes(sym, idx, table, sizes, offsets)
        planes.append((sym, idx))
    stream = enc.flush()

    dec = RansDecoder()
    dec.set_stream(stream)
    for sym, idx in planes:
        out = dec.decode_stream(idx, table, sizes, offsets)
        np.testing.assert_array_equal(out, sym)


def test_reset_clears_buffer():
    table, sizes, offsets = _make_tables([2.0])
    enc = BufferedRansEncoder()
    enc.encode_with_indexes([1, 2, 3], [0, 0, 0], table, sizes, offsets)
    enc.reset()
    enc.encode_with_indexes([5], [0], table, sizes, offsets)
    stream = enc.flush()
    dec = RansDecoder()
    dec.set_stream(stream)
    out = dec.decode_stream([0], table, sizes, offsets)
    np.testing.assert_array_equal(out, [5])


def test_python_fallback_interop_with_native():
    """Fallback encoder's bytes must decode with the native decoder and
    vice versa (single format)."""
    if not rans.native_available():
        pytest.skip("no native library")
    table, sizes, offsets = _make_tables([1.5, 6.0])
    rng = np.random.default_rng(11)
    n = 300
    idx = rng.integers(0, 2, n).astype(np.int32)
    sym = rng.integers(-100, 100, n).astype(np.int32)

    py_enc = rans._PyEncoder()
    py_enc.encode_with_indexes(sym, idx, table, sizes, offsets)
    stream_py = py_enc.flush()

    native_enc = BufferedRansEncoder()
    native_enc.encode_with_indexes(sym, idx, table, sizes, offsets)
    stream_native = native_enc.flush()

    assert stream_py == stream_native

    dec = RansDecoder()
    dec.set_stream(stream_py)
    np.testing.assert_array_equal(dec.decode_stream(idx, table, sizes, offsets), sym)

    py_dec = rans._PyDecoder()
    py_dec.set_stream(stream_native)
    np.testing.assert_array_equal(
        py_dec.decode_stream(idx, table, sizes, offsets), sym)
