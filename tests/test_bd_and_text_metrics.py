"""BD-metric and OCR-text-metric tests with analytically known results."""

import numpy as np

from vcm_ts_tpu.eval.bd_metrics import bd_psnr, bd_rate, fix_curve
from vcm_ts_tpu.eval.text_metrics import (calculate_ocr_metrics, cer,
                                          jaro_winkler, levenshtein)


def test_bd_rate_identical_curves_is_zero():
    r = [0.1, 0.2, 0.4, 0.8]
    q = [30.0, 33.0, 36.0, 39.0]
    assert abs(bd_rate(r, q, r, q)) < 1e-9
    assert abs(bd_psnr(r, q, r, q)) < 1e-9


def test_bd_rate_constant_rate_shift():
    """Test curve with exactly 2x the rate at every quality -> +100%."""
    r = np.array([0.1, 0.2, 0.4, 0.8])
    q = [30.0, 33.0, 36.0, 39.0]
    assert abs(bd_rate(r, q, 2 * r, q) - 100.0) < 1e-6
    assert abs(bd_rate(r, q, 0.5 * r, q) + 50.0) < 1e-6


def test_bd_psnr_constant_quality_shift():
    r = [0.1, 0.2, 0.4, 0.8]
    q = np.array([30.0, 33.0, 36.0, 39.0])
    assert abs(bd_psnr(r, q, r, q + 1.5) - 1.5) < 1e-6


def test_fix_curve_monotonicity():
    # direction from first vs last point: ascending here, so the dip at 0.4
    # is lifted and the flat 0.6 is nudged up
    out = fix_curve([0.5, 0.4, 0.6, 0.6])
    assert all(b > a for a, b in zip(out, out[1:]))
    # descending overall: the bump at 0.3 is pushed down
    out = fix_curve([0.3, 0.4, 0.1])
    assert all(b < a for a, b in zip(out, out[1:]))


def test_levenshtein_and_cer():
    assert levenshtein("kitten", "sitting") == 3
    assert cer("ABC123", "ABC123") == 0.0
    assert abs(cer("ABC123", "ABC12") - 1 / 6) < 1e-9


def test_jaro_winkler_known_value():
    # classic example: MARTHA vs MARHTA = 0.9611
    assert abs(jaro_winkler("MARTHA", "MARHTA") - 0.9611) < 1e-3
    assert jaro_winkler("ABC", "ABC") == 1.0
    assert jaro_winkler("ABC", "XYZ") == 0.0


def test_ocr_metrics_bundle():
    refs = ["AB123", "XY789"]
    hyps = ["AB123", "XY780"]
    m = calculate_ocr_metrics(refs, hyps)
    assert m["full"] == 50.0
    assert abs(m["symbol_equal_len"] - (100 + 80) / 2) < 1e-9
    assert abs(m["cer"] - (100 + 80) / 2) < 1e-9
    assert 50 < m["RO"] <= 100 and 50 < m["JW"] <= 100
