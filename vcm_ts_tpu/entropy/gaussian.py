"""Scale-indexed Gaussian/Laplace conditional coder.

TPU-native equivalent of the reference GaussianEncoder
(DCVC_HEM/src/entropy_models/entropy_models.py:198-288): a 256-level
log-spaced scale table; predicted sigmas map to table rows; per-row
quantized CDFs drive the host rANS coder. Index computation runs on device
(JAX); table construction is host-side numpy.
"""

from __future__ import annotations

import math
import os

import jax.numpy as jnp
import numpy as np

from .tables import CdfTable, build_cdf_table

_SHIPPED = os.path.join(os.path.dirname(__file__), "data", "gaussian_cdf.npz")
_shipped_cache: dict = {}


def _load_shipped(distribution: str) -> CdfTable | None:
    """Shipped quantized-CDF format constant (tools/gen_gaussian_tables.py)."""
    if distribution in _shipped_cache:
        return _shipped_cache[distribution]
    table = None
    if os.path.exists(_SHIPPED):
        with np.load(_SHIPPED) as z:
            table = CdfTable(
                cdf=z[f"{distribution}_cdf"].copy(),
                sizes=z[f"{distribution}_sizes"].copy(),
                offsets=z[f"{distribution}_offsets"].copy())
    _shipped_cache[distribution] = table
    return table


class GaussianCoder:
    def __init__(self, distribution: str = "laplace"):
        assert distribution in ("laplace", "gaussian")
        self.distribution = distribution
        if distribution == "laplace":
            self.scale_min, self.scale_max, self.levels = 0.01, 64.0, 256
        else:
            self.scale_min, self.scale_max, self.levels = 0.11, 64.0, 256
        self.log_scale_min = math.log(self.scale_min)
        self.log_scale_max = math.log(self.scale_max)
        self.log_scale_step = (
            (self.log_scale_max - self.log_scale_min) / (self.levels - 1))
        self.scale_table = np.exp(np.linspace(
            self.log_scale_min, self.log_scale_max, self.levels)).astype(np.float64)

    # ---------------------------------------------------------------- device
    def build_indexes(self, scales):
        """Map predicted sigma -> scale-table row (entropy_models.py:264-268).
        Pure jnp; runs inside jitted compress/decompress stages."""
        scales = jnp.maximum(scales, 1e-5)
        indexes = (jnp.log(scales) - self.log_scale_min) / self.log_scale_step
        return jnp.clip(indexes, 0, self.levels - 1).astype(jnp.int32)

    # ------------------------------------------------------------------ host
    def _cdf(self, x, scale):
        if self.distribution == "laplace":
            return 0.5 - 0.5 * np.sign(x) * np.expm1(-np.abs(x) / scale)
        from scipy.special import erf  # scipy is available in the image
        return 0.5 * (1.0 + erf(x / (scale * math.sqrt(2.0))))

    def build_table(self, search_range: int = 50) -> CdfTable:
        """Quantized CDF rows per scale level (entropy_models.py:224-262).

        Loads the shipped format constant when available: the table is
        weight-independent, and the ecosystem's stream format pins it to
        torch-f32 arithmetic (sleef-rounded expm1/erf), which a numpy
        rebuild reproduces only to ~1 ulp — enough to flip quantized
        counts in 12/256 rows and desync cross-framework rANS decode.
        `tools/gen_gaussian_tables.py` bakes the exact constant once; the
        analytic rebuild below is the fallback (self-consistent, but not
        byte-interoperable with reference streams)."""
        if search_range == 50:
            shipped = _load_shipped(self.distribution)
            if shipped is not None:
                return shipped
        scales = self.scale_table  # (L,)
        idx = np.arange(2, search_range + 1)
        # pmf_center: smallest i in [2, R] with cdf(i) > 0.9999, else R
        probs = self._cdf(idx[:, None].astype(np.float64), scales[None, :])
        ok = probs > 0.9999
        center = np.where(ok.any(axis=0), idx[ok.argmax(axis=0)], search_range)
        center = center.astype(np.int32)

        pmf_length = 2 * center + 1
        max_length = int(pmf_length.max())
        samples = (np.arange(max_length, dtype=np.float64)[None, :]
                   - center[:, None])  # (L, K)

        upper = self._cdf(samples + 0.5, scales[:, None])
        lower = self._cdf(samples - 0.5, scales[:, None])
        pmf = (upper - lower).astype(np.float32)
        tail_mass = (2.0 * lower[:, 0]).astype(np.float32)

        return build_cdf_table(pmf, tail_mass, pmf_length, -center)
