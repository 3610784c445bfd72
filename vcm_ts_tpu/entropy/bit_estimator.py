"""Learned factorized prior over hyper-latents z.

TPU-native equivalent of the reference's Bitparm/BitEstimator
(DCVC_HEM/src/entropy_models/entropy_models.py:54-195): four stacked
monotone nonlinearities parameterize a per-channel CDF; bit cost in training
is analytic; for real coding, `build_table` scans a +/-50 symbol range and
quantizes per-channel CDF rows for the host rANS coder (the reference's
`update()`).

Layout: NHWC — per-channel parameters have shape (1, 1, 1, C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .tables import CdfTable, build_cdf_table


class Bitparm(nn.Module):
    """One monotone CDF layer (entropy_models.py:54-73)."""

    channel: int
    final: bool = False

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.normal(0.01)
        h = self.param("h", init, (1, 1, 1, self.channel))
        b = self.param("b", init, (1, 1, 1, self.channel))
        x = x * jax.nn.softplus(h) + b
        if self.final:
            return x
        a = self.param("a", init, (1, 1, 1, self.channel))
        return x + jnp.tanh(x) * jnp.tanh(a)


class BitEstimator(nn.Module):
    """Factorized-prior CDF model (entropy_models.py:94-117)."""

    channel: int

    @nn.compact
    def __call__(self, x):
        x = Bitparm(self.channel, name="f1")(x)
        x = Bitparm(self.channel, name="f2")(x)
        x = Bitparm(self.channel, name="f3")(x)
        x = Bitparm(self.channel, final=True, name="f4")(x)
        return jax.nn.sigmoid(x)

    def get_cdf(self, params, x):
        return self.apply(params, x)


def z_bits(bit_estimator: BitEstimator, params, z):
    """Analytic bit cost of integer-ish z under the learned CDF
    (common_model.py:71-73)."""
    from ..ops.math import probs_to_bits

    probs = bit_estimator.apply(params, z + 0.5) - bit_estimator.apply(
        params, z - 0.5)
    return probs_to_bits(probs)


def build_indexes(shape) -> np.ndarray:
    """Channel-id index plane for an NHWC tensor shape (N, H, W, C)
    (entropy_models.py:176-181, transposed to channels-last)."""
    n, h, w, c = shape
    return np.broadcast_to(
        np.arange(c, dtype=np.int32)[None, None, None, :], (n, h, w, c))


def _torch_cdf_fn(params):
    """Exact-interop CDF evaluator: the same f32 arithmetic (sleef-rounded
    tanh/sigmoid/softplus) the reference ecosystem's tables are defined by.

    The quantized table IS part of the bitstream format, and torch-f32 vs
    XLA-f32 transcendentals differ by ~1 ulp — enough to flip quantized
    counts in ~1/3 of rows and desync a cross-framework rANS decode
    (measured; see tests/test_full_cross_decode.py). torch is optional:
    without it the jax path below builds self-consistent tables that are
    not byte-interoperable with reference-encoded streams. Verified
    shape-invariant (vectorized body and scalar tail round identically),
    so evaluating on (K, C) grids matches the reference's (C, 1, K) eval.
    """
    try:
        import torch
    except ImportError:
        return None
    p = params["params"]
    layers = []
    for name in ("f1", "f2", "f3", "f4"):
        lp = p[name]
        # f32 eval regardless of the param dtype (bf16 -> f32 is exact,
        # and the table must not depend on the inference dtype)
        def t(v):
            return torch.from_numpy(
                np.asarray(v, dtype=np.float32).reshape(-1).copy())
        layers.append((t(lp["h"]), t(lp["b"]),
                       None if "a" not in lp else t(lp["a"])))

    def cdf(x_np):  # (..., C) numpy f32 -> (..., C) numpy f32
        import torch.nn.functional as F
        with torch.no_grad():
            x = torch.from_numpy(np.ascontiguousarray(x_np, dtype=np.float32))
            for h, b, a in layers:
                x = x * F.softplus(h) + b
                if a is not None:
                    x = x + torch.tanh(x) * torch.tanh(a)
            return torch.sigmoid(x).numpy()

    return cdf


def build_table(bit_estimator: BitEstimator, params,
                search_range: int = 50) -> CdfTable:
    """Build quantized per-channel CDF rows (the reference's
    BitEstimator.update, entropy_models.py:119-174).

    Scans integer symbols in [-search_range, search_range]; per channel finds
    the tightest [(-minima, maxima)] window whose CDF mass covers
    [1e-4, 0.9999], then quantizes the windowed PMF plus escape tail.
    """
    c = bit_estimator.channel
    torch_cdf = _torch_cdf_fn(params)

    if torch_cdf is None:
        # The table IS the stream format: torch-f32 and XLA-f32 tables can
        # quantize differently (module docstring), and the container has no
        # field recording which variant encoded a stream (byte-compat with
        # the reference forbids adding one). Make the hazard visible.
        import logging
        logging.getLogger("CORE").warning(
            "torch not importable: building CDF tables with XLA-f32 "
            "arithmetic. Streams coded with these tables are "
            "self-consistent but may NOT be decodable by a torch-backed "
            "host (or by the reference), and vice versa.")

    if torch_cdf is not None:
        def cdf_at(v):  # (K,) -> (K, C)
            v = np.asarray(v, dtype=np.float32)
            return torch_cdf(np.broadcast_to(v[:, None], (v.shape[0], c)))

        def cdf_grid(s):  # (C, K) -> (C, K)
            return torch_cdf(np.asarray(s, dtype=np.float32).T).T
    else:
        @jax.jit
        def _cdf_at(v):  # v: (K,) -> (K, C)
            x = jnp.broadcast_to(v[:, None, None, None],
                                 (v.shape[0], 1, 1, c))
            return bit_estimator.apply(params, x)[:, 0, 0, :]

        @jax.jit
        def _cdf_grid(s):  # s: (C, K) -> (C, K)
            x = s.T[:, None, None, :]  # (K,1,1,C)
            return bit_estimator.apply(params, x)[:, 0, 0, :].T

        def cdf_at(v):
            return np.asarray(_cdf_at(jnp.asarray(v)))

        def cdf_grid(s):
            return np.asarray(_cdf_grid(jnp.asarray(s)))

    ints = np.arange(-search_range, search_range + 1, dtype=np.float32)
    probs = np.asarray(cdf_at(ints))  # (2R+1, C)

    idx = np.arange(2, search_range + 1)
    # minima: smallest i in [2, R] with cdf(-i) < 1e-4, else R
    probs_neg = probs[search_range - idx, :]          # rows for -i
    ok = probs_neg < 1e-4
    minima = np.where(ok.any(axis=0), idx[ok.argmax(axis=0)], search_range)
    # maxima: smallest i in [2, R] with cdf(i) > 0.9999, else R
    probs_pos = probs[search_range + idx, :]
    ok = probs_pos > 0.9999
    maxima = np.where(ok.any(axis=0), idx[ok.argmax(axis=0)], search_range)

    minima = minima.astype(np.int32)
    maxima = maxima.astype(np.int32)
    offsets = -minima
    pmf_start = (-minima).astype(np.float32)
    pmf_length = maxima + minima + 1
    max_length = int(pmf_length.max())

    # samples[c, k] = pmf_start[c] + k
    samples = pmf_start[:, None] + np.arange(max_length, dtype=np.float32)[None, :]

    lower = np.asarray(cdf_grid(samples - 0.5))
    upper = np.asarray(cdf_grid(samples + 0.5))
    pmf = upper - lower
    # Escape mass: everything left of the window plus right of the *global*
    # last sample (reference quirk kept: uses column -1, not per-row ends).
    tail_mass = lower[:, 0] + (1.0 - upper[:, -1])

    return build_cdf_table(pmf, tail_mass, pmf_length, offsets)
