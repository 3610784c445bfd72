"""Generate the shipped scale-table CDF constants for GaussianCoder.

The quantized-CDF rows of the scale-indexed Gaussian/Laplace coder are
weight-INDEPENDENT: they are a pure function of the 256-level scale table
and the chosen distribution, i.e. a bitstream-format constant. The
reference ecosystem defines this constant through torch float32 arithmetic
(DCVC_HEM/src/entropy_models/entropy_models.py:224-262): f32 linspace/exp
for the scale table and f32 Laplace/Normal CDF evaluation. numpy cannot
reproduce those tables bit-for-bit — torch CPU routes expm1/erf through
sleef, whose faithfully-rounded results differ from numpy's by 1 ulp on
~17% of inputs, which flips a handful of quantized counts (12/256 rows in
practice) and would desync any cross-framework rANS decode.

So we bake the constant: this tool evaluates the table with torch (once,
at build time — torch is NOT a runtime dependency of the codec) and writes
`vcm_ts_tpu/entropy/data/gaussian_cdf.npz`, which GaussianCoder.build_table
loads. Quantization goes through our own pmf_to_quantized_cdf (proven
byte-identical to the reference C++ quantizer in tests/test_ref_interop.py).

Run:  python tools/gen_gaussian_tables.py
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vcm_ts_tpu.entropy.tables import build_cdf_table  # noqa: E402

SEARCH_RANGE = 50
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "vcm_ts_tpu", "entropy", "data", "gaussian_cdf.npz")

SPECS = {
    # distribution -> (scale_min, scale_max, levels)
    "laplace": (0.01, 64.0, 256),
    "gaussian": (0.11, 64.0, 256),
}


def _dist(name: str, scales: torch.Tensor):
    if name == "laplace":
        return torch.distributions.laplace.Laplace(
            torch.zeros_like(scales), scales)
    return torch.distributions.normal.Normal(
        torch.zeros_like(scales), scales)


def build(name: str):
    smin, smax, levels = SPECS[name]
    # f32 scale table, exactly as the ecosystem defines it
    scale_table = torch.exp(
        torch.linspace(math.log(smin), math.log(smax), levels))

    # per-row symbol window: smallest i in [2, R] with cdf(i) > 0.9999
    center = torch.full_like(scale_table, SEARCH_RANGE)
    d = _dist(name, scale_table)
    for i in range(SEARCH_RANGE, 1, -1):
        probs = d.cdf(torch.full_like(scale_table, float(i)))
        center = torch.where(probs > 0.9999, torch.full_like(center, float(i)),
                             center)
    center = center.int()
    pmf_length = 2 * center + 1
    max_length = int(pmf_length.max())

    samples = (torch.arange(max_length) - center[:, None]).float()
    d = _dist(name, torch.zeros_like(samples) + scale_table[:, None])
    upper = d.cdf(samples + 0.5)
    lower = d.cdf(samples - 0.5)
    pmf = (upper - lower).numpy()
    tail_mass = (2.0 * lower[:, 0]).numpy()

    table = build_cdf_table(pmf, tail_mass, pmf_length.numpy(),
                            (-center).numpy())
    return table


def main():
    out = {}
    for name in SPECS:
        t = build(name)
        out[f"{name}_cdf"] = t.cdf
        out[f"{name}_sizes"] = t.sizes
        out[f"{name}_offsets"] = t.offsets
        print(f"{name}: cdf {t.cdf.shape}, max size {t.sizes.max()}")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")


if __name__ == "__main__":
    main()
