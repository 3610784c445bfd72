"""BD-rate-vs-reference chain-length study (VERDICT r4 next-step 4).

Round 4 measured +0.47% BD on trained weights, but only at 2-frame
chains; the deployment case is GOP=32, and the open question was whether
the cross-stack divergence (scale-index boundary flips between our XLA
programs and the reference's torch kernels) ACCUMULATES with chain
depth. This tool measures BD-rate(ours vs reference, shared weights,
each stack's own entropy coder) at chains of 2/4/8/16 P-frames on the
same content and prints the depth curve.

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/bd_chain_study.py \
        --ckpt artifacts/overfit_r5 --content overfit [--depths 2,4,8,16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.bd_rate_vs_reference import run  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--depths", default="2,4,8,16")
    ap.add_argument("--content", choices=["kron", "overfit"],
                    default="overfit")
    ap.add_argument("--anchors",
                    default="0.25:0.25,0.5:0.5,1.0:1.0,2.0:2.0",
                    help="wide q-range (the round-4 conditioning fix: "
                         "trained overfit checkpoints need a wide span "
                         "for a valid BD integral)")
    ap.add_argument("--json", default=None)
    a = ap.parse_args()

    cache = {}
    rows = []
    for d in (int(v) for v in a.depths.split(",")):
        r = run(ckpt=a.ckpt, size=a.size, frames=d, anchors=a.anchors,
                content=a.content, _cache=cache)
        rows.append({
            "p_frames": d,
            "bd_rate_pct": r["bd_rate_pct"],
            "bd_valid": r["bd_valid"],
            "psnr_span_db": r["psnr_span_db"],
            "ours_bpp": r["ours_bpp"],
            "ref_bpp": r["ref_bpp"],
            "ours_psnr": r["ours_psnr"],
            "ref_psnr": r["ref_psnr"],
            "max_anchor_bpp_delta_pct": round(max(
                abs(o - f) / f * 100
                for o, f in zip(r["ours_bpp"], r["ref_bpp"])), 3),
        })
        print(json.dumps(rows[-1]), flush=True)

    print("\np_frames | BD-rate % | valid | span dB | max bpp delta %")
    for row in rows:
        print(f"{row['p_frames']:8d} | {row['bd_rate_pct']:9.4f} | "
              f"{str(row['bd_valid']):5s} | {row['psnr_span_db']:7.3f} | "
              f"{row['max_anchor_bpp_delta_pct']:.3f}")
    if a.json:
        with open(a.json, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
