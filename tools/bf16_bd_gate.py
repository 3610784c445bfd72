"""bf16-vs-f32 BD-rate gate on a trained checkpoint (VERDICT r3 item 4).

The bench's bf16 default must be justified by rate-distortion data, not a
recon-agreement number alone: sweep rate anchors through the REAL codec
engines twice — f32 params and bf16-cast params — and compute
BD-rate(bf16 vs f32) from (container bpp, recon PSNR vs source). Streams
stay decodable bit-exactly in both modes by construction (the engines run
the decoder's stage programs inside the encoder); the question this tool
answers is how much rate/quality the bf16 operating point costs.

Prints one JSON line with both curves and the BD-rate. Gate: promote bf16
as the bench default only if |BD-rate| is ~neutral (<1%); otherwise f32
stays the quality default and bf16 is the throughput mode.

Usage:
  python tools/bf16_bd_gate.py --ckpt artifacts/overfit_r4/overfit_final.ckpt
  ... [--size 256] [--frames 2] [--anchors ...]   (TPU or CPU)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--channels", type=int, nargs=3, default=[64, 64, 96],
                    help="channel_mv channel_N channel_M of the checkpoint")
    ap.add_argument("--anchor-num", type=int, default=4)
    ap.add_argument("--anchors", default="0.6:0.7,0.8:1.0,1.0:1.2,1.2:1.5")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vcm_ts_tpu.codec.engine import VideoCodec
    from vcm_ts_tpu.eval.bd_metrics import bd_rate
    from vcm_ts_tpu.models.dmc import DMC, make_dpb
    from vcm_ts_tpu.train.checkpoint import CheckPointer
    from vcm_ts_tpu.utils.common import enable_compilation_cache

    enable_compilation_cache()
    cmv, cn, cm = args.channels
    model = DMC(anchor_num=args.anchor_num, channel_mv=cmv, channel_N=cn,
                channel_M=cm)
    x0 = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x0, make_dpb(x0, cn, cm),
                        1.0, 1.0, method="init_all")
    params, _, _ = CheckPointer().load(params, path=args.ckpt,
                                       use_latest=False)

    # the overfit tool's own synthetic moving clip = in-distribution
    # content for the overfit checkpoint
    from tools.overfit_run import make_synthetic_batch
    seq = make_synthetic_batch(1, args.frames + 1, args.size)[0]
    ref, xs = seq[0:1], [seq[t:t + 1] for t in range(1, args.frames + 1)]
    n_pix = args.size * args.size * len(xs)
    anchors = [tuple(float(v) for v in a.split(":"))
               for a in args.anchors.split(",")]

    def sweep(p, dtype):
        codec = VideoCodec(model, p)
        codec.update()
        pts = []
        for mv_q, y_q in anchors:
            dpb = jax.tree_util.tree_map(
                lambda v: v.astype(dtype),
                make_dpb(jnp.asarray(ref), cn, cm))
            bits, mses = 0, []
            for t, x in enumerate(xs):
                out = codec.compress(jnp.asarray(x).astype(dtype), dpb,
                                     mv_q, y_q, is_first_p=(t == 0))
                dpb = out["dpb"]
                bits += len(out["bit_stream"]) * 8
                rec = np.asarray(dpb["ref_frame"], np.float32)
                mses.append(np.mean((rec - x) ** 2))
            pts.append((bits / n_pix,
                        -10.0 * np.log10(np.mean(mses) + 1e-12)))
        return np.asarray(pts)

    from vcm_ts_tpu.utils.precision import cast_params, cast_params_mixed

    f32_pts = sweep(params, jnp.float32)
    bf16_pts = sweep(cast_params(params, jnp.bfloat16), jnp.bfloat16)
    # third operating point: bf16 with the reconstruction path kept f32
    # (utils/precision.py) — the candidate fix if wholesale bf16 fails
    mixed_pts = sweep(cast_params_mixed(params), jnp.bfloat16)

    bd = bd_rate(f32_pts[:, 0], f32_pts[:, 1], bf16_pts[:, 0],
                 bf16_pts[:, 1])
    bd_mixed = bd_rate(f32_pts[:, 0], f32_pts[:, 1], mixed_pts[:, 0],
                       mixed_pts[:, 1])
    # BD needs a real quality span to integrate over (see
    # bd_rate_vs_reference.py) — flag degenerate curves
    span = min(f32_pts[:, 1].max() - f32_pts[:, 1].min(),
               bf16_pts[:, 1].max() - bf16_pts[:, 1].min())
    valid = bool(span >= 0.5)
    print(json.dumps({
        "metric": f"BD-rate bf16-vs-f32 on {args.ckpt} "
                  f"({args.frames} P-frames, {args.size}x{args.size})",
        "bd_rate_pct": round(float(bd), 4),
        "f32_bpp": [round(float(v), 6) for v in f32_pts[:, 0]],
        "f32_psnr": [round(float(v), 4) for v in f32_pts[:, 1]],
        "bf16_bpp": [round(float(v), 6) for v in bf16_pts[:, 0]],
        "bf16_psnr": [round(float(v), 4) for v in bf16_pts[:, 1]],
        "mixed_bpp": [round(float(v), 6) for v in mixed_pts[:, 0]],
        "mixed_psnr": [round(float(v), 4) for v in mixed_pts[:, 1]],
        "bd_rate_mixed_pct": round(float(bd_mixed), 4),
        "gate": "bf16 stays bench default iff |BD| < 1%; else promote "
                "mixed if IT is <1%",
        "psnr_span_db": round(float(span), 4),
        "bd_valid": valid,
        "bf16_neutral": bool(valid and abs(bd) < 1.0),
        "mixed_neutral": bool(valid and abs(bd_mixed) < 1.0),
    }))


if __name__ == "__main__":
    main()
