"""Measure the north-star metric: BD-rate of OUR codec vs the reference
torch codec on SHARED weights (VERDICT r3 missing #3).

Protocol = the reference's own BD evaluation (reference bd_rate.py:34-71):
a multi-point RD sweep (real container bytes, own entropy coder per
framework), BD-rate via pchip integration (eval/bd_metrics.py). Weights are
either a trained checkpoint (--ckpt, exported to the torch twin via
flax_to_torch_state_dict) or the damped random init the cross-decode tests
use. The reference model runs with its OWN compiled C++ rANS modules
(tests/native_interop/build_ref_modules.py).

Output: one JSON line with per-anchor (bpp, PSNR) for both frameworks and
the BD-rate(ours vs reference). |BD-rate| < 0.1% is the north-star bound
(BASELINE.md).

Usage (CPU, torch required):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/bd_rate_vs_reference.py
  ... [--ckpt artifacts/ckpt_dir] [--frames 3] [--size 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def run(ckpt=None, size=64, frames=1, anchors="0.5:0.6,0.7:0.9,0.9:1.1,1.1:1.4",
        damp=0.5, content="kron", _cache={}):
    """One BD-rate(ours vs reference) measurement; returns the result dict.

    _cache holds the built codecs/twins across calls so a chain-depth
    sweep (tools/bd_chain_study.py) pays model build + weight export
    once."""
    class _A:
        pass
    args = _A()
    args.ckpt, args.size, args.frames = ckpt, size, frames
    args.anchors, args.damp, args.content = anchors, damp, content
    return _run(args, _cache)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint dir/file for trained weights "
                         "(train/checkpoint.py format); default: damped "
                         "random init (the cross-decode twins' weights)")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--frames", type=int, default=1,
                    help="P-frames per rate point (chained GOP, each side "
                         "carrying its own decoded DPB)")
    ap.add_argument("--anchors", default="0.5:0.6,0.7:0.9,0.9:1.1,1.1:1.4",
                    help="comma list of mv_q:y_q pairs")
    ap.add_argument("--damp", type=float, default=0.5,
                    help="kernel damping for the random-init twins (no "
                         "--ckpt); 0.5 matches the cross-decode tests")
    ap.add_argument("--content", choices=["kron", "overfit"],
                    default="kron",
                    help="eval clip: 'kron' block-shift pattern, or "
                         "'overfit' = the synthetic clip overfit_run "
                         "trains on — gives a trained checkpoint a "
                         "conditioned (non-flat) RD curve, so the BD "
                         "integral is valid")
    args = ap.parse_args()
    result = _run(args, {})
    if result is not None:
        print(json.dumps(result))


def _run(args, cache):
    from native_interop.build_ref_modules import load
    ref_rans, ref_cxx = load()
    if ref_rans is None:
        print(json.dumps({"error": "reference C++ modules unavailable"}))
        return
    sys.modules.setdefault(
        "DCVC_HEM.src.entropy_models.MLCodec_rans", ref_rans)
    sys.modules.setdefault(
        "DCVC_HEM.src.entropy_models.MLCodec_CXX", ref_cxx)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)

    import test_full_cross_decode as xdec
    xdec._stub_msssim()

    import jax
    import jax.numpy as jnp
    import torch

    from DCVC_HEM.src.models.video_model import DMC as TorchDMC

    from vcm_ts_tpu.codec.engine import VideoCodec
    from vcm_ts_tpu.eval.bd_metrics import bd_rate
    from vcm_ts_tpu.models.dmc import DMC, make_dpb
    from vcm_ts_tpu.utils.weight_export import flax_to_torch_state_dict

    if "codec" in cache:
        codec, tmodel, weights = (cache["codec"], cache["tmodel"],
                                  cache["weights"])
    else:
        model = DMC(anchor_num=4)
        x0 = jnp.zeros((1, 64, 64, 3))
        params = model.init(jax.random.PRNGKey(0), x0, make_dpb(x0, 64, 96),
                            1.0, 1.0, method="init_all")
        if args.ckpt:
            from vcm_ts_tpu.train.checkpoint import CheckPointer
            params, _, _ = CheckPointer().load(params, path=args.ckpt,
                                               use_latest=False)
            weights = args.ckpt
        else:
            params = xdec._damp(params, args.damp)
            weights = f"damped-random-init({args.damp})"

        codec = VideoCodec(model, params)
        codec.update()

        tmodel = TorchDMC(anchor_num=4)
        sd = {k: torch.from_numpy(v)
              for k, v in flax_to_torch_state_dict(params).items()}
        tmodel.load_state_dict(sd, strict=True)
        tmodel.eval()
        tmodel.update(force=True)
        cache.update(codec=codec, tmodel=tmodel, weights=weights)

    s = args.size
    if args.content == "overfit":
        sys.path.insert(0, os.path.join(REPO, "tools"))
        from overfit_run import make_synthetic_batch
        seq = make_synthetic_batch(1, args.frames + 1, s, seed=0)
        frames = [seq[:, t] for t in range(args.frames + 1)]
    else:
        blk = s // 8
        rng = np.random.default_rng(0)
        base = rng.random((1, 8, 8, 3)).astype(np.float32)
        kron = np.ones((1, blk, blk, 1))
        frames = [np.kron(np.roll(base, t, axis=2),
                          kron).astype(np.float32)
                  for t in range(args.frames + 1)]
    ref, xs = frames[0], frames[1:]
    n_pix = s * s * len(xs)

    anchors = [tuple(float(v) for v in a.split(":"))
               for a in args.anchors.split(",")]

    def psnr(a, b):
        return -10.0 * np.log10(np.mean((a - b) ** 2) + 1e-12)

    ours_pts, ref_pts = [], []
    for mv_q, y_q in anchors:
        # ---- ours: chained GOP, decoder-exact DPB recurrence
        dpb_j = make_dpb(jnp.asarray(ref), 64, 96)
        bits, mses = 0, []
        for t, x in enumerate(xs):
            out = codec.compress(jnp.asarray(x), dpb_j, mv_q, y_q,
                                 is_first_p=(t == 0))
            dpb_j = out["dpb"]
            bits += len(out["bit_stream"]) * 8
            mses.append(np.mean(
                (np.asarray(dpb_j["ref_frame"]) - x) ** 2))
        ours_pts.append((bits / n_pix,
                         -10.0 * np.log10(np.mean(mses) + 1e-12)))

        # ---- reference torch twin, its own C++ coder
        dpb_t = {"ref_frame": xdec._nchw(ref), "ref_feature": None,
                 "ref_y": None, "ref_mv_y": None}
        bits, mses = 0, []
        for t, x in enumerate(xs):
            with xdec._Alarm(600), torch.no_grad():
                rout = tmodel.compress(
                    xdec._nchw(x), dpb_t,
                    mv_y_q_scale=torch.tensor(mv_q),
                    y_q_scale=torch.tensor(y_q))
            dpb_t = rout["dbp"]
            bits += len(rout["bit_stream"]) * 8
            rec = np.clip(
                dpb_t["ref_frame"].detach().numpy().transpose(0, 2, 3, 1),
                0, 1)
            mses.append(np.mean((rec - x) ** 2))
        ref_pts.append((bits / n_pix,
                        -10.0 * np.log10(np.mean(mses) + 1e-12)))

    ours_pts = np.asarray(ours_pts)
    ref_pts = np.asarray(ref_pts)
    bd = bd_rate(ref_pts[:, 0], ref_pts[:, 1], ours_pts[:, 0],
                 ours_pts[:, 1])
    # BD integrates log-rate over the overlapping QUALITY interval; on a
    # near-flat-PSNR curve (untrained weights) that interval is ~0 and the
    # integral is noise — require a real quality span for a valid number
    span = min(ours_pts[:, 1].max() - ours_pts[:, 1].min(),
               ref_pts[:, 1].max() - ref_pts[:, 1].min())
    valid = bool(span >= 0.5)
    return ({
        "metric": "BD-rate ours-vs-reference, shared weights "
                  f"({weights}, {args.frames} P-frame(s), {s}x{s}, "
                  f"{args.content} content)",
        "bd_rate_pct": round(float(bd), 4),
        "anchors": anchors,
        "ours_bpp": [round(float(v), 6) for v in ours_pts[:, 0]],
        "ours_psnr": [round(float(v), 4) for v in ours_pts[:, 1]],
        "ref_bpp": [round(float(v), 6) for v in ref_pts[:, 0]],
        "ref_psnr": [round(float(v), 4) for v in ref_pts[:, 1]],
        "north_star": "|BD-rate| < 0.1%",
        "psnr_span_db": round(float(span), 4),
        "bd_valid": valid,
        "pass": bool(valid and abs(bd) < 0.1),
    })


if __name__ == "__main__":
    main()
