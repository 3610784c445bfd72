"""Quantify cross-stack scale-index boundary flips (VERDICT r3 weak #4).

Cross-framework byte decode requires the torch and XLA stacks to derive the
SAME scale-table row for every latent position. Both use the identical
formula (log(sigma) - log_min) / step floored to int (our
entropy/gaussian.py:build_indexes == reference entropy_models.py:264-268),
so a flip needs the two stacks' predicted sigmas (or their f32 logs) to
straddle a row boundary. This study measures each link in that chain on the
cross-decode twins' weights:

1. derivation agreement: index flips when BOTH derivations get the SAME
   sigma plane (isolates log/floor implementation differences from sigma
   noise);
2. end-to-end flips: our encoder's own uint8 index planes (the ones the
   rANS coder writes with) vs torch-sigmas->torch-indexes — what
   cross-decode actually experiences — plus each flipped position's
   distance to the nearest row boundary in index units, and the boundary-
   distance distribution of every position (how much of the plane sits
   within sigma-noise reach of a boundary);
3. the impossibility control: torch vs torch at different intra-op thread
   counts — if the REFERENCE disagrees with ITSELF across thread counts
   (its sigma planes shift by reassociation through the conv stack), no
   derivation trick on our side can make cross-stack indexes exact.

Prints one JSON dict. Run on CPU:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/scale_index_flip_study.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    from native_interop.build_ref_modules import load
    ref_rans, ref_cxx = load()
    if ref_rans is None:
        print(json.dumps({"error": "reference C++ modules unavailable"}))
        return
    sys.modules.setdefault(
        "DCVC_HEM.src.entropy_models.MLCodec_rans", ref_rans)
    sys.modules.setdefault(
        "DCVC_HEM.src.entropy_models.MLCodec_CXX", ref_cxx)

    import test_full_cross_decode as xdec
    xdec._stub_msssim()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)

    import jax
    import jax.numpy as jnp
    import torch

    from DCVC_HEM.src.models.video_model import DMC as TorchDMC

    from vcm_ts_tpu.entropy.gaussian import GaussianCoder
    from vcm_ts_tpu.models.dmc import DMC, make_dpb
    from vcm_ts_tpu.utils.weight_export import flax_to_torch_state_dict

    model = DMC(anchor_num=4)
    x0 = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x0, make_dpb(x0, 64, 96),
                        1.0, 1.0, method="init_all")
    params = xdec._damp(params)

    tmodel = TorchDMC(anchor_num=4)
    sd = {k: torch.from_numpy(v)
          for k, v in flax_to_torch_state_dict(params).items()}
    tmodel.load_state_dict(sd, strict=True)
    tmodel.eval()

    rng = np.random.default_rng(0)
    base = rng.random((1, 8, 8, 3)).astype(np.float32)
    kron = np.ones((1, 8, 8, 1))
    x = np.kron(base, kron).astype(np.float32)
    ref = np.kron(np.roll(base, 1, axis=2), kron).astype(np.float32)

    gauss = GaussianCoder("laplace")

    # ---- jax side: the codec's own encode-path index planes -------------
    # _compress_planes derives the exact uint8 scale-index planes the rANS
    # encoder writes with, in checkerboard order mv_0, mv_1, y_0, y_1 —
    # the same order torch's compress calls gaussian_encoder.build_indexes.
    from vcm_ts_tpu.codec.engine import VideoCodec

    codec = VideoCodec(model, params)
    codec.update()
    planes = codec._compress_planes(
        jnp.asarray(x), make_dpb(jnp.asarray(ref), 64, 96), 0.8, 1.2,
        True)
    idx_j = [np.asarray(planes[k]).astype(np.int32)
             for k in ("mv_idx_w_0", "mv_idx_w_1", "idx_w_0", "idx_w_1")]

    # ---- torch side: hook build_indexes to capture sigma + index planes -
    captured = []
    orig_build = tmodel.gaussian_encoder.build_indexes

    def hook(scales):
        captured.append(np.asarray(scales.detach().cpu().numpy(),
                                   np.float32))
        return orig_build(scales)

    tmodel.gaussian_encoder.build_indexes = hook
    tmodel.update(force=True)
    dpb_t = {"ref_frame": xdec._nchw(ref), "ref_feature": None,
             "ref_y": None, "ref_mv_y": None}
    with torch.no_grad():
        tmodel.compress(xdec._nchw(x), dpb_t,
                        mv_y_q_scale=torch.tensor(0.8),
                        y_q_scale=torch.tensor(1.2))
    tmodel.gaussian_encoder.build_indexes = orig_build

    # torch captures arrive NCHW; ours are NHWC uint8 planes. Compare via
    # the sigma planes: recompute both derivations on each captured plane.
    report = {"planes": []}
    log_min, step, levels = (gauss.log_scale_min, gauss.log_scale_step,
                             gauss.levels)

    def np_indexes(s):
        s = np.maximum(s, 1e-5)
        return np.clip((np.log(s) - log_min) / step, 0,
                       levels - 1).astype(np.int32)

    plane_names = ("mv_w0", "mv_w1", "y_w0", "y_w1")
    for i, sc_t in enumerate(captured):
        sc_t_nhwc = sc_t.transpose(0, 2, 3, 1)
        # 2. same-sigma, two derivations: jnp vs torch on the torch plane
        idx_jax_on_t = np.asarray(
            gauss.build_indexes(jnp.asarray(sc_t_nhwc)))
        idx_torch_on_t = (
            orig_build(torch.from_numpy(sc_t)).numpy()
            .transpose(0, 2, 3, 1))
        same_sigma_flips = int((idx_jax_on_t != idx_torch_on_t).sum())

        # 1.+3. end to end: our encoder's own uint8 index plane vs the
        # torch-sigma->torch-index plane — what cross-decode experiences.
        # Same checkerboard call order and shape on both stacks (verified
        # mv0/mv1/y0/y1, NHWC<->NCHW).
        flips_e2e = (idx_j[i] != idx_torch_on_t.astype(np.int32))
        fidx = (np.log(np.maximum(sc_t_nhwc, 1e-5)) - log_min) / step
        dist = np.abs(fidx - np.round(fidx))
        flip_dists = dist[flips_e2e]
        report["planes"].append({
            "plane": plane_names[i],
            "n": int(sc_t.size),
            "same_sigma_derivation_flips": same_sigma_flips,
            "end_to_end_flips": int(flips_e2e.sum()),
            "end_to_end_flip_boundary_distances":
                [float(v) for v in np.sort(flip_dists)[:8]],
            "min_boundary_distance": float(dist.min()),
            "p01_boundary_distance": float(np.percentile(dist, 1)),
        })

    # 4. torch-vs-torch thread-count control on the full forward
    def torch_scales(threads):
        torch.set_num_threads(threads)
        caps = []

        def h(scales):
            caps.append(np.asarray(scales.detach().cpu().numpy(),
                                   np.float64))
            return orig_build(scales)

        tmodel.gaussian_encoder.build_indexes = h
        dpb = {"ref_frame": xdec._nchw(ref), "ref_feature": None,
               "ref_y": None, "ref_mv_y": None}
        with torch.no_grad():
            tmodel.compress(xdec._nchw(x), dpb,
                            mv_y_q_scale=torch.tensor(0.8),
                            y_q_scale=torch.tensor(1.2))
        tmodel.gaussian_encoder.build_indexes = orig_build
        return caps

    s1 = torch_scales(1)
    s4 = torch_scales(4)
    self_flips, self_rel = 0, 0.0
    for a, b in zip(s1, s4):
        self_flips += int((np_indexes(a) != np_indexes(b)).sum())
        denom = np.maximum(np.abs(a), 1e-5)
        self_rel = max(self_rel, float(np.max(np.abs(a - b) / denom)))
    report["torch_self_thread_control"] = {
        "index_flips_1_vs_4_threads": self_flips,
        "max_rel_sigma_diff": self_rel,
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
