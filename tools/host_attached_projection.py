"""Auditable host-attached decode projection (VERDICT r4 next-step 9).

The repo's real-bitstream decode numbers are taken through the axon
tunnel, where every blocking device->host fetch costs a WAN round trip.
The claim "0.627 fps is the tunnel, not the design" needs checkable
arithmetic; this tool measures each component of the per-frame decode
chain separately and prints the decomposition plus the projected
host-attached (sub-ms PCIe) throughput:

  frame_decode = device_stage_compute            (measured, async chain)
               + host_rANS_decode                (measured, native coder)
               + n_blocking_fetches x RTT        (counted x measured RTT)
               + symbol upload                   (measured)

The per-frame chain has exactly 4 data-dependent blocking index fetches
(idx0/idx1/idx_y0/idx_y1 — each must reach the host before the next rANS
read) and 6 host rANS reads; see codec/engine.py VideoCodec.decompress.
decode_gop overlaps the NEXT frame's static-index mv_z host decode with
this frame's device stages, so the steady-state projection is

  max(device_stage_compute, host_rANS) + 4 x RTT + upload

Usage (on the TPU chip):
    python tools/host_attached_projection.py [--size 1088x1920]
        [--dtype bf16] [--frames 4] [--pcie-ms 0.5] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BLOCKING_FETCHES = 4   # idx0, idx1, idx_y0, idx_y1 (data-dependent)
N_RANS_READS = 6         # mv_z, mv0, mv1, z, y0, y1


def _median(ts):
    return float(np.median(np.asarray(ts)))


def measure(size: str, dtype_flag: str, n_frames: int):
    import jax
    import jax.numpy as jnp

    from vcm_ts_tpu.codec.engine import VideoCodec
    from vcm_ts_tpu.entropy import bit_estimator as be
    from vcm_ts_tpu.entropy.coder import EntropyCoder
    from vcm_ts_tpu.models.dmc import DMC, make_dpb
    from vcm_ts_tpu.utils.common import enable_compilation_cache
    from vcm_ts_tpu.utils.precision import cast_params
    from vcm_ts_tpu.codec import bitstream as bs

    enable_compilation_cache()
    h, w = (int(v) for v in size.split("x"))
    model = DMC(anchor_num=4)
    x0 = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x0, make_dpb(x0), 1.0, 1.0,
                        method="init_all")
    dtype = jnp.bfloat16 if dtype_flag == "bf16" else jnp.float32
    if dtype_flag == "bf16":
        params = cast_params(params, jnp.bfloat16)
    codec = VideoCodec(model, params)
    codec.update()

    rng = np.random.default_rng(0)
    frames = [jnp.asarray(rng.random((1, h, w, 3)), dtype)
              for _ in range(4)]
    dpb0 = make_dpb(frames[0])

    # ---- capture: encode a burst, then decode once with symbol capture
    seq = [frames[i % 4] for i in range(n_frames)]
    codec.encode_gop(seq[:2], dpb0, 0.7, 0.7)  # warm
    streams, _ = codec.encode_gop(seq, dpb0, 0.7, 0.7)
    dec = codec.decompress(dpb0, streams[0], h, w, 0.7, 0.7,
                           is_first_p=True, return_symbols=True)
    symbols = [np.asarray(s, np.int16) for s in dec["symbols"]]
    mv_z, mv0, mv1, z_hat, y0, y1 = symbols

    # index planes for the host-rANS-only measurement: re-derive them via
    # the same stage programs (blocking fetches, but timing excluded)
    zh, zw = bs.get_downsampled_shape(h, w, 64)
    z_idx = be.build_indexes((1, zh, zw, model.channel_N))
    up = lambda a: jnp.asarray(a)  # noqa: E731
    p = codec.params
    idx0, carry = codec._stage1(p, up(mv_z), dpb0)
    idx1, carry = codec._stage2(p, up(mv0), carry)
    contexts = codec._stage3a(p, up(mv1), carry, dpb0, 0.7, True)
    idx_y0, carry = codec._stage3b(p, up(z_hat), contexts[2], dpb0)
    idx_y1, carry = codec._stage5(p, up(y0), carry)
    idx_planes = [np.asarray(i) for i in (idx0, idx1, idx_y0, idx_y1)]

    res = {}

    # ---- (1) device stage compute: full 6-stage chain, async dispatch,
    # one terminal block — no host round trips inside
    def device_chain():
        i0, c = codec._stage1(p, up(mv_z), dpb0)
        i1, c = codec._stage2(p, up(mv0), c)
        ctx3 = codec._stage3a(p, up(mv1), c, dpb0, 0.7, True)
        iy0, c = codec._stage3b(p, up(z_hat), ctx3[2], dpb0)
        iy1, c = codec._stage5(p, up(y0), c)
        out = codec._stage6(p, up(y1), c, ctx3, 0.7)
        return out["dpb"]["ref_frame"]

    float(jnp.sum(device_chain()[0, 0, :2, 0]))  # warm
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        r = device_chain()
        float(jnp.sum(r[0, 0, :2, 0]))
        ts.append((time.perf_counter() - t0) * 1e3)
    res["device_stage_ms"] = round(_median(ts), 2)

    # ---- (2) host rANS decode: all 6 reads of frame 0's stream with the
    # captured index planes (native coder, no device involved)
    def host_rans():
        coder = EntropyCoder()
        coder.set_stream(streams[0])
        coder.decode_stream(z_idx, codec.z_mv_table)
        coder.decode_stream(idx_planes[0], codec.y_table)
        coder.decode_stream(idx_planes[1], codec.y_table)
        coder.decode_stream(z_idx, codec.z_table)
        coder.decode_stream(idx_planes[2], codec.y_table)
        coder.decode_stream(idx_planes[3], codec.y_table)

    host_rans()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        host_rans()
        ts.append((time.perf_counter() - t0) * 1e3)
    res["host_rans_ms"] = round(_median(ts), 2)
    res["rans_symbols"] = int(sum(s.size for s in symbols))

    # ---- (3) measured round-trip time: tiny data-dependent fetch
    one = jnp.zeros((1,), jnp.int32)
    ts = []
    for _ in range(20):
        t0 = time.perf_counter()
        np.asarray(one + 1)
        ts.append((time.perf_counter() - t0) * 1e3)
    res["tunnel_rtt_ms"] = round(_median(ts), 2)

    # ---- (4) index-plane fetch cost (the actual blocking transfers)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        i0, _c = codec._stage1(p, up(mv_z), dpb0)
        np.asarray(i0)
        ts.append((time.perf_counter() - t0) * 1e3)
    res["stage1_plus_fetch_ms"] = round(_median(ts), 2)
    res["idx_plane_bytes"] = int(sum(i.nbytes for i in idx_planes))

    # ---- (5) symbol upload cost
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        a = jnp.asarray(mv1)
        a.block_until_ready()
        ts.append((time.perf_counter() - t0) * 1e3)
    res["symbol_upload_ms"] = round(_median(ts), 2)
    res["symbol_bytes_per_frame"] = int(sum(s.nbytes for s in symbols))

    # ---- measured end-to-end through the tunnel, for comparison
    codec.decode_gop(dpb0, streams[:2], h, w, 0.7, 0.7)  # warm
    t0 = time.perf_counter()
    _, d = codec.decode_gop(dpb0, streams, h, w, 0.7, 0.7)
    float(jnp.sum(d["ref_frame"][0, 0, :2, 0]))
    res["measured_tunnel_fps"] = round(
        n_frames / (time.perf_counter() - t0), 3)
    return res


def project(res: dict, pcie_ms: float):
    """The checkable arithmetic."""
    # serialized per-frame cost with PCIe-class fetches; decode_gop
    # overlaps host rANS of the next frame's static plane only, so
    # conservatively serialize rANS + device, and separately report the
    # fully-overlapped bound (max instead of sum)
    fetches = N_BLOCKING_FETCHES * pcie_ms
    serial = (res["device_stage_ms"] + res["host_rans_ms"]
              + fetches + res["symbol_upload_ms"])
    overlap = (max(res["device_stage_ms"], res["host_rans_ms"])
               + fetches + res["symbol_upload_ms"])
    return {
        "pcie_rtt_assumed_ms": pcie_ms,
        "blocking_fetches_per_frame": N_BLOCKING_FETCHES,
        "rans_reads_per_frame": N_RANS_READS,
        "projected_serial_ms": round(serial, 2),
        "projected_serial_fps": round(1000.0 / serial, 3),
        "projected_overlapped_ms": round(overlap, 2),
        "projected_overlapped_fps": round(1000.0 / overlap, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1088x1920")
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="bf16")
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--pcie-ms", type=float, default=0.5,
                    help="assumed host-attached round-trip cost per "
                         "blocking fetch (PCIe gen3 measured latencies "
                         "are 0.05-0.5 ms; 0.5 is the conservative end)")
    ap.add_argument("--json", default=None)
    a = ap.parse_args()
    res = measure(a.size, a.dtype, a.frames)
    res.update(project(res, a.pcie_ms))
    print(json.dumps(res, indent=2))
    if a.json:
        with open(a.json, "w") as f:
            json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
