"""Benchmark: 1080p P-frame encode+decode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N, ...extras}

Protocol mirrors the reference's eval harness semantics
(DCVC_HEM/test_video.py:80-182): per-frame DMC encode+decode compute with
entropy-estimated bits (the default no-write mode the reference benchmarks
with), 1080p frames padded to 1088x1920 (stream_helper.get_padding_size
p=64), DPB threaded frame to frame. Baseline: the driver-set north star of
60 fps/chip (BASELINE.md).

Default (no mode flag) runs the SUITE: single-stream entropy-estimated fps
(the headline) plus pipelined real-bitstream encode, pipelined decode, and
the 2-stream batched write-stream aggregate — all in the one JSON line
(VERDICT r3 item 2). Individual modes stay selectable by flag.

Outage behavior: before compiling anything, a tiny-matmul probe runs in a
subprocess under a timeout. If the TPU backend is unreachable (the axon
tunnel outage that emptied BENCH_r03.json), this prints a structured
{"error": "tpu-unavailable"} JSON line and exits 0 instead of hanging for
~40 minutes in backend init.

Flags: --frames N, --warmup N, --dtype f32|bf16, --write-stream (adds the
host rANS path), --size HxW, --estimate-only, plus the mode flags below.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from vcm_ts_tpu.utils.tpu_probe import probe_tpu as _probe_tpu

NORTH_STAR_FPS = 60.0  # BASELINE.md


def _emit(obj) -> None:
    print(json.dumps(obj))


def _median_of(fn, n: int):
    """(median, min, max) of n timed runs of fn.

    VERDICT r4 weak #7: session-to-session tunnel variance was measured
    at up to ~30% (PERF.md), and single-shot driver artifacts inherited
    it (r03's artifact was lost to one bad run). Each run re-enters fn
    fully warmed (first call compiled the stages), so the dispersion
    here IS the tunnel/runtime noise, not compile noise."""
    vals = sorted(fn() for _ in range(max(1, n)))
    return vals[len(vals) // 2], vals[0], vals[-1]


# Chip-priority sentinel: while a TPU bench run is active this pidfile
# exists, and tools/tpu_watch.py preempts (SIGTERM + requeue) whatever
# chip job it is running so the bench gets the chip to itself within a
# few seconds. Exists for the driver's end-of-round bench.py run, which
# may land while the watcher has a multi-hour job (overfit curriculum)
# holding most of HBM.
BENCH_SENTINEL = "/tmp/vcm_bench_active"


def _claim_chip() -> None:
    import atexit

    with open(BENCH_SENTINEL, "w") as f:
        f.write(str(os.getpid()))

    def _release():
        try:
            with open(BENCH_SENTINEL) as f:
                if f.read().strip() == str(os.getpid()):
                    os.unlink(BENCH_SENTINEL)
        except OSError:
            pass

    atexit.register(_release)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--dtype", choices=["f32", "bf16", "mixed"],
                    default="bf16",
                    help="mixed = bf16 params except the reconstruction "
                         "path, which stays f32 (utils/precision.py; "
                         "per-checkpoint RD gate: tools/bf16_bd_gate.py)")
    ap.add_argument("--write-stream", action="store_true")
    ap.add_argument("--size", default="1088x1920")
    ap.add_argument("--fast-warp", action="store_true",
                    help="two-pass Pallas warp kernel (see ops/warp_pallas)")
    ap.add_argument("--fast-shuffle", action="store_true",
                    help="Pallas fused subpel-conv/pixel-shuffle kernels "
                         "(ops/subpel_pallas; exact relayout, inference "
                         "only)")
    ap.add_argument("--estimate-only", action="store_true",
                    help="single-stream entropy-estimated mode only "
                         "(skip the suite's real-bitstream modes)")
    ap.add_argument("--pipelined-encode", action="store_true",
                    help="encode-only GOP throughput with host rANS "
                         "overlapped against device compute")
    ap.add_argument("--pipelined-decode", action="store_true",
                    help="decode-only GOP throughput (decode_gop: next "
                         "frame's static-index plane host-decoded while "
                         "this frame's device stages run)")
    ap.add_argument("--streams", type=int, default=1,
                    help="N independent streams through the batch axis. "
                         "With --write-stream this amortizes every host "
                         "round trip over N streams "
                         "(compress_batch/decompress_batch); in the "
                         "default entropy-estimated mode it measures "
                         "aggregate batched-forward fps (measured: does "
                         "NOT beat N sequential passes at 1080p — the "
                         "spatial dim already saturates the chip)")
    ap.add_argument("--latency", action="store_true",
                    help="per-frame LATENCY distribution (ms p50/p95/p99) "
                         "for the entropy-estimated enc+dec forward: each "
                         "frame blocks to completion (no async pipelining) "
                         "— what a real-time caller sees per frame, vs the "
                         "suite's async throughput")
    ap.add_argument("--gop", type=int, default=0,
                    help="GOP-level end-to-end bench: one IntraNoAR "
                         "I-frame + (N-1) pipelined DMC P-frames through "
                         "real container bytes — the reference protocol's "
                         "unit (test_video.py GOP=32 bursts per rate "
                         "point)")
    ap.add_argument("--train-step", action="store_true",
                    help="training throughput: cascade RD step (f32, "
                         "256x256 crops, batch=4 rate anchors, BPTT over "
                         "--p-frames, CASCADE_REMAT on)")
    ap.add_argument("--grad-accum", type=int, default=1,
                    help="with --train-step: SOLVER.GRAD_ACCUM_STEPS (2 = "
                         "what fits the f32 p_frames=2 cascade on one v5e "
                         "chip)")
    ap.add_argument("--mp", action="store_true",
                    help="with --train-step: SOLVER.MIXED_PRECISION mode "
                         "(bf16 compute, f32 master params/moments)")
    ap.add_argument("--p-frames", type=int, default=2)
    ap.add_argument("--runs", type=int, default=3,
                    help="timed repetitions per reported number; the "
                         "driver artifact records median + min/max so "
                         "single-shot tunnel variance (up to ~30% across "
                         "sessions, PERF.md) stops polluting it")
    ap.add_argument("--probe-timeout", type=float,
                    default=float(os.environ.get("BENCH_PROBE_TIMEOUT",
                                                 "420")))
    ap.add_argument("--no-probe", action="store_true")
    args = ap.parse_args()

    # --- TPU liveness gate (VERDICT r3 weak #1): fail fast + legibly ---
    platforms = os.environ.get("JAX_PLATFORMS", "")
    if not args.no_probe and "cpu" not in platforms.split(","):
        ok, detail = _probe_tpu(args.probe_timeout)
        if not ok:
            _emit({
                "metric": "1080p P-frame enc+dec fps/chip (bench aborted)",
                "value": 0.0,
                "unit": "fps",
                "vs_baseline": 0.0,
                "error": f"tpu-unavailable: {detail} — the axon tunnel is "
                         f"down; re-run when a tiny matmul succeeds "
                         f"(vcm_ts_tpu/utils/tpu_probe.py)",
            })
            return
    if "cpu" not in platforms.split(","):
        _claim_chip()

    import jax
    import jax.numpy as jnp

    from vcm_ts_tpu.models.dmc import DMC, make_dpb
    from vcm_ts_tpu.utils.common import enable_compilation_cache

    # the tunnel compile service is slow and variable (5-30 min cold for a
    # 1080p program); the persistent cache makes warmed re-runs instant
    enable_compilation_cache()

    if args.train_step:
        _emit(bench_train_step(args))
        return

    h, w = (int(v) for v in args.size.split("x"))
    size_tag = "1080p" if (h, w) == (1088, 1920) else f"{h}x{w}"

    if args.fast_shuffle:
        from vcm_ts_tpu.ops import layers as _layers
        _layers.set_fast_shuffle(True)
    model = DMC(anchor_num=4, fast_warp=args.fast_warp)
    x0 = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x0, make_dpb(x0), 1.0, 1.0,
                        method="init_all")

    from vcm_ts_tpu.utils.precision import cast_params, cast_params_mixed

    dtype = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    if args.dtype == "bf16":
        params = cast_params(params, jnp.bfloat16)
    elif args.dtype == "mixed":
        params = cast_params_mixed(params)

    rng = np.random.default_rng(0)
    ns = max(1, args.streams)
    frames = [jnp.asarray(rng.random((ns, h, w, 3)), dtype)
              for _ in range(4)]
    dpb = make_dpb(frames[0])

    def force(d):
        # under the axon tunnel block_until_ready returns early; a host fetch
        # of a scalar reduction is the only reliable completion barrier
        return float(jnp.sum(d["ref_frame"][0, 0, :2, 0]))

    ctx = dict(model=model, params=params, frames=frames, dpb=dpb,
               h=h, w=w, force=force, args=args)

    if args.latency:
        assert ns == 1, "--latency is single-stream"
        stats = bench_latency(ctx)
        _emit({"metric": f"{size_tag} P-frame enc+dec per-frame latency "
                         f"({args.dtype}, entropy-estimated, blocking)",
               "value": stats["p50_ms"], "unit": "ms",
               "vs_baseline": round(1000.0 / stats["p50_ms"]
                                    / NORTH_STAR_FPS, 4),
               **stats})
        return
    if args.gop:
        assert ns == 1, "--gop is single-stream"
        enc_fps, dec_fps = bench_gop(ctx)
        e2e = 1.0 / (1.0 / enc_fps + 1.0 / dec_fps)
        _emit({"metric": f"{size_tag} GOP{args.gop} I+P enc->dec fps/chip "
                         f"({args.dtype}, real bitstream, pipelined)",
               "value": round(e2e, 3), "unit": "fps",
               "vs_baseline": round(e2e / NORTH_STAR_FPS, 4),
               "gop_encode_fps": round(enc_fps, 3),
               "gop_decode_fps": round(dec_fps, 3)})
        return
    if args.pipelined_encode and ns > 1:
        ctx1 = dict(ctx)
        ctx1["frames"] = [f[:1] for f in frames]
        ctx1["dpb"] = make_dpb(ctx1["frames"][0])
        fps = bench_pipelined_encode_multi(ctx1, ns)
        _emit({"metric": f"{size_tag} P-frame pipelined ENCODE aggregate "
                         f"fps/chip ({args.dtype}, real bitstream, "
                         f"{ns} interleaved streams)",
               "value": round(fps, 3), "unit": "fps",
               "vs_baseline": round(fps / NORTH_STAR_FPS, 4)})
        return
    if args.pipelined_decode and ns > 1:
        # N INTERLEAVED single-stream decodes on host threads through one
        # codec (decode_gop holds no shared mutable state): while stream A
        # blocks on a data-dependent index fetch (a full tunnel RTT), the
        # device runs stream B's stages — aggregate decode throughput is
        # the serving story the tunnel-bound single-stream number hides
        ctx1 = dict(ctx)
        ctx1["frames"] = [f[:1] for f in frames]
        ctx1["dpb"] = make_dpb(ctx1["frames"][0])
        fps = bench_pipelined_decode_multi(ctx1, ns)
        _emit({"metric": f"{size_tag} P-frame pipelined DECODE aggregate "
                         f"fps/chip ({args.dtype}, real bitstream, "
                         f"{ns} interleaved streams)",
               "value": round(fps, 3), "unit": "fps",
               "vs_baseline": round(fps / NORTH_STAR_FPS, 4)})
        return
    if args.pipelined_decode:
        fps = bench_pipelined_decode(ctx)
        _emit({"metric": f"{size_tag} P-frame pipelined DECODE fps/chip "
                         f"({args.dtype}, real bitstream)",
               "value": round(fps, 3), "unit": "fps",
               "vs_baseline": round(fps / NORTH_STAR_FPS, 4)})
        return
    if args.pipelined_encode:
        fps = bench_pipelined_encode(ctx)
        _emit({"metric": f"{size_tag} P-frame pipelined ENCODE fps/chip "
                         f"({args.dtype}, real bitstream)",
               "value": round(fps, 3), "unit": "fps",
               "vs_baseline": round(fps / NORTH_STAR_FPS, 4)})
        return
    if args.write_stream and ns > 1:
        fps = bench_batched_write(ctx)
        _emit({"metric": f"{size_tag} P-frame enc+dec AGGREGATE fps/chip "
                         f"({args.dtype}, real bitstream, {ns} streams "
                         f"batched)",
               "value": round(fps, 3), "unit": "fps",
               "vs_baseline": round(fps / NORTH_STAR_FPS, 4)})
        return
    if args.write_stream:
        fps = bench_seq_write(ctx)
        _emit({"metric": f"{size_tag} P-frame enc+dec fps/chip ({args.dtype}, "
                         f"real bitstream)",
               "value": round(fps, 3), "unit": "fps",
               "vs_baseline": round(fps / NORTH_STAR_FPS, 4)})
        return

    # --- estimation mode (headline): median of --runs (default 3) ---
    est_fps, est_min, est_max = _median_of(lambda: bench_estimation(ctx),
                                           args.runs)
    result = {
        "metric": f"{size_tag} P-frame enc+dec fps/chip "
                  f"({args.dtype}"
                  f"{', fast-warp' if args.fast_warp else ''}"
                  f"{', fast-shuffle' if args.fast_shuffle else ''}"
                  f"{f', {ns} streams batched' if ns > 1 else ''}"
                  f", entropy-estimated)",
        "value": round(est_fps, 3),
        "unit": "fps",
        "vs_baseline": round(est_fps / NORTH_STAR_FPS, 4),
        "runs": max(1, args.runs),
        "min_fps": round(est_min, 3),
        "max_fps": round(est_max, 3),
    }
    if args.estimate_only or ns > 1 or args.fast_warp or args.fast_shuffle:
        _emit(result)
        return

    # --- suite: add the real-bitstream modes as extra keys (one line),
    # each a median-of-runs with dispersion ---
    def _suite(key, fn):
        med, lo, hi = _median_of(fn, args.runs)
        result[key] = round(med, 3)
        result[key + "_min"] = round(lo, 3)
        result[key + "_max"] = round(hi, 3)

    try:
        _suite("pipelined_encode_fps", lambda: bench_pipelined_encode(ctx))
        _suite("pipelined_decode_fps", lambda: bench_pipelined_decode(ctx))
        ctx2 = dict(ctx)
        ctx2["frames"] = [jnp.concatenate([f, f], axis=0) for f in frames]
        ctx2["dpb"] = make_dpb(ctx2["frames"][0])
        _suite("write_stream_2x_aggregate_fps",
               lambda: bench_batched_write(ctx2))
        # both operating points in one artifact: until the bf16 BD gate on
        # trained weights settles the dtype policy (PERF.md round 3/4), the
        # suite records the f32 estimation fps alongside the bf16 headline
        if args.dtype == "bf16":
            ctx32 = dict(ctx)
            ctx32["params"] = model.init(
                jax.random.PRNGKey(0), x0, make_dpb(x0), 1.0, 1.0,
                method="init_all")
            ctx32["frames"] = [f.astype(jnp.float32) for f in frames]
            ctx32["dpb"] = make_dpb(ctx32["frames"][0])
            result["f32_estimation_fps"] = round(bench_estimation(ctx32), 3)
    except Exception as e:  # suite extras must never kill the headline
        result["suite_error"] = f"{type(e).__name__}: {e}"
    _emit(result)


def bench_estimation(ctx) -> float:
    import jax

    from vcm_ts_tpu.models.dmc import make_dpb

    args, force = ctx["args"], ctx["force"]
    model, params, frames = ctx["model"], ctx["params"], ctx["frames"]
    # donate the incoming DPB: the loop threads it frame to frame, so XLA
    # can alias the previous frame's reference buffers into the new ones
    # instead of holding two DPB generations live (~1.2 GB at 4K bf16 —
    # part of fitting 4K single-chip; free at 1080p)
    fwd = jax.jit(
        lambda p, x, dpb, first: model.apply(p, x, dpb, 0.7, 0.7, first),
        static_argnums=(3,), donate_argnums=(2,))

    def run_frame(i, dpb, first):
        return fwd(params, frames[i % 4], dpb, first)["dpb"]

    # never touch ctx["dpb"] — it is shared with the suite's other modes
    # and donation would delete it; build (and consume) local DPBs, seeded
    # from a COPY of frames[0] (the first call also passes frames[0] as x,
    # and donating a buffer that is another argument of the same call is
    # illegal: `f(a, donate(a))`)
    import jax.numpy as jnp

    cur = make_dpb(jnp.copy(frames[0]))
    for i in range(max(2, args.warmup)):
        cur = run_frame(i, cur, i == 0)
    force(cur)
    dpb = make_dpb(jnp.copy(frames[0]))
    t0 = time.perf_counter()
    cur = dpb
    for i in range(args.frames):
        cur = run_frame(i, cur, i == 0)
    force(cur)
    return max(1, ctx["frames"][0].shape[0]) * args.frames / (
        time.perf_counter() - t0)


def _make_codec(ctx):
    from vcm_ts_tpu.codec.engine import VideoCodec

    codec = VideoCodec(ctx["model"], ctx["params"])
    codec.update()
    return codec


def bench_pipelined_encode(ctx) -> float:
    args, frames, dpb = ctx["args"], ctx["frames"], ctx["dpb"]
    codec = _make_codec(ctx)
    codec.encode_gop(frames[:2], dpb, 0.7, 0.7)  # warm both jit variants
    seq = [frames[i % 4] for i in range(args.frames)]
    t0 = time.perf_counter()
    codec.encode_gop(seq, dpb, 0.7, 0.7)
    return args.frames / (time.perf_counter() - t0)


def bench_pipelined_decode(ctx) -> float:
    args, frames, dpb = ctx["args"], ctx["frames"], ctx["dpb"]
    h, w, force = ctx["h"], ctx["w"], ctx["force"]
    codec = _make_codec(ctx)
    seq = [frames[i % 4] for i in range(args.frames)]
    codec.encode_gop(seq[:2], dpb, 0.7, 0.7)  # warm
    streams, _ = codec.encode_gop(seq, dpb, 0.7, 0.7)
    _, d = codec.decode_gop(dpb, streams[:2], h, w, 0.7, 0.7)  # warm
    force(d)
    t0 = time.perf_counter()
    _, d = codec.decode_gop(dpb, streams, h, w, 0.7, 0.7)
    force(d)
    return args.frames / (time.perf_counter() - t0)


def bench_pipelined_encode_multi(ctx, n_threads: int) -> float:
    """N concurrent encode_gop sessions through one codec (the encode path
    holds no shared mutable state — per-call host coders). Aggregate
    frames/s."""
    from concurrent.futures import ThreadPoolExecutor

    args, frames, dpb = ctx["args"], ctx["frames"], ctx["dpb"]
    codec = _make_codec(ctx)
    seq = [frames[i % 4] for i in range(args.frames)]
    codec.encode_gop(seq[:2], dpb, 0.7, 0.7)  # warm

    pool = ThreadPoolExecutor(max_workers=n_threads)
    t0 = time.perf_counter()
    list(pool.map(lambda _i: codec.encode_gop(seq, dpb, 0.7, 0.7),
                  range(n_threads)))
    dt = time.perf_counter() - t0
    pool.shutdown(wait=True)
    return n_threads * args.frames / dt


def bench_pipelined_decode_multi(ctx, n_threads: int) -> float:
    """N concurrent decode_gop sessions through ONE codec's stage binaries
    (thread-per-stream; the per-stream host stalls overlap each other's
    device work). Returns aggregate frames/s."""
    from concurrent.futures import ThreadPoolExecutor

    args, frames, dpb = ctx["args"], ctx["frames"], ctx["dpb"]
    h, w, force = ctx["h"], ctx["w"], ctx["force"]
    codec = _make_codec(ctx)
    seq = [frames[i % 4] for i in range(args.frames)]
    codec.encode_gop(seq[:2], dpb, 0.7, 0.7)  # warm
    streams, _ = codec.encode_gop(seq, dpb, 0.7, 0.7)

    def run():
        _, d = codec.decode_gop(dpb, streams, h, w, 0.7, 0.7)
        return force(d)

    run()  # warm decode stages
    pool = ThreadPoolExecutor(max_workers=n_threads)
    t0 = time.perf_counter()
    list(pool.map(lambda _i: run(), range(n_threads)))
    dt = time.perf_counter() - t0
    pool.shutdown(wait=True)
    return n_threads * args.frames / dt


def bench_batched_write(ctx) -> float:
    args, frames, force = ctx["args"], ctx["frames"], ctx["force"]
    h, w = ctx["h"], ctx["w"]
    ns = frames[0].shape[0]
    codec = _make_codec(ctx)

    def run_frame_batched(i, dpb, first):
        out = codec.compress_batch(frames[i % 4], dpb, 0.7, 0.7, first)
        dec = codec.decompress_batch(dpb, out["bit_streams"], h, w,
                                     0.7, 0.7, first)
        return dec["dpb"]

    dpb = ctx["dpb"]
    for i in range(max(2, args.warmup)):
        force(run_frame_batched(i, dpb, i == 0))
    t0 = time.perf_counter()
    cur = dpb
    for i in range(args.frames):
        cur = run_frame_batched(i, cur, i == 0)
    force(cur)
    return ns * args.frames / (time.perf_counter() - t0)


def bench_seq_write(ctx) -> float:
    args, frames, force = ctx["args"], ctx["frames"], ctx["force"]
    h, w = ctx["h"], ctx["w"]
    codec = _make_codec(ctx)

    def run_frame(i, dpb, first):
        out = codec.compress(frames[i % 4], dpb, 0.7, 0.7, first)
        dec = codec.decompress(dpb, out["bit_stream"], h, w, 0.7, 0.7, first)
        return dec["dpb"]

    dpb = ctx["dpb"]
    for i in range(max(2, args.warmup)):
        force(run_frame(i, dpb, i == 0))
    t0 = time.perf_counter()
    cur = dpb
    for i in range(args.frames):
        cur = run_frame(i, cur, i == 0)
    force(cur)
    return args.frames / (time.perf_counter() - t0)


def bench_latency(ctx) -> dict:
    """Blocking per-frame latency for the estimation forward. The
    throughput suite lets XLA's async dispatch hide per-frame variance;
    a real-time encoder cares about the distribution, so here every
    frame synchronizes before the next is dispatched."""
    import jax

    from vcm_ts_tpu.models.dmc import make_dpb

    args, force = ctx["args"], ctx["force"]
    model, params, frames = ctx["model"], ctx["params"], ctx["frames"]
    fwd = jax.jit(
        lambda p, x, dpb, first: model.apply(p, x, dpb, 0.7, 0.7, first),
        static_argnums=(3,), donate_argnums=(2,))

    import jax.numpy as jnp

    cur = make_dpb(jnp.copy(frames[0]))
    for i in range(max(2, args.warmup)):
        cur = fwd(params, frames[i % 4], cur, i == 0)["dpb"]
    force(cur)

    lat = []
    cur = make_dpb(jnp.copy(frames[0]))
    for i in range(args.frames):
        t0 = time.perf_counter()
        cur = fwd(params, frames[i % 4], cur, i == 0)["dpb"]
        force(cur)
        lat.append((time.perf_counter() - t0) * 1000.0)
    lat = np.sort(np.asarray(lat[1:]))  # drop the first-P-frame variant
    q = lambda p: float(np.percentile(lat, p))  # noqa: E731
    return {"p50_ms": round(q(50), 2), "p95_ms": round(q(95), 2),
            "p99_ms": round(q(99), 2), "mean_ms": round(float(lat.mean()), 2),
            "max_ms": round(float(lat.max()), 2), "n": int(lat.size)}


def bench_gop(ctx):
    """One full GOP through real container bytes: IntraCodec encodes and
    decodes frame 0 (the encoder, like the reference's, decodes its own
    I-stream so the DPB seeds from the exact reconstruction a decoder will
    have — test_video.py run_one_point semantics), then the pipelined
    VideoCodec engines carry the remaining P-frames. Returns
    (encode_fps, decode_fps) over the whole GOP."""
    import jax
    import jax.numpy as jnp

    from vcm_ts_tpu.codec.engine import IntraCodec
    from vcm_ts_tpu.models.dmc import make_dpb
    from vcm_ts_tpu.models.intra import IntraNoAR
    from vcm_ts_tpu.utils.precision import cast_params, cast_params_mixed

    args, frames, force = ctx["args"], ctx["frames"], ctx["force"]
    h, w = ctx["h"], ctx["w"]
    gop = args.gop
    dtype = frames[0].dtype

    i_model = IntraNoAR()
    i_params = i_model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)), 1.0)
    if args.dtype == "bf16":
        i_params = cast_params(i_params, dtype)
    elif args.dtype == "mixed":
        i_params = cast_params_mixed(i_params)
    i_codec = IntraCodec(i_model, i_params)
    i_codec.update()
    codec = _make_codec(ctx)

    seq = [frames[i % 4] for i in range(1, gop)]  # P-frames
    IQ, PQ = 0.5, 0.7

    def encode():
        i_stream = i_codec.compress(frames[0], IQ)
        r0 = i_codec.decompress(i_stream, h, w, IQ).astype(dtype)
        streams, _ = codec.encode_gop(seq, make_dpb(r0), PQ, PQ)
        return i_stream, streams

    def decode(i_stream, streams):
        r0 = i_codec.decompress(i_stream, h, w, IQ).astype(dtype)
        recons, dpb = codec.decode_gop(make_dpb(r0), streams, h, w, PQ, PQ)
        force(dpb)
        return recons

    # warm every jitted stage (I enc/dec + both P GOP variants)
    i_s, p_s = encode()
    decode(i_s, p_s[:2])

    t0 = time.perf_counter()
    i_s, p_s = encode()
    t1 = time.perf_counter()
    decode(i_s, p_s)
    t2 = time.perf_counter()
    return gop / (t1 - t0), gop / (t2 - t1)


def bench_train_step(args) -> dict:
    import jax
    import jax.numpy as jnp

    from vcm_ts_tpu.models.dmc import DMC, make_dpb
    from vcm_ts_tpu.train.optimizer import make_stage_optimizer
    from vcm_ts_tpu.train.stages import StageParams
    from vcm_ts_tpu.train.train_step import make_cascade_step

    model = DMC(anchor_num=4)
    x0 = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x0, make_dpb(x0), 1.0,
                        1.0, method="init_all")
    stage = StageParams(stage=3, p_frames=args.p_frames,
                        trainable_mode="all", forward_method="cascade",
                        loss_dist_key="mse",
                        loss_rate_keys=("bpp_y", "bpp_z", "bpp_mv_y",
                                        "bpp_mv_z"),
                        lr=1e-4, perceptual_loss=False)
    tx, opt_state = make_stage_optimizer(params, "all", 1e-4)
    step = make_cascade_step(model, tx, stage,
                             lambdas=[85.0, 170.0, 380.0, 840.0],
                             dist_lambda=1.0, pl_lambda=0.0,
                             compute_dtype=(jnp.bfloat16 if args.mp
                                            else None),
                             accum_steps=args.grad_accum)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.random(
        (args.p_frames, 4, 256, 256, 3)), jnp.float32)
    key = jax.random.PRNGKey(0)
    for _ in range(2):
        key, sub = jax.random.split(key)
        params, opt_state, aux, dpb = step(params, opt_state, xs, xs,
                                           make_dpb(xs[0]), sub)
        _ = float(aux.loss[0])
    t0 = time.perf_counter()
    n_steps = max(args.frames // 4, 4)
    for _ in range(n_steps):
        # split per step so the benched step matches real training's
        # input pattern (fresh quantization noise each iteration)
        key, sub = jax.random.split(key)
        params, opt_state, aux, dpb = step(params, opt_state, xs, xs,
                                           make_dpb(xs[0]), sub)
    _ = float(aux.loss[0])
    dt = (time.perf_counter() - t0) / n_steps
    fps = 4 * args.p_frames / dt  # frames consumed per second
    return {
        "metric": f"cascade train step frames/s "
                  f"({'bf16-mp' if args.mp else 'f32'}, 256x256, "
                  f"batch=4 anchors, p_frames={args.p_frames}, BPTT, "
                  f"remat"
                  + (f", grad-accum={args.grad_accum}"
                     if args.grad_accum > 1 else "") + ")",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": 0.0,
    }


if __name__ == "__main__":
    main()
