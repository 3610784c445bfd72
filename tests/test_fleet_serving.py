"""Fleet serving: N independent streams sharded over a device mesh through
the batched codec engines, byte-identical per stream to single-device runs.

The reference scales multi-stream eval by forking one worker process per
(sequence, rate-point) pair onto its GPU pool (DCVC_HEM/test_video.py
process fan-out over worker_num). The TPU-native equivalent is one GSPMD
program: the batched engines' batch axis is sharded over a jax.sharding
Mesh (one stream row per device), the device stages run the same jitted
binaries, and the host rANS coders stay per-stream. These tests pin the
correctness contract on the virtual 8-device CPU mesh (conftest.py): every
per-stream bitstream byte and every decoded plane must be identical to the
unsharded single-device path, so fleet throughput is pure scaling with no
semantic drift.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vcm_ts_tpu.codec.engine import IntraCodec, VideoCodec
from vcm_ts_tpu.models.dmc import DMC, make_dpb

N = 8  # one stream per virtual device


@pytest.fixture(scope="module")
def fleet():
    if len(jax.devices()) < N:
        pytest.skip(f"needs {N} devices")
    model = DMC(anchor_num=4)
    x0 = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x0, make_dpb(x0), 1.0, 1.0,
                        method="init_all")
    codec = VideoCodec(model, params)
    codec.update()
    mesh = Mesh(np.array(jax.devices()[:N]), ("data",))
    return model, params, codec, mesh


def _content(seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random((N, 8, 8, 3)).astype(np.float32)
    kron = np.ones((1, 8, 8, 1))
    x = np.kron(base, kron).astype(np.float32)
    ref = np.kron(np.roll(base, 1, axis=2), kron).astype(np.float32)
    # N distinct rate points — the reference's rate-sweep fan-out
    mv_q = np.linspace(0.6, 1.3, N).reshape(N, 1, 1, 1).astype(np.float32)
    y_q = np.linspace(0.7, 1.5, N).reshape(N, 1, 1, 1).astype(np.float32)
    return x, ref, mv_q, y_q


def test_fleet_encode_byte_identical(fleet):
    """compress_batch over the mesh == N single-device compress() calls,
    byte for byte, and the batched device stages actually shard."""
    model, params, codec, mesh = fleet
    x, ref, mv_q, y_q = _content()

    # ground truth: per-stream single-device encode (no sharding set)
    gt = []
    for i in range(N):
        dpb_i = make_dpb(jnp.asarray(ref[i:i + 1]))
        out = codec.compress(jnp.asarray(x[i:i + 1]), dpb_i,
                             jnp.asarray(mv_q[i:i + 1]),
                             jnp.asarray(y_q[i:i + 1]), is_first_p=True)
        gt.append(out["bit_stream"])

    codec.set_fleet_sharding(mesh)
    try:
        dpb = codec.shard_batch(make_dpb(jnp.asarray(ref)))
        out = codec.compress_batch(
            codec.shard_batch(jnp.asarray(x)), dpb,
            codec.shard_batch(jnp.asarray(mv_q)),
            codec.shard_batch(jnp.asarray(y_q)), is_first_p=True)
        assert len(out["bit_streams"]) == N
        for i in range(N):
            assert out["bit_streams"][i] == gt[i], (
                f"stream {i}: fleet-sharded bytes differ from single-device")
        # the recon DPB must come back sharded over the mesh (the fleet
        # actually distributed the work, not just resharded inputs)
        sh = out["dpb"]["ref_frame"].sharding
        assert not sh.is_fully_replicated, f"recon not sharded: {sh}"
    finally:
        codec._batch_sharding = None


def test_fleet_decode_identical(fleet):
    """decompress_batch over the mesh == N single-stream decompress()
    calls, every decoded symbol plane and recon bit-identical per stream.

    Single-stream runs are the ground truth (the reference's per-process
    semantics), NOT the unsharded batch-8 program: the fleet's per-device
    local shapes are batch-1, which reproduces the single-stream programs
    bit-exactly, while XLA's batch-8 kernels reassociate differently (same
    ULP-level divergence the batched-vs-single tests in test_dmc_codec.py
    tolerate on recon). An encoder/decoder pair must sit at ONE of these
    operating points; fleet serving pairs with single-stream/fleet encode
    (test_fleet_encode_byte_identical proves those coincide)."""
    model, params, codec, mesh = fleet
    x, ref, mv_q, y_q = _content(seed=1)

    # streams + ground-truth decode: per-stream single-device runs
    streams, seq = [], []
    for i in range(N):
        dpb_i = make_dpb(jnp.asarray(ref[i:i + 1]))
        s = codec.compress(jnp.asarray(x[i:i + 1]), dpb_i,
                           jnp.asarray(mv_q[i:i + 1]),
                           jnp.asarray(y_q[i:i + 1]),
                           is_first_p=True)["bit_stream"]
        streams.append(s)
        seq.append(codec.decompress(dpb_i, s, 64, 64,
                                    jnp.asarray(mv_q[i:i + 1]),
                                    jnp.asarray(y_q[i:i + 1]),
                                    is_first_p=True, return_symbols=True))

    codec.set_fleet_sharding(mesh)
    try:
        dpb_s = codec.shard_batch(make_dpb(jnp.asarray(ref)))
        out = codec.decompress_batch(
            dpb_s, streams, 64, 64,
            codec.shard_batch(jnp.asarray(mv_q)),
            codec.shard_batch(jnp.asarray(y_q)),
            is_first_p=True, return_symbols=True)
    finally:
        codec._batch_sharding = None

    # symbol planes are produced by the host rANS coders reading DEVICE-
    # computed scale indexes: equality proves the sharded stages reproduced
    # every index bit-exactly (a single index flip desyncs the stream)
    for plane_idx in range(6):
        bp = np.asarray(out["symbols"][plane_idx])
        for i in range(N):
            np.testing.assert_array_equal(
                bp[i], np.asarray(seq[i]["symbols"][plane_idx])[0],
                err_msg=f"stream {i} symbol plane {plane_idx}")
    rec = np.asarray(out["dpb"]["ref_frame"])
    for i in range(N):
        np.testing.assert_array_equal(
            rec[i], np.asarray(seq[i]["dpb"]["ref_frame"])[0],
            err_msg=f"stream {i} recon")


def test_shard_batch_non_divisible_batch_is_unsharded(fleet):
    """A batch whose leading dim doesn't tile the mesh (e.g. a 2-rate
    sweep on an 8-device fleet) must upload unsharded instead of raising —
    the guard test_video.py --fleet relies on for odd rate_num."""
    model, params, codec, mesh = fleet
    codec.set_fleet_sharding(mesh)
    try:
        t = codec.shard_batch({"q": jnp.ones((2, 1, 1, 1)),
                               "x": jnp.ones((N, 4, 4, 3))})
        assert t["q"].sharding.is_fully_replicated  # fell back
        assert not t["x"].sharding.is_fully_replicated  # still sharded
    finally:
        codec._batch_sharding = None


def test_fleet_intra_codec(fleet):
    """IntraCodec's batched engines ride the same fleet sharding."""
    from vcm_ts_tpu.models.intra import IntraNoAR

    _, _, _, mesh = fleet
    model = IntraNoAR(N=32, anchor_num=4)
    x0 = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(1), x0, 1.0)
    codec = IntraCodec(model, params)
    codec.update()

    rng = np.random.default_rng(2)
    x = np.kron(rng.random((N, 8, 8, 3)),
                np.ones((1, 8, 8, 1))).astype(np.float32)
    q = np.linspace(0.6, 1.4, N).reshape(N, 1, 1, 1).astype(np.float32)

    # ground truth: per-stream single-device compress() calls, same as the
    # VideoCodec tests above — the fleet's per-device local shapes are
    # batch-1, which reproduces the single-stream programs bit-exactly,
    # while the unsharded batch-8 program may reassociate differently
    gt = [codec.compress(jnp.asarray(x[i:i + 1]), jnp.asarray(q[i:i + 1]))
          for i in range(N)]

    codec.set_fleet_sharding(mesh)
    try:
        out = codec.compress_batch(codec.shard_batch(jnp.asarray(x)),
                                   codec.shard_batch(jnp.asarray(q)))
    finally:
        codec._batch_sharding = None
    assert out == gt  # lists of per-stream bytes


def test_concurrent_decode_gop_threads_bit_identical(fleet):
    """bench.py --pipelined-decode --streams N: decode_gop holds no shared
    mutable codec state (per-frame EntropyCoders, read-only tables), so N
    host threads can interleave sessions through ONE codec — each
    stream's tunnel-RTT stalls overlap the others' device stages. Pin the
    contract: concurrent decodes reproduce the sequential recons exactly."""
    from concurrent.futures import ThreadPoolExecutor

    model, params, codec, mesh = fleet
    rng = np.random.default_rng(7)
    seq = [jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
           for _ in range(3)]
    dpb = make_dpb(seq[0], model.channel_N, model.channel_M)
    streams, _ = codec.encode_gop(seq, dpb, 0.7, 0.7)

    ref_recons, _ = codec.decode_gop(dpb, streams, 64, 64, 0.7, 0.7)
    ref = [np.asarray(r) for r in ref_recons]

    def run(_i):
        recons, _ = codec.decode_gop(dpb, streams, 64, 64, 0.7, 0.7)
        return [np.asarray(r) for r in recons]

    with ThreadPoolExecutor(max_workers=3) as pool:
        results = list(pool.map(run, range(3)))
    for got in results:
        assert len(got) == len(ref)
        for g, r in zip(got, ref):
            np.testing.assert_array_equal(g, r)


def test_concurrent_encode_gop_threads_byte_identical(fleet):
    """Encode-side dual of the decode thread test: _host_encode uses a
    fresh per-call coder, so N threads can interleave encode_gop sessions
    through one codec. Concurrent streams must be byte-identical to the
    sequential encode."""
    from concurrent.futures import ThreadPoolExecutor

    model, params, codec, mesh = fleet
    rng = np.random.default_rng(8)
    seq = [jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
           for _ in range(3)]
    dpb = make_dpb(seq[0], model.channel_N, model.channel_M)
    ref_streams, _ = codec.encode_gop(seq, dpb, 0.7, 0.7)

    def run(_i):
        streams, _ = codec.encode_gop(seq, dpb, 0.7, 0.7)
        return streams

    with ThreadPoolExecutor(max_workers=3) as pool:
        results = list(pool.map(run, range(3)))
    for got in results:
        assert [bytes(g) for g in got] == [bytes(r) for r in ref_streams]
