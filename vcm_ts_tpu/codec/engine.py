"""Codec engines: orchestrate jitted device stages around the host rANS coder.

The TPU-native answer to the reference's compress/decompress/encode_decode
methods (image_model.py:114-200, video_model.py:263-468): all network math is
grouped into as few jitted stages as the sequential entropy coding allows;
between stages, only int32 symbol/index planes cross the host boundary.

Train paths never touch these engines (bit costs are analytic), so training
is 100% on-device.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import bit_estimator as be
from ..entropy.coder import EntropyCoder
from ..entropy.gaussian import GaussianCoder
from . import bitstream as bs


def _i16(x):
    """Symbol planes cross the host boundary as int16: covers the coder's
    in-window symbols and any realistic bypass magnitudes, at 1/4 the f32
    tunnel traffic. Saturate in f32 BEFORE any int cast: float->int
    conversion is implementation-defined in XLA for NaN or out-of-range
    values (backends differ), so a diverged-weights plane clipped after
    the cast could disagree between a TPU encoder and a CPU decoder.
    +/-32767 is exactly representable in f32; NaN maps to 0."""
    xf = jnp.nan_to_num(x.astype(jnp.float32), nan=0.0,
                        posinf=32767.0, neginf=-32768.0)
    return jnp.clip(xf, -32768.0, 32767.0).astype(jnp.int16)


class _FleetShardingMixin:
    """Shard a codec's batched engines over a device mesh (fleet serving).

    The reference scales multi-stream eval by forking one process per
    (sequence, rate-point) pair onto its GPU pool (DCVC_HEM/test_video.py
    process fan-out); the TPU-native equivalent is ONE GSPMD program whose
    batch axis is sharded over the mesh — each device carries its streams'
    rows through the same jitted stage binaries, so per-stream bytes are
    identical to a single-device run (tests/test_fleet_serving.py) while the
    fleet runs N streams per program dispatch. Host rANS stays per-stream on
    the host thread pool; only the device stages shard.
    """

    _batch_sharding = None
    _sp_act = None
    _sp_rep = None
    _sp_n = 1

    def set_spatial_sharding(self, mesh, axis: str = "spatial"):
        """Enable H-sharded device stages for the REAL-BITSTREAM path —
        the multi-chip 4K answer (PERF.md "4K is the SP use case").

        Fleet sharding scales N independent streams over a mesh; this
        scales ONE stream: every activation/symbol plane uploads H-sharded
        (NHWC axis 1), params replicate, and GSPMD partitions the same
        stage programs with conv halo exchanges over ICI. Host rANS is
        unchanged — symbol planes are gathered to host exactly as in the
        single-device path.

        Guarantees (tests/test_engine_spatial.py, virtual mesh):
        - WITHIN-mode: encoder and decoder share the same compiled
          partitioned stage programs, so chained encode/decode stays in
          bit-exact lockstep — the same property the single-device
          engine has.
        - CROSS-mode: from identical DPB state the SP engine writes
          byte-identical streams (the u8 scale-index quantization
          absorbs cross-program ULP drift) and decodes single-device
          streams; recon parity across modes is drift-bounded (~1e-3 on
          isolated pixels), not bitwise — two differently-partitioned
          XLA programs may round differently, exactly as the reference's
          torch kernels may across GPU algorithm choices. Consequently
          chained P-frame streams drift apart across modes (each chain
          stays self-consistent); decode a chain in the mode that
          encoded it, or rekey at GOP boundaries when switching.

        Mutually exclusive with set_fleet_sharding (fleet shards the
        batch axis of the same uploads).
        """
        from jax.sharding import NamedSharding, PartitionSpec

        assert self._batch_sharding is None, \
            "spatial and fleet sharding are mutually exclusive"
        self._sp_act = NamedSharding(mesh, PartitionSpec(None, axis))
        self._sp_rep = NamedSharding(mesh, PartitionSpec())
        self._sp_n = mesh.shape[axis]
        # params replicate onto the mesh once; all stage jits pick the
        # committed shardings up from their inputs
        self.params = jax.device_put(self.params, self._sp_rep)
        return self._sp_act

    def spatial_shard_tree(self, tree):
        """Upload a pytree of NHWC planes (frame x, DPB) H-sharded;
        planes whose H doesn't tile the mesh replicate instead (GSPMD
        reshards internally as needed). No-op without spatial mode."""
        if self._sp_act is None:
            return tree
        return jax.tree_util.tree_map(self._sp_put_leaf, tree)

    def _sp_put_leaf(self, v):
        if (getattr(v, "ndim", 0) == 4
                and v.shape[1] % self._sp_n == 0 and v.shape[1] > 1):
            return jax.device_put(v, self._sp_act)
        return jax.device_put(v, self._sp_rep)

    def set_fleet_sharding(self, mesh, axis: str = "data"):
        """Enable fleet serving over `mesh`. After calling this, pass
        batched inputs through shard_batch() (or pre-sharded arrays) to
        compress_batch / decompress_batch."""
        from jax.sharding import NamedSharding, PartitionSpec

        self._batch_sharding = NamedSharding(mesh, PartitionSpec(axis))
        return self._batch_sharding

    def shard_batch(self, tree):
        """device_put every leaf of a batched pytree (frames, DPB, q-scale
        rows) with one stream-row group per mesh device. No-op when no
        fleet sharding is set; leaves whose leading dim doesn't tile the
        mesh upload unsharded (same guard as _put — a 2-rate sweep on an
        8-device fleet must run, just without that array sharded)."""
        if self._batch_sharding is None:
            return tree
        size = self._batch_sharding.mesh.size
        return jax.tree_util.tree_map(
            lambda v: (jax.device_put(v, self._batch_sharding)
                       if v.shape and v.shape[0] % size == 0
                       else jnp.asarray(v)), tree)

    def _put(self, a):
        """Upload a host array, sharded per the active serving mode:
        fleet -> batch axis, spatial -> H axis, neither -> plain upload.
        Falls back to an unsharded upload when the relevant dim doesn't
        tile the mesh (e.g. a single-stream call on a fleet codec)."""
        if self._sp_act is not None:
            return self._sp_put_leaf(np.asarray(a))
        if (self._batch_sharding is None
                or a.shape[0] % self._batch_sharding.mesh.size):
            return jnp.asarray(a)
        return jax.device_put(a, self._batch_sharding)


class VideoCodec(_FleetShardingMixin):
    """Host/device orchestration for DMC P-frames (video_model.py:263-468).

    Stream order per frame: mv_z, mv_y step0, mv_y step1, z, y step0, y step1
    — six interleaved planes in one rANS stream. Decode ping-pongs between
    five jitted device stages and the sequential host coder; z is decoded
    together with mv_y step1 since its indexes are static (channel ids).

    The ENCODER runs the decoder's exact stage programs for every prior the
    stream depends on (plus three encoder-only programs for flow/latent
    analysis): under XLA, a separately-fused one-program encoder recomputes
    priors with different fusion boundaries, and the resulting ULP drift can
    flip scale indexes / desync rANS on chained P-frames. Sharing the
    compiled stage binaries makes encode/decode bit-exact by construction —
    the property the reference gets for free from running one set of torch
    kernels (video_model.py:263-352).
    """

    def __init__(self, model, params):
        self.model = model
        self.params = params
        self.gaussian = GaussianCoder("laplace")
        self.coder = EntropyCoder()
        self.y_table = None
        self.z_table = None
        self.z_mv_table = None
        self._batch_sharding = None

        gauss = self.gaussian

        def idx_u8(scales):
            # scale-table rows < 256: ship indexes as uint8 to quarter the
            # device->host transfer (the tunnel link is the bottleneck)
            return gauss.build_indexes(scales).astype(jnp.uint8)

        def enc_front_fn(p, x, dpb, mv_q):
            mv_y, mv_z_hat = model.apply(p, x, dpb, mv_q,
                                         method="encode_front")
            return mv_y, _i16(mv_z_hat)

        def enc_latent_fn(p, x, contexts, y_q):
            y, z_hat = model.apply(p, x, contexts, y_q,
                                   method="encode_latent")
            return y, _i16(z_hat)

        # symbol planes enter the network in the parameter dtype: the
        # encoder's rounded symbols are exactly representable there by
        # construction (they were produced by round() in this dtype), and
        # encoder/decoder share these programs, so the cast cannot desync
        # the chain. Keeps the decode-side chain at bf16 speed in bf16 mode.
        param_dtype = jax.tree_util.tree_leaves(params)[0].dtype

        def stage1_fn(p, mv_z_hat, dpb):
            s, carry = model.apply(p, mv_z_hat.astype(param_dtype), dpb,
                                   method="decompress_stage1")
            return idx_u8(s), carry

        def stage2_fn(p, mv_y_q_r_0, carry):
            s, carry2 = model.apply(p, mv_y_q_r_0.astype(param_dtype), carry,
                                    method="decompress_stage2")
            return idx_u8(s), carry2

        def stage3a_fn(p, mv_y_q_r_1, carry, dpb, mv_q, is_first_p):
            return model.apply(p, mv_y_q_r_1.astype(param_dtype), carry,
                               dpb, mv_q, is_first_p,
                               method="decompress_stage3a")

        def stage3b_fn(p, z_hat, context3, dpb):
            s, carry = model.apply(p, z_hat.astype(param_dtype), context3,
                                   dpb, method="decompress_stage3b")
            return idx_u8(s), carry

        def stage5_fn(p, y_q_r_0, carry):
            s, carry2 = model.apply(p, y_q_r_0.astype(param_dtype), carry,
                                    method="decompress_stage5")
            return idx_u8(s), carry2

        def stage6_fn(p, y_q_r_1, carry, contexts, y_q):
            out = model.apply(p, y_q_r_1.astype(param_dtype), carry,
                              contexts, y_q, method="decompress_stage6")
            out["dpb"] = jax.tree_util.tree_map(
                lambda v: v.astype(param_dtype), out["dpb"])
            return out

        from ..models import common as cm
        self._enc_front = jax.jit(enc_front_fn)
        self._enc_latent = jax.jit(enc_latent_fn)
        self._sym0 = jax.jit(
            lambda y, means, qs: _i16(cm.encode_symbols_step0(y, means, qs)))
        self._sym1 = jax.jit(
            lambda y, m0, m1, qs: _i16(cm.encode_symbols_step1(y, m0, m1, qs)))
        self._stage1 = jax.jit(stage1_fn)
        self._stage2 = jax.jit(stage2_fn)
        self._stage3a = jax.jit(stage3a_fn, static_argnums=(5,))
        self._stage3b = jax.jit(stage3b_fn)
        self._stage5 = jax.jit(stage5_fn)
        self._stage6 = jax.jit(stage6_fn)
        self._forward = jax.jit(
            lambda p, x, dpb, mv_q, y_q, is_first_p: model.apply(
                p, x, dpb, mv_q, y_q, is_first_p),
            static_argnums=(5,))

    def update(self, force: bool = False):
        if self.z_table is not None and not force:
            return
        self.y_table = self.gaussian.build_table()
        z_model = be.BitEstimator(self.model.channel_N)
        self.z_table = be.build_table(
            z_model, {"params": self.params["params"]["bit_estimator_z"]})
        self.z_mv_table = be.build_table(
            z_model, {"params": self.params["params"]["bit_estimator_z_mv"]})

    # ---------------------------------------------------------------- forward
    def forward(self, x, dpb, mv_y_q_scale, y_q_scale, is_first_p=False):
        return self._forward(self.params, jnp.asarray(x), dpb,
                             mv_y_q_scale, y_q_scale, is_first_p)

    # --------------------------------------------------------------- compress
    def _compress_planes(self, x, dpb, mv_y_q_scale, y_q_scale, is_first_p):
        """Dispatch the encode chain (all device-side, fully async): the
        decoder's stage programs interleaved with the encoder-only analysis
        programs and symbol quantization. Returns the symbol/index planes
        (to be pulled by the host coder) and the decoder-exact DPB."""
        p = self.params
        x = self._put(x)
        mv_y, mv_z_hat = self._enc_front(p, x, dpb, mv_y_q_scale)
        idx0, carry = self._stage1(p, mv_z_hat, dpb)
        mv_w0 = self._sym0(mv_y, carry[0], carry[2])
        idx1, carry = self._stage2(p, mv_w0, carry)
        mv_w1 = self._sym1(mv_y, carry[2], carry[3], carry[4])
        contexts = self._stage3a(p, mv_w1, carry, dpb, mv_y_q_scale,
                                 is_first_p)
        y, z_hat = self._enc_latent(p, x, contexts, y_q_scale)
        idx_y0, carry = self._stage3b(p, z_hat, contexts[2], dpb)
        y_w0 = self._sym0(y, carry[0], carry[2])
        idx_y1, carry = self._stage5(p, y_w0, carry)
        y_w1 = self._sym1(y, carry[2], carry[3], carry[4])
        out6 = self._stage6(p, y_w1, carry, contexts, y_q_scale)
        return {
            "mv_z_hat": mv_z_hat,
            "mv_y_q_w_0": mv_w0, "mv_idx_w_0": idx0,
            "mv_y_q_w_1": mv_w1, "mv_idx_w_1": idx1,
            "z_hat": z_hat,
            "y_q_w_0": y_w0, "idx_w_0": idx_y0,
            "y_q_w_1": y_w1, "idx_w_1": idx_y1,
            "dpb": out6["dpb"],
        }

    def compress(self, x, dpb, mv_y_q_scale, y_q_scale, is_first_p=False):
        assert self.z_table is not None, "call update() first"
        out = self._compress_planes(x, dpb, mv_y_q_scale, y_q_scale,
                                    is_first_p)
        return {"bit_stream": self._host_encode(out), "dpb": out["dpb"]}

    def _host_encode(self, out) -> bytes:
        """Turn one frame's device symbol planes into its rANS stream.

        All ten planes come down in ONE device_get — sequential per-plane
        fetches each pay a full tunnel/PCIe round trip. A fresh per-call
        coder (cheap: one buffered encoder) keeps the whole encode path
        free of shared mutable state, so concurrent encode sessions can
        interleave on host threads (bench --pipelined-encode --streams N)
        exactly like decode_gop's per-frame coders."""
        h = jax.device_get({k: v for k, v in out.items() if k != "dpb"})
        coder = EntropyCoder()
        coder.reset_encoder()
        coder.encode_with_indexes(
            h["mv_z_hat"], be.build_indexes(h["mv_z_hat"].shape),
            self.z_mv_table)
        coder.encode_with_indexes(
            h["mv_y_q_w_0"], h["mv_idx_w_0"], self.y_table)
        coder.encode_with_indexes(
            h["mv_y_q_w_1"], h["mv_idx_w_1"], self.y_table)
        coder.encode_with_indexes(
            h["z_hat"], be.build_indexes(h["z_hat"].shape), self.z_table)
        coder.encode_with_indexes(
            h["y_q_w_0"], h["idx_w_0"], self.y_table)
        coder.encode_with_indexes(
            h["y_q_w_1"], h["idx_w_1"], self.y_table)
        return coder.flush_encoder()

    def compress_batch(self, x, dpb, mv_y_q_scale, y_q_scale,
                       is_first_p=False):
        """Compress N independent streams (rate points / sequences) in one
        batched device pass; host-encodes each batch row into its own rANS
        stream, byte-identical to N sequential compress() calls.

        Returns {"bit_streams": [bytes] * N, "dpb": batched dpb}."""
        assert self.z_table is not None, "call update() first"
        out = self._compress_planes(x, dpb, mv_y_q_scale, y_q_scale,
                                    is_first_p)
        n = out["z_hat"].shape[0]
        host = {k: np.asarray(v) for k, v in out.items() if k != "dpb"}
        streams = [
            self._host_encode({k: v[i:i + 1] for k, v in host.items()})
            for i in range(n)
        ]
        return {"bit_streams": streams, "dpb": out["dpb"]}

    def encode_gop(self, frames, dpb, mv_y_q_scale, y_q_scale,
                   is_first_p=True):
        """Pipelined encoder for a burst of P-frames (SURVEY.md hard part 2).

        The decode path is inherently sequential, but on the ENCODE side the
        host rANS of frame t can overlap the device compute of frame t+1:
        device work is dispatched asynchronously and only the host pull of
        frame t's symbol planes synchronizes with it. Streams are
        byte-identical to sequential compress() calls.

        Returns (list of bit_stream bytes, final dpb).
        """
        assert self.z_table is not None, "call update() first"
        streams = []
        pending = None
        for i, x in enumerate(frames):
            out = self._compress_planes(x, dpb, mv_y_q_scale, y_q_scale,
                                        is_first_p if i == 0 else False)
            # the DPB comes out of the decoder's own stage-6 program
            # (recon already clamped), so chaining it keeps the encoder
            # bit-exactly in lockstep with any decoder
            dpb = out["dpb"]
            if pending is not None:
                streams.append(self._host_encode(pending))
            pending = out
        if pending is not None:
            streams.append(self._host_encode(pending))
        return streams, dpb

    def decode_gop(self, dpb, streams, height: int, width: int,
                   mv_y_q_scale, y_q_scale, is_first_p=True):
        """Pipelined decoder for a burst of per-frame rANS streams
        (VERDICT round-2 item 3; the decode-side dual of encode_gop).

        The per-frame decode chain is inherently sequential — four device
        index fetches interleave with the host rANS reads (the checkerboard
        dual-prior's step-0/step-1 structure, video_model.py:354-422) — but
        across FRAMES two things overlap:

        - each frame owns its own stream, and the stream's leading mv_z
          plane has STATIC indexes (channel ids), so frame t+1's mv_z can
          host-decode and upload while frame t's device stages run;
        - the next frame's stage-1 dispatch rides the async device queue
          behind frame t's stage 6 — no host sync on the recon/DPB between
          frames (the DPB stays device-side for the whole burst).

        Under the axon tunnel each blocking index fetch costs a full
        0.3-0.5 s round trip, so the four per-frame fetches set the floor
        here; on host-attached TPU those are sub-ms PCIe reads and the
        overlapped host rANS (the actual decode cost at ~3.4 Msym/s/core)
        is what this pipelining hides.

        Bit-identical to sequential decompress() calls (each frame uses
        its own EntropyCoder on its own stream). Returns (list of decoded
        frames — device-side (N, H, W, 3) arrays, no host syncs — and the
        final dpb). Only the recon plane is retained per frame: keeping
        each frame's full DPB would pin O(GOP) x ~270 MB of HBM
        (ref_feature alone is (1,1088,1920,64)) and overflow the chip on
        a 64-frame burst; the recon is ~12.5 MB/frame.
        """
        assert self.z_table is not None, "call update() first"
        zh, zw = bs.get_downsampled_shape(height, width, 64)
        z_shape = (1, zh, zw, self.model.channel_N)
        z_idx = be.build_indexes(z_shape)

        def up(symbols):
            return self._put(np.asarray(symbols, np.int16))

        coders = [EntropyCoder() for _ in streams]

        def prefetch(i):
            """Host-decode + upload stream i's leading static-index plane."""
            coders[i].set_stream(streams[i])
            return up(coders[i].decode_stream(z_idx, self.z_mv_table))

        outs = []
        mv_z_next = prefetch(0) if streams else None
        for i in range(len(streams)):
            coder = coders[i]
            first = is_first_p and i == 0
            idx0, carry = self._stage1(self.params, mv_z_next, dpb)
            # overlap: next frame's mv_z host-decode happens while the
            # device computes stage 1 (idx0 is fetched only below)
            if i + 1 < len(streams):
                mv_z_next = prefetch(i + 1)
            mv_y_q_r_0 = coder.decode_stream(np.asarray(idx0), self.y_table)

            idx1, carry = self._stage2(self.params, up(mv_y_q_r_0), carry)
            mv_y_q_r_1 = coder.decode_stream(np.asarray(idx1), self.y_table)
            z_hat = coder.decode_stream(z_idx, self.z_table)

            contexts = self._stage3a(self.params, up(mv_y_q_r_1), carry,
                                     dpb, mv_y_q_scale, first)
            idx_y0, carry = self._stage3b(self.params, up(z_hat),
                                          contexts[2], dpb)
            y_q_r_0 = coder.decode_stream(np.asarray(idx_y0), self.y_table)

            idx_y1, carry = self._stage5(self.params, up(y_q_r_0), carry)
            y_q_r_1 = coder.decode_stream(np.asarray(idx_y1), self.y_table)

            out = self._stage6(self.params, up(y_q_r_1), carry, contexts,
                               y_q_scale)
            dpb = out["dpb"]  # device-side; no host sync between frames
            outs.append(dpb["ref_frame"])
        return outs, dpb

    # ------------------------------------------------------------- decompress
    def decompress(self, dpb, stream: bytes, height: int, width: int,
                   mv_y_q_scale, y_q_scale, is_first_p=False,
                   return_symbols=False):
        assert self.z_table is not None, "call update() first"
        zh, zw = bs.get_downsampled_shape(height, width, 64)
        z_shape = (1, zh, zw, self.model.channel_N)
        z_idx = be.build_indexes(z_shape)

        def up(symbols):
            # upload decoded symbols as int16 (4x less tunnel traffic); the
            # device stages cast them to the parameter dtype. In bf16 mode
            # that cast is exact for |v| <= 256 (8-bit mantissa), which
            # covers the coder's in-window symbols, and the encoder runs
            # the same stage programs so both sides see identical values.
            # _put: H-sharded under spatial serving, plain otherwise.
            return self._put(np.asarray(symbols, np.int16))

        self.coder.set_stream(stream)
        mv_z_hat = self.coder.decode_stream(z_idx, self.z_mv_table)

        idx0, carry = self._stage1(self.params, up(mv_z_hat), dpb)
        mv_y_q_r_0 = self.coder.decode_stream(np.asarray(idx0), self.y_table)

        idx1, carry = self._stage2(self.params, up(mv_y_q_r_0), carry)
        mv_y_q_r_1 = self.coder.decode_stream(np.asarray(idx1), self.y_table)
        z_hat = self.coder.decode_stream(z_idx, self.z_table)

        contexts = self._stage3a(self.params, up(mv_y_q_r_1), carry, dpb,
                                 mv_y_q_scale, is_first_p)
        idx_y0, carry = self._stage3b(self.params, up(z_hat), contexts[2],
                                      dpb)
        y_q_r_0 = self.coder.decode_stream(np.asarray(idx_y0), self.y_table)

        idx_y1, carry = self._stage5(self.params, up(y_q_r_0), carry)
        y_q_r_1 = self.coder.decode_stream(np.asarray(idx_y1), self.y_table)

        out = self._stage6(self.params, up(y_q_r_1), carry, contexts,
                           y_q_scale)
        if return_symbols:
            out["symbols"] = (mv_z_hat, mv_y_q_r_0, mv_y_q_r_1, z_hat,
                              y_q_r_0, y_q_r_1)
        return out

    def decompress_batch(self, dpb, streams, height: int, width: int,
                         mv_y_q_scale, y_q_scale, is_first_p=False,
                         return_symbols=False):
        """Decode N independent bitstreams in lockstep, bit-identically to N
        sequential decompress() calls (VERDICT round-1 item 7).

        The decode chain's host<->device round trips are its cost floor (6
        host rANS reads / 4 device stages per frame); batching N streams —
        the rate points of an eval sweep, or N parallel sequences — through
        the batch axis of each device stage amortizes every round trip over
        N streams. Each stream keeps its own rANS decoder state; the host
        reads concatenate per-stream planes into the batched stage inputs.

        Args:
          dpb: batched DPB with leading dim N (one row per stream).
          streams: list of N per-frame rANS streams.
          mv_y_q_scale / y_q_scale: (N, 1, 1, 1) per-stream q scales.
        """
        assert self.z_table is not None, "call update() first"
        n = len(streams)
        zh, zw = bs.get_downsampled_shape(height, width, 64)
        z_shape = (1, zh, zw, self.model.channel_N)
        z_idx = be.build_indexes(z_shape)

        coders = [EntropyCoder() for _ in range(n)]
        for coder, stream in zip(coders, streams):
            coder.set_stream(stream)

        # per-stream rANS decodes run on a thread pool: the native coder
        # releases the GIL, so N streams decode on N cores (measured: host
        # rANS is the batched-decode bottleneck at ~3.4 Msym/s/core — the
        # device stages amortize, the host side must parallelize)
        from concurrent.futures import ThreadPoolExecutor
        pool = ThreadPoolExecutor(max_workers=min(n, 8))

        def read(per_stream_idx, table):
            outs = list(pool.map(
                lambda ic: np.asarray(
                    ic[1].decode_stream(per_stream_idx[ic[0]], table),
                    np.int16),
                enumerate(coders)))
            return self._put(np.concatenate(outs, axis=0))

        def split(idx_batch):
            idx_batch = np.asarray(idx_batch)
            return [idx_batch[i:i + 1] for i in range(n)]

        try:
            mv_z_hat = read([z_idx] * n, self.z_mv_table)

            idx0, carry = self._stage1(self.params, mv_z_hat, dpb)
            mv_y_q_r_0 = read(split(idx0), self.y_table)

            idx1, carry = self._stage2(self.params, mv_y_q_r_0, carry)
            mv_y_q_r_1 = read(split(idx1), self.y_table)
            z_hat = read([z_idx] * n, self.z_table)

            contexts = self._stage3a(self.params, mv_y_q_r_1, carry, dpb,
                                     mv_y_q_scale, is_first_p)
            idx_y0, carry = self._stage3b(self.params, z_hat, contexts[2],
                                          dpb)
            y_q_r_0 = read(split(idx_y0), self.y_table)

            idx_y1, carry = self._stage5(self.params, y_q_r_0, carry)
            y_q_r_1 = read(split(idx_y1), self.y_table)
        finally:
            pool.shutdown(wait=True)

        out = self._stage6(self.params, y_q_r_1, carry, contexts,
                           y_q_scale)
        if return_symbols:
            out["symbols"] = (mv_z_hat, mv_y_q_r_0, mv_y_q_r_1, z_hat,
                              y_q_r_0, y_q_r_1)
        return out

    # ----------------------------------------------------------- encode+decode
    def encode_decode(self, x, dpb, output_path=None, pic_width=None,
                      pic_height=None, mv_y_q_scale=None, y_q_scale=None,
                      is_first_p=False):
        """Self-checking write-then-read round trip (video_model.py:424-468)."""
        if output_path is None:
            out = self.forward(x, dpb, mv_y_q_scale, y_q_scale, is_first_p)
            return {
                "dpb": out["dpb"],
                "bit_y": float(out["bit_y"]),
                "bit_z": float(out["bit_z"]),
                "bit_mv_y": float(out["bit_mv_y"]),
                "bit_mv_z": float(out["bit_mv_z"]),
                "bit": float(out["bit"]),
                "decoding_time": 0.0,
            }
        mv_y_q_scale, mv_y_q_index = bs.get_rounded_q(mv_y_q_scale)
        y_q_scale, y_q_index = bs.get_rounded_q(y_q_scale)
        t0 = time.time()
        encoded = self.compress(x, dpb, mv_y_q_scale, y_q_scale, is_first_p)
        bs.encode_p(encoded["bit_stream"], mv_y_q_index, y_q_index, output_path)
        bit = bs.filesize(output_path) * 8
        t1 = time.time()
        mv_y_q_index, y_q_index, stream = bs.decode_p(output_path)
        decoded = self.decompress(dpb, stream, pic_height, pic_width,
                                  mv_y_q_index / 100, y_q_index / 100,
                                  is_first_p)
        decoded["dpb"]["ref_frame"].block_until_ready()
        t2 = time.time()
        return {
            "dpb": decoded["dpb"],
            "bit": bit,
            "encoding_time": t1 - t0,
            "decoding_time": t2 - t1,
        }


class IntraCodec(_FleetShardingMixin):
    """Host/device orchestration for IntraNoAR (image_model.py:114-200).

    Like VideoCodec, the encoder derives all write-scales through the
    decoder's own jitted stage programs (bit-exact streams by construction
    under XLA's per-program fusion)."""

    def __init__(self, model, params):
        self.model = model
        self.params = params
        self.gaussian = GaussianCoder("gaussian")
        self.coder = EntropyCoder()
        self.y_table = None
        self.z_table = None

        gauss = self.gaussian

        def idx_u8(scales):
            return gauss.build_indexes(scales).astype(jnp.uint8)

        param_dtype = jax.tree_util.tree_leaves(params)[0].dtype

        def enc_front_fn(p, x, q_scale):
            y, z_hat = model.apply(p, x, q_scale, method="encode_front")
            return y, _i16(z_hat)

        def stage1_fn(p, z_hat, q_scale):
            scales_r_0, carry = model.apply(
                p, z_hat.astype(param_dtype), q_scale,
                method="decompress_stage1")
            return idx_u8(scales_r_0), carry

        def stage2_fn(p, y_q_r_0, carry):
            scales_r_1, carry2 = model.apply(
                p, y_q_r_0.astype(param_dtype), carry,
                method="decompress_stage2")
            return idx_u8(scales_r_1), carry2

        def stage3_fn(p, y_q_r_1, carry, q_scale):
            return model.apply(
                p, y_q_r_1.astype(param_dtype), carry, q_scale,
                method="decompress_stage3")

        from ..models import common as cm
        self._enc_front = jax.jit(enc_front_fn)
        self._sym0 = jax.jit(
            lambda y, means, qs: _i16(cm.encode_symbols_step0(y, means, qs)))
        self._sym1 = jax.jit(
            lambda y, m0, m1, qs: _i16(cm.encode_symbols_step1(y, m0, m1, qs)))
        self._stage1 = jax.jit(stage1_fn)
        self._stage2 = jax.jit(stage2_fn)
        self._stage3 = jax.jit(stage3_fn)
        self._forward = jax.jit(
            lambda p, x, q: model.apply(p, x, q))

    # ------------------------------------------------------------------ setup
    def update(self, force: bool = False):
        """Build quantized CDF tables (reference CompressionModel.update,
        common_model.py:75-80)."""
        if self.z_table is not None and not force:
            return
        self.y_table = self.gaussian.build_table()
        z_params = {"params": self.params["params"]["bit_estimator_z"]}
        z_model = be.BitEstimator(self.model.N)
        self.z_table = be.build_table(z_model, z_params)

    # ---------------------------------------------------------------- forward
    def forward(self, x, q_scale):
        """Entropy-estimated path (no real bitstream)."""
        return self._forward(self.params, jnp.asarray(x), q_scale)

    # --------------------------------------------------------------- compress
    def _compress_planes(self, x, q_scale):
        """Encode chain through the shared decoder stages (all device-side)."""
        p = self.params
        y, z_hat = self._enc_front(p, self._put(x), q_scale)
        idx0, carry = self._stage1(p, z_hat, q_scale)
        y_w0 = self._sym0(y, carry[0], carry[2])
        idx1, carry = self._stage2(p, y_w0, carry)
        y_w1 = self._sym1(y, carry[2], carry[3], carry[4])
        return {"z_hat": z_hat, "y_q_w_0": y_w0, "idx_w_0": idx0,
                "y_q_w_1": y_w1, "idx_w_1": idx1}

    def compress(self, x, q_scale) -> bytes:
        assert self.z_table is not None, "call update() first"
        h = jax.device_get(self._compress_planes(x, q_scale))
        z_idx = be.build_indexes(h["z_hat"].shape)

        # fresh per-call coder: no shared mutable encode state (see
        # VideoCodec._host_encode)
        coder = EntropyCoder()
        coder.reset_encoder()
        coder.encode_with_indexes(h["z_hat"], z_idx, self.z_table)
        coder.encode_with_indexes(h["y_q_w_0"], h["idx_w_0"], self.y_table)
        coder.encode_with_indexes(h["y_q_w_1"], h["idx_w_1"], self.y_table)
        return coder.flush_encoder()

    def compress_batch(self, x, q_scale):
        """N-row batched device compress; one rANS stream per row,
        byte-identical to N sequential compress() calls."""
        assert self.z_table is not None, "call update() first"
        out = self._compress_planes(x, q_scale)
        host = {k: np.asarray(v) for k, v in out.items()}
        n = host["z_hat"].shape[0]
        z_idx = be.build_indexes((1,) + host["z_hat"].shape[1:])
        streams = []
        for i in range(n):
            self.coder.reset_encoder()
            self.coder.encode_with_indexes(host["z_hat"][i:i + 1], z_idx,
                                           self.z_table)
            self.coder.encode_with_indexes(host["y_q_w_0"][i:i + 1],
                                           host["idx_w_0"][i:i + 1],
                                           self.y_table)
            self.coder.encode_with_indexes(host["y_q_w_1"][i:i + 1],
                                           host["idx_w_1"][i:i + 1],
                                           self.y_table)
            streams.append(self.coder.flush_encoder())
        return streams

    # ------------------------------------------------------------- decompress
    def decompress(self, stream: bytes, height: int, width: int, q_scale):
        assert self.z_table is not None, "call update() first"
        zh, zw = bs.get_downsampled_shape(height, width, 64)
        z_shape = (1, zh, zw, self.model.N)
        z_idx = be.build_indexes(z_shape)

        self.coder.set_stream(stream)
        z_hat = self.coder.decode_stream(z_idx, self.z_table).astype(np.int16)

        idx0, carry = self._stage1(self.params, self._put(z_hat), q_scale)
        y_q_r_0 = self.coder.decode_stream(
            np.asarray(idx0), self.y_table).astype(np.int16)

        idx1, carry2 = self._stage2(self.params, self._put(y_q_r_0), carry)
        y_q_r_1 = self.coder.decode_stream(
            np.asarray(idx1), self.y_table).astype(np.int16)

        x_hat = self._stage3(self.params, self._put(y_q_r_1), carry2, q_scale)
        return x_hat

    def decompress_batch(self, streams, height: int, width: int, q_scale):
        """Decode N streams in lockstep through batched device stages (3 host
        reads / 3 device stages amortized over N streams)."""
        assert self.z_table is not None, "call update() first"
        n = len(streams)
        zh, zw = bs.get_downsampled_shape(height, width, 64)
        z_idx = be.build_indexes((1, zh, zw, self.model.N))

        coders = [EntropyCoder() for _ in range(n)]
        for coder, stream in zip(coders, streams):
            coder.set_stream(stream)

        from concurrent.futures import ThreadPoolExecutor
        pool = ThreadPoolExecutor(max_workers=min(n, 8))

        def read(per_stream_idx, table):
            outs = list(pool.map(
                lambda ic: np.asarray(
                    ic[1].decode_stream(per_stream_idx[ic[0]], table),
                    np.int16),
                enumerate(coders)))
            return self._put(np.concatenate(outs, axis=0))

        def split(idx_batch):
            idx_batch = np.asarray(idx_batch)
            return [idx_batch[i:i + 1] for i in range(n)]

        try:
            z_hat = read([z_idx] * n, self.z_table)
            idx0, carry = self._stage1(self.params, z_hat, q_scale)
            y_q_r_0 = read(split(idx0), self.y_table)
            idx1, carry2 = self._stage2(self.params, y_q_r_0, carry)
            y_q_r_1 = read(split(idx1), self.y_table)
        finally:
            pool.shutdown(wait=True)
        return self._stage3(self.params, y_q_r_1, carry2, q_scale)

    # ----------------------------------------------------------- encode+decode
    def encode_decode(self, x, q_scale, output_path=None,
                      pic_width=None, pic_height=None):
        """Write-to-file self-checking round trip (image_model.py:114-146)."""
        if output_path is None:
            out = self.forward(x, q_scale)
            return {
                "bit": float(out["bit"]),
                "x_hat": out["x_hat"],
                "encoding_time": 0.0,
                "decoding_time": 0.0,
            }
        assert pic_height is not None and pic_width is not None
        q_scale, q_index = bs.get_rounded_q(q_scale)
        t0 = time.time()
        stream = self.compress(x, q_scale)
        bs.encode_i(pic_height, pic_width, q_index, stream, output_path)
        bit = bs.filesize(output_path) * 8
        t1 = time.time()
        height, width, q_index, stream = bs.decode_i(output_path)
        x_hat = self.decompress(stream, height, width, q_index / 100)
        x_hat.block_until_ready()
        t2 = time.time()
        return {
            "bit": bit,
            "x_hat": x_hat,
            "encoding_time": t1 - t0,
            "decoding_time": t2 - t1,
        }
