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


class IntraCodec:
    """Host/device orchestration for IntraNoAR (image_model.py:114-200)."""

    def __init__(self, model, params):
        self.model = model
        self.params = params
        self.gaussian = GaussianCoder("gaussian")
        self.coder = EntropyCoder()
        self.y_table = None
        self.z_table = None

        gauss = self.gaussian

        def compress_fn(p, x, q_scale):
            out = model.apply(p, x, q_scale, method="compress_device")
            out["idx_w_0"] = gauss.build_indexes(out.pop("scales_w_0"))
            out["idx_w_1"] = gauss.build_indexes(out.pop("scales_w_1"))
            return out

        def stage1_fn(p, z_hat, q_scale):
            scales_r_0, carry = model.apply(
                p, z_hat, q_scale, method="decompress_stage1")
            return gauss.build_indexes(scales_r_0), carry

        def stage2_fn(p, y_q_r_0, carry):
            scales_r_1, carry2 = model.apply(
                p, y_q_r_0, carry, method="decompress_stage2")
            return gauss.build_indexes(scales_r_1), carry2

        def stage3_fn(p, y_q_r_1, carry, q_scale):
            return model.apply(
                p, y_q_r_1, carry, q_scale, method="decompress_stage3")

        self._compress = jax.jit(compress_fn)
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
    def compress(self, x, q_scale) -> bytes:
        assert self.z_table is not None, "call update() first"
        out = self._compress(self.params, jnp.asarray(x), q_scale)
        z_hat = np.asarray(out["z_hat"])
        z_idx = be.build_indexes(z_hat.shape)

        self.coder.reset_encoder()
        self.coder.encode_with_indexes(z_hat, z_idx, self.z_table)
        self.coder.encode_with_indexes(
            np.asarray(out["y_q_w_0"]), np.asarray(out["idx_w_0"]), self.y_table)
        self.coder.encode_with_indexes(
            np.asarray(out["y_q_w_1"]), np.asarray(out["idx_w_1"]), self.y_table)
        return self.coder.flush_encoder()

    # ------------------------------------------------------------- decompress
    def decompress(self, stream: bytes, height: int, width: int, q_scale):
        assert self.z_table is not None, "call update() first"
        zh, zw = bs.get_downsampled_shape(height, width, 64)
        z_shape = (1, zh, zw, self.model.N)
        z_idx = be.build_indexes(z_shape)

        self.coder.set_stream(stream)
        z_hat = self.coder.decode_stream(z_idx, self.z_table).astype(np.float32)

        idx0, carry = self._stage1(self.params, jnp.asarray(z_hat), q_scale)
        y_q_r_0 = self.coder.decode_stream(
            np.asarray(idx0), self.y_table).astype(np.float32)

        idx1, carry2 = self._stage2(self.params, jnp.asarray(y_q_r_0), carry)
        y_q_r_1 = self.coder.decode_stream(
            np.asarray(idx1), self.y_table).astype(np.float32)

        x_hat = self._stage3(self.params, jnp.asarray(y_q_r_1), carry2, q_scale)
        return x_hat

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
