"""P-frame (DMC) model + codec tests: per-frame forward, GOP chaining,
and the full .bin round trip with decoder==encoder-recon equality.

Uses reference-default channel widths but small frames (64x64) on CPU.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcm_ts_tpu.codec.engine import VideoCodec
from vcm_ts_tpu.models.dmc import DMC, make_dpb


@pytest.fixture(scope="module")
def dmc():
    model = DMC(anchor_num=4)
    x = jnp.zeros((1, 64, 64, 3))
    dpb = make_dpb(x)
    params = model.init(jax.random.PRNGKey(0), x, dpb, 1.0, 1.0,
                        method="init_all")
    codec = VideoCodec(model, params)
    return model, params, codec


def _frames(seed=0, n=3):
    rng = np.random.default_rng(seed)
    base = rng.random((1, 8, 8, 3)).astype(np.float32)
    frames = []
    for t in range(n):
        shifted = np.roll(base, t, axis=2) + 0.01 * rng.random((1, 8, 8, 3))
        frames.append(np.kron(shifted, np.ones((1, 8, 8, 1)))[:, :64, :64, :]
                      .astype(np.float32))
    return frames


def test_forward_one_frame_outputs(dmc):
    model, params, codec = dmc
    frames = _frames()
    dpb = make_dpb(jnp.asarray(frames[0]))
    out = codec.forward(jnp.asarray(frames[1]), dpb, 1.0, 1.0, is_first_p=True)
    for k in ("bpp", "bpp_y", "bpp_z", "bpp_mv_y", "bpp_mv_z", "mse", "me_mse"):
        assert out[k].shape == (1,), k
        assert np.isfinite(float(out[k][0])), k
    assert out["dpb"]["ref_frame"].shape == frames[1].shape
    assert out["dpb"]["ref_feature"].shape == (1, 64, 64, 64)
    assert out["dpb"]["ref_y"].shape == (1, 4, 4, 96)
    assert out["dpb"]["ref_mv_y"].shape == (1, 4, 4, 64)


def test_forward_chained_p_frames(dmc):
    """dpb threads through successive P-frames (is_first_p False after #1)."""
    model, params, codec = dmc
    frames = _frames(seed=1, n=4)
    dpb = make_dpb(jnp.asarray(frames[0]))
    out1 = codec.forward(jnp.asarray(frames[1]), dpb, 1.0, 1.0, is_first_p=True)
    out2 = codec.forward(jnp.asarray(frames[2]), out1["dpb"], 1.0, 1.0,
                         is_first_p=False)
    out3 = codec.forward(jnp.asarray(frames[3]), out2["dpb"], 1.0, 1.0,
                         is_first_p=False)
    assert np.isfinite(float(out3["bpp"][0]))


def test_training_mode_with_noise(dmc):
    model, params, codec = dmc
    frames = _frames(seed=2)
    dpb = make_dpb(jnp.asarray(frames[0]))
    out = model.apply(params, jnp.asarray(frames[1]), dpb, 1.0, 1.0,
                      is_first_p=True, training=True,
                      noise_rng=jax.random.PRNGKey(3))
    assert np.isfinite(float(out["bpp"][0]))


def test_encode_decode_round_trip(tmp_path, dmc):
    model, params, codec = dmc
    codec.update()
    frames = _frames(seed=3)
    dpb = make_dpb(jnp.asarray(frames[0]))

    path = os.path.join(tmp_path, "p.bin")
    out = codec.encode_decode(jnp.asarray(frames[1]), dpb, path,
                              pic_width=64, pic_height=64,
                              mv_y_q_scale=1.0, y_q_scale=1.0,
                              is_first_p=True)
    assert out["bit"] > 0

    # the decoded DPB must exactly match the encoder-side reconstruction
    enc_side = codec.compress(jnp.asarray(frames[1]), dpb, 1.0, 1.0,
                              is_first_p=True)
    np.testing.assert_allclose(
        np.asarray(out["dpb"]["ref_frame"]),
        np.clip(np.asarray(enc_side["dpb"]["ref_frame"]), 0, 1), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["dpb"]["ref_y"]),
        np.asarray(enc_side["dpb"]["ref_y"]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["dpb"]["ref_mv_y"]),
        np.asarray(enc_side["dpb"]["ref_mv_y"]), atol=1e-5)

    # second P-frame chained off the decoded dpb
    path2 = os.path.join(tmp_path, "p2.bin")
    out2 = codec.encode_decode(jnp.asarray(frames[2]), out["dpb"], path2,
                               pic_width=64, pic_height=64,
                               mv_y_q_scale=1.0, y_q_scale=1.0,
                               is_first_p=False)
    assert out2["bit"] > 0


def test_rate_anchor_batch(dmc):
    """Batch dimension = rate anchors: per-sample q_scale rows
    (reference core/data/__init__.py:75, dcvc_hem.py:145)."""
    model, params, codec = dmc
    frames = _frames(seed=4)
    x = jnp.concatenate([jnp.asarray(frames[1])] * 4, axis=0)
    dpb = make_dpb(jnp.concatenate([jnp.asarray(frames[0])] * 4, axis=0))
    mv_q = params["params"]["mv_y_q_scale"]
    y_q = params["params"]["y_q_scale"]
    out = codec.forward(x, dpb, mv_q, y_q, is_first_p=True)
    assert out["bpp"].shape == (4,)


def test_encode_gop_pipelined_matches_sequential(dmc):
    """Pipelined GOP encoding (host rANS of frame t overlapped with device
    compute of frame t+1) must produce byte-identical streams to sequential
    compress() calls."""
    model, params, codec = dmc
    codec.update()
    frames = _frames(seed=5, n=4)
    dpb0 = make_dpb(jnp.asarray(frames[0]))

    streams, final_dpb = codec.encode_gop(
        [jnp.asarray(f) for f in frames[1:]], dpb0, 1.0, 1.0)
    assert len(streams) == 3

    dpb = dpb0
    enc_recons = []
    for i, f in enumerate(frames[1:]):
        out = codec.compress(jnp.asarray(f), dpb, 1.0, 1.0, i == 0)
        dpb = out["dpb"]
        enc_recons.append(np.asarray(dpb["ref_frame"]))
        assert out["bit_stream"] == streams[i], f"frame {i} stream differs"
    np.testing.assert_allclose(np.asarray(final_dpb["ref_frame"]),
                               np.asarray(dpb["ref_frame"]), atol=0)

    # every pipelined stream must decode through the decoder's own DPB chain
    # BIT-EXACTLY to the encoder's reconstruction on every chained frame:
    # the encoder derives all priors through the decoder's own jitted stage
    # programs, so there is no cross-program fusion drift to tolerate
    dpb = dpb0
    for i, s in enumerate(streams):
        dec = codec.decompress(dpb, s, 64, 64, 1.0, 1.0, i == 0)
        dpb = dec["dpb"]
        np.testing.assert_array_equal(
            np.asarray(dpb["ref_frame"]), enc_recons[i],
            err_msg=f"decoder diverged from encoder at chained frame {i}")


def test_decompress_batch_bit_identical_to_sequential(dmc):
    """N streams decoded through batched device stages must produce exactly
    the same symbols/reconstructions as N sequential decompress() calls —
    the round-trip amortization must be free of cross-stream contamination."""
    model, params, codec = dmc
    codec.update()
    frames = _frames(seed=6)
    mv_qs = np.array([0.7, 1.3], np.float32).reshape(2, 1, 1, 1)
    y_qs = np.array([0.8, 1.4], np.float32).reshape(2, 1, 1, 1)

    # two streams: same content, different rate points
    dpb0 = make_dpb(jnp.asarray(frames[0]))
    streams = []
    for r in range(2):
        out = codec.compress(jnp.asarray(frames[1]), dpb0,
                             jnp.asarray(mv_qs[r:r + 1]),
                             jnp.asarray(y_qs[r:r + 1]), is_first_p=True)
        streams.append(out["bit_stream"])

    # sequential reference decode
    seq = [codec.decompress(dpb0, streams[r], 64, 64,
                            jnp.asarray(mv_qs[r:r + 1]),
                            jnp.asarray(y_qs[r:r + 1]), is_first_p=True,
                            return_symbols=True)
           for r in range(2)]

    # batched decode: one DPB row per stream
    dpb_b = make_dpb(jnp.concatenate([jnp.asarray(frames[0])] * 2, axis=0))
    batched = codec.decompress_batch(dpb_b, streams, 64, 64,
                                     jnp.asarray(mv_qs), jnp.asarray(y_qs),
                                     is_first_p=True, return_symbols=True)

    # every decoded rANS symbol plane must be bit-identical per stream —
    # any cross-stream contamination corrupts these first
    for plane_idx in range(6):
        bp = np.asarray(batched["symbols"][plane_idx])
        for r in range(2):
            np.testing.assert_array_equal(
                bp[r], np.asarray(seq[r]["symbols"][plane_idx])[0],
                err_msg=f"stream {r} symbol plane {plane_idx}")

    # reconstructions agree up to batched-vs-single XLA reassociation noise
    # (different programs; random-init feature magnitudes are ~1e4)
    for r in range(2):
        np.testing.assert_allclose(
            np.asarray(batched["dpb"]["ref_frame"][r]),
            np.asarray(seq[r]["dpb"]["ref_frame"][0]), atol=1e-5,
            err_msg=f"stream {r} ref_frame")
        for key in ("ref_feature", "ref_y", "ref_mv_y"):
            got = np.asarray(batched["dpb"][key][r])
            want = np.asarray(seq[r]["dpb"][key][0])
            scale = np.abs(want).max()
            assert np.abs(got - want).max() <= 1e-4 * scale, \
                f"stream {r} {key}: drift beyond 1e-4 of tensor scale"


def test_encode_symbols_match_forward_dual_prior():
    """The engine's encoder-side symbol quantization (against the decoder's
    stage buffers) must equal forward_dual_prior's write-path symbols when
    both see the same priors — the invariant the bit-exact encoder rests
    on (common.py encoder-side notes)."""
    from vcm_ts_tpu.models import common as cm

    rng = np.random.default_rng(7)
    n, h, w, c = 1, 8, 12, 16
    y = jnp.asarray(rng.normal(0, 3, (n, h, w, c)), jnp.float32)
    means = jnp.asarray(rng.normal(0, 1, (n, h, w, c)), jnp.float32)
    scales = jnp.asarray(rng.random((n, h, w, c)) + 0.1, jnp.float32)
    q_raw = jnp.asarray(rng.random((n, h, w, c)) + 0.2, jnp.float32)

    def spatial_prior(params):
        # deterministic fake prior: a fixed 2c-wide slice of the context
        # (the concat layout is y_hat_0_0 | y_hat_1_1 | means | scales | q)
        return params[..., c:3 * c] * 0.5

    fwd = cm.forward_dual_prior(y, means, scales, q_raw, spatial_prior)

    # decoder-side buffers, exactly as the engine derives them
    q_step = jnp.maximum(q_raw, 0.5)
    w0 = cm.encode_symbols_step0(y, means, q_step)
    # reconstruct the write-path step-0 symbols from the forward outputs:
    # y_q has both steps; mask out step 1
    mask0, mask1 = cm.checkerboard_masks(h, w)
    y_q_0, y_q_1 = jnp.split(fwd.y_q, 2, axis=-1)
    ref_w0 = y_q_0 * mask0 + y_q_1 * mask1
    np.testing.assert_array_equal(np.asarray(w0), np.asarray(ref_w0))

    _, carry = cm.decompress_stage_b(w0, means, scales, q_step,
                                     spatial_prior)
    _, _, means_0, means_1 = carry
    w1 = cm.encode_symbols_step1(y, means_0, means_1, q_step)
    ref_w1 = y_q_0 * mask1 + y_q_1 * mask0
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(ref_w1))


def test_bf16_chained_round_trip_bit_exact():
    """In bf16 mode (the TPU serving configuration) chained encode/decode
    must stay bit-exact: symbols are representable in the parameter dtype
    by construction and both sides share the stage programs."""
    model = DMC(anchor_num=4, channel_mv=16, channel_N=16, channel_M=24)
    x0 = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x0, make_dpb(x0, 16, 24),
                        1.0, 1.0, method="init_all")
    params = jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16)
        if v.dtype == jnp.float32 else v, params)
    codec = VideoCodec(model, params)
    codec.update()

    frames = [jnp.asarray(f, jnp.bfloat16) for f in _frames(seed=11, n=4)]
    enc_dpb = make_dpb(frames[0], 16, 24)
    dec_dpb = make_dpb(frames[0], 16, 24)
    for i, f in enumerate(frames[1:]):
        out = codec.compress(f, enc_dpb, 0.7, 0.7, i == 0)
        dec = codec.decompress(dec_dpb, out["bit_stream"], 64, 64,
                               0.7, 0.7, i == 0)
        enc_dpb = out["dpb"]
        dec_dpb = dec["dpb"]
        np.testing.assert_array_equal(
            np.asarray(enc_dpb["ref_frame"], np.float32),
            np.asarray(dec_dpb["ref_frame"], np.float32),
            err_msg=f"bf16 chain diverged at frame {i}")


def test_decode_gop_pipelined_matches_sequential(dmc):
    """Pipelined GOP decoding (frame t+1's static-index mv_z plane
    host-decoded while frame t's device stages run, DPB device-resident
    across frames) must be bit-identical to sequential decompress()
    calls on every chained frame."""
    model, params, codec = dmc
    codec.update()
    frames = _frames(seed=9, n=4)
    dpb0 = make_dpb(jnp.asarray(frames[0]))

    streams, _ = codec.encode_gop(
        [jnp.asarray(f) for f in frames[1:]], dpb0, 1.0, 1.0)

    # sequential ground truth
    dpb = dpb0
    seq_recons = []
    for i, s in enumerate(streams):
        dec = codec.decompress(dpb, s, 64, 64, 1.0, 1.0, i == 0)
        dpb = dec["dpb"]
        seq_recons.append(np.asarray(dpb["ref_frame"]))

    outs, final_dpb = codec.decode_gop(dpb0, streams, 64, 64, 1.0, 1.0)
    assert len(outs) == 3
    for i, recon in enumerate(outs):
        np.testing.assert_array_equal(
            np.asarray(recon), seq_recons[i],
            err_msg=f"pipelined decode diverged at chained frame {i}")
    np.testing.assert_array_equal(np.asarray(final_dpb["ref_frame"]),
                                  seq_recons[-1])


def test_i16_saturation_well_defined():
    """_i16 must map NaN/inf/out-of-range values deterministically (f32
    saturation BEFORE the int cast): float->int conversion of such values
    is implementation-defined in XLA, and the symbol planes cross the
    encoder/decoder boundary — both sides must agree even on diverged
    weights."""
    from vcm_ts_tpu.codec.engine import _i16

    x = jnp.asarray([0.0, 1.9, -1.9, 40000.0, -40000.0,
                     np.inf, -np.inf, np.nan], jnp.float32)
    out = np.asarray(_i16(x))
    np.testing.assert_array_equal(
        out, np.asarray([0, 1, -1, 32767, -32768, 32767, -32768, 0],
                        np.int16))
    # bf16 inputs (the bf16-mode codec path) saturate identically
    out_b = np.asarray(_i16(x.astype(jnp.bfloat16)))
    np.testing.assert_array_equal(out_b[3:], out[3:])
