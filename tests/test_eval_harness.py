"""End-to-end eval-harness test: test_video.run_test over a tiny synthetic
PNG sequence with small models — exercises the GOP I/P loop, padding,
PSNR/MS-SSIM metrics, bitstream writing, and the log JSON schema."""

import importlib.util
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_cli(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def tiny_codecs():
    from vcm_ts_tpu.codec.engine import IntraCodec, VideoCodec
    from vcm_ts_tpu.models.dmc import DMC, make_dpb
    from vcm_ts_tpu.models.intra import IntraNoAR

    i_model = IntraNoAR(N=32)
    i_params = i_model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)), 1.0)
    i_codec = IntraCodec(i_model, i_params)

    p_model = DMC(anchor_num=4, channel_mv=16, channel_N=16, channel_M=24)
    x0 = jnp.zeros((1, 64, 64, 3))
    p_params = p_model.init(jax.random.PRNGKey(0), x0, make_dpb(x0, 16, 24),
                            1.0, 1.0, method="init_all")
    video_codec = VideoCodec(p_model, p_params)
    i_codec.update()
    video_codec.update()
    return i_codec, video_codec


@pytest.fixture(scope="module")
def png_sequence(tmp_path_factory):
    d = tmp_path_factory.mktemp("seq")
    rng = np.random.default_rng(0)
    base = (rng.random((60, 60, 3)) * 255).astype(np.uint8)
    for t in range(4):
        Image.fromarray(np.roll(base, t * 2, axis=1)).save(
            d / f"im{t + 1}.png")
    return str(d)


def test_run_test_gop_loop_and_log_schema(tmp_path, tiny_codecs, png_sequence):
    tv = _load_cli("test_video")
    i_codec, video_codec = tiny_codecs
    task = {
        "frame_num": 4,
        "gop_size": 2,
        "img_path": png_sequence,
        "i_frame_q_scale": 1.0,
        "p_frame_y_q_scale": 1.0,
        "p_frame_mv_y_q_scale": 1.0,
        "write_stream": True,
        "bin_folder": str(tmp_path),
        "save_decoded_frame": False,
    }
    log = tv.run_test(video_codec, i_codec, task)

    assert log["i_frame_num"] == 2 and log["p_frame_num"] == 2
    assert log["frame_type"] == [0, 1, 0, 1]
    assert len(log["frame_psnr"]) == 4
    assert len(log["frame_msssim"]) == 4
    assert all(b > 0 for b in log["frame_bpp"])
    assert log["frame_pixel_num"] == 60 * 60
    assert np.isfinite(log["ave_all_frame_psnr"])
    # real bitstreams were written per frame
    assert sorted(os.listdir(tmp_path)) == [f"{i}.bin" for i in range(4)]
    # JSON-serializable (dump_json path)
    json.dumps(log)


def test_run_test_entropy_estimated_mode(tiny_codecs, png_sequence):
    tv = _load_cli("test_video")
    i_codec, video_codec = tiny_codecs
    task = {
        "frame_num": 3,
        "gop_size": 3,
        "img_path": png_sequence,
        "i_frame_q_scale": 1.0,
        "p_frame_y_q_scale": 1.0,
        "p_frame_mv_y_q_scale": 1.0,
        "write_stream": False,
    }
    log = tv.run_test(video_codec, i_codec, task)
    assert log["i_frame_num"] == 1 and log["p_frame_num"] == 2


def test_batched_rates_matches_sequential(tmp_path, tiny_codecs,
                                          png_sequence):
    """run_test_batched over 2 rate points must produce per-rate logs
    matching two sequential run_test calls — written bitstreams included."""
    tv = _load_cli("test_video")
    i_codec, video_codec = tiny_codecs

    def mk_task(rate_idx, q, sub):
        d = str(tmp_path / f"{sub}_{rate_idx}")
        os.makedirs(d, exist_ok=True)
        return {
            "rate_idx": rate_idx,
            "frame_num": 4,
            "gop_size": 2,
            "img_path": png_sequence,
            "i_frame_q_scale": q,
            "p_frame_y_q_scale": q,
            "p_frame_mv_y_q_scale": q,
            "write_stream": True,
            "bin_folder": d,
            "save_decoded_frame": False,
        }

    seq_tasks = [mk_task(r, q, "seq") for r, q in enumerate((0.7, 1.3))]
    bat_tasks = [mk_task(r, q, "bat") for r, q in enumerate((0.7, 1.3))]

    seq_logs = [tv.run_test(video_codec, i_codec, t) for t in seq_tasks]
    bat_logs = tv.run_test_batched(video_codec, i_codec, bat_tasks)

    # Each mode is self-consistent (batched encode pairs with batched
    # decode); across modes the reconstructions drift by batched-vs-single
    # XLA reassociation, which can flip a quantizer rounding on CHAINED
    # frames — so the contract is metric-level equivalence, not byte
    # equality (engine-level bit-identity of decompress_batch vs sequential
    # decode of the same streams is covered in test_dmc_codec).
    for r in range(2):
        assert bat_logs[r]["frame_type"] == seq_logs[r]["frame_type"]
        # bin files exist per frame and rate
        assert sorted(os.listdir(bat_tasks[r]["bin_folder"])) == \
            [f"{f}.bin" for f in range(4)]
        np.testing.assert_allclose(bat_logs[r]["frame_bpp"],
                                   seq_logs[r]["frame_bpp"], rtol=2e-2)
        np.testing.assert_allclose(bat_logs[r]["frame_psnr"],
                                   seq_logs[r]["frame_psnr"], atol=0.1)


def test_batched_rates_entropy_estimated(tiny_codecs, png_sequence):
    tv = _load_cli("test_video")
    i_codec, video_codec = tiny_codecs
    tasks = [{
        "rate_idx": r,
        "frame_num": 3,
        "gop_size": 3,
        "img_path": png_sequence,
        "i_frame_q_scale": q,
        "p_frame_y_q_scale": q,
        "p_frame_mv_y_q_scale": q,
        "write_stream": False,
    } for r, q in enumerate((0.7, 1.3))]
    single = [tv.run_test(video_codec, i_codec, t) for t in tasks]
    batched = tv.run_test_batched(video_codec, i_codec, tasks)
    for r in range(2):
        assert batched[r]["frame_type"] == single[r]["frame_type"]
        np.testing.assert_allclose(batched[r]["frame_bpp"],
                                   single[r]["frame_bpp"], rtol=2e-3)
        np.testing.assert_allclose(batched[r]["frame_psnr"],
                                   single[r]["frame_psnr"], atol=0.1)


def test_fleet_mesh_size():
    """--fleet mesh sizing must follow the actual per-group row counts,
    including multi-host striding leaving fewer rows than rate_num."""
    import test_video as tv

    def mk(ds, seq, n):
        return [{"ds_name": ds, "video_path": seq}] * n

    # single host: 2 sequences x 4 rate rows, 8 local devices -> 4-wide
    tasks = mk("A", "s1", 4) + mk("A", "s2", 4)
    assert tv.fleet_mesh_size(tasks, 8) == (4, 4)
    # 2-process stride of the same sweep: 2 rows per group on this rank
    assert tv.fleet_mesh_size(mk("A", "s1", 2) + mk("A", "s2", 2), 8) \
        == (2, 2)
    # ragged groups: gcd(4, 2) = 2
    assert tv.fleet_mesh_size(mk("A", "s1", 4) + mk("A", "s2", 2), 8) \
        == (2, 2)
    # rows share no factor with devices -> disabled (1)
    assert tv.fleet_mesh_size(mk("A", "s1", 3), 8) == (3, 1)
    # no tasks on this rank -> disabled
    assert tv.fleet_mesh_size([], 8) == (0, 1)


def test_batched_rates_fleet_sharded(tmp_path, tiny_codecs, png_sequence):
    """--fleet mode: run_test_batched with the codecs' batch axis sharded
    over a 2-device mesh produces per-rate logs equivalent to the
    sequential runs (the fleet's per-device batch-1 programs reproduce
    single-stream compute; see tests/test_fleet_serving.py for the
    engine-level byte-identity contract)."""
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    tv = _load_cli("test_video")
    i_codec, video_codec = tiny_codecs

    def mk_task(rate_idx, q, sub):
        d = str(tmp_path / f"{sub}_{rate_idx}")
        os.makedirs(d, exist_ok=True)
        return {
            "rate_idx": rate_idx,
            "frame_num": 4,
            "gop_size": 2,
            "img_path": png_sequence,
            "i_frame_q_scale": q,
            "p_frame_y_q_scale": q,
            "p_frame_mv_y_q_scale": q,
            "write_stream": True,
            "bin_folder": d,
            "save_decoded_frame": False,
        }

    seq_tasks = [mk_task(r, q, "fseq") for r, q in enumerate((0.7, 1.3))]
    seq_logs = [tv.run_test(video_codec, i_codec, t) for t in seq_tasks]

    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    for c in (i_codec, video_codec):
        c.set_fleet_sharding(mesh)
    try:
        fleet_tasks = [mk_task(r, q, "fleet")
                       for r, q in enumerate((0.7, 1.3))]
        fleet_logs = tv.run_test_batched(video_codec, i_codec, fleet_tasks)
    finally:
        for c in (i_codec, video_codec):
            c._batch_sharding = None

    for r in range(2):
        assert fleet_logs[r]["frame_type"] == seq_logs[r]["frame_type"]
        assert sorted(os.listdir(fleet_tasks[r]["bin_folder"])) == \
            [f"{f}.bin" for f in range(4)]
        np.testing.assert_allclose(fleet_logs[r]["frame_bpp"],
                                   seq_logs[r]["frame_bpp"], rtol=2e-2)
        np.testing.assert_allclose(fleet_logs[r]["frame_psnr"],
                                   seq_logs[r]["frame_psnr"], atol=0.1)
