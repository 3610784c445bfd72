"""End-to-end VCM codec CLI drive: synthetic AVI -> encode (base layer with
real bitstreams, residuals) -> decode (fusion, metrics), detectors and
ffmpeg-dependent steps gated off. Uses reference-default model widths, so
this is the slowest test in the suite."""

import os
import subprocess
import sys

import numpy as np
import pytest

cv = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("vcmrun")
    # tiny synthetic video (MJPG avi works without ffmpeg)
    video = str(root / "in.avi")
    w = cv.VideoWriter(video, cv.VideoWriter_fourcc(*"MJPG"), 10, (128, 96))
    rng = np.random.default_rng(0)
    base = (rng.random((96, 128, 3)) * 255).astype(np.uint8)
    for t in range(2):
        w.write(np.roll(base, 3 * t, axis=1))
    w.release()

    # random-init native checkpoints for both models
    import jax
    import jax.numpy as jnp

    from vcm_ts_tpu.models.dmc import DMC, make_dpb
    from vcm_ts_tpu.models.intra import IntraNoAR
    from vcm_ts_tpu.train.checkpoint import CheckPointer

    ckpt_dir = root / "pretrained"
    os.makedirs(ckpt_dir)
    i_model = IntraNoAR()
    i_params = i_model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)), 1.0)
    CheckPointer(str(ckpt_dir)).save("image", i_params)
    p_model = DMC()
    x0 = jnp.zeros((1, 64, 64, 3))
    p_params = p_model.init(jax.random.PRNGKey(0), x0, make_dpb(x0),
                            1.0, 1.0, method="init_all")
    CheckPointer(str(ckpt_dir)).save("video", p_params)

    settings = root / "codec_settings.yaml"
    settings.write_text(f"""
BASE_LAYER:
  DCVC_HEM:
    I_FRAME_WEIGHTS: '{ckpt_dir}/image.ckpt'
    P_FRAME_WEIGHTS: '{ckpt_dir}/video.ckpt'
    GOP: 2
    RATE_COUNT: 4
    QUALITY: 1
    WRITE_STREAM: True
ENHANCEMENT_LAYER:
  DETECTORS:
    FACES:
      ENABLE: False
    LIPLATES:
      ENABLE: False
""")
    return root, video, settings


def test_video_coder_end_to_end(setup):
    root, video, settings = setup
    result_root = str(root / "out")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "video_coder.py"),
         "--video-path", video, "--settings-file", str(settings),
         "--result-root", result_root],
        capture_output=True, text=True, timeout=3000, env=env, cwd=REPO)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-2500:])

    # artifact layout parity with the reference pipeline
    assert len(os.listdir(os.path.join(
        result_root, "artifacts/source_frames"))) == 2
    assert len(os.listdir(os.path.join(
        result_root, "artifacts/dcvc_hem"))) == 2
    bins = os.listdir(os.path.join(result_root, "encoded/dcvc_hem_bins"))
    assert sorted(bins) == ["im00001.bin", "im00002.bin"]
    assert os.path.getsize(os.path.join(
        result_root, "encoded/dcvc_hem_bins", bins[0])) > 0
    assert len(os.listdir(os.path.join(
        result_root, "artifacts/result_frames"))) == 2
    assert os.path.exists(os.path.join(result_root, "info/quality.json"))
    assert os.path.exists(os.path.join(result_root,
                                       "info/bitrate_metrics.txt"))
    assert os.path.exists(os.path.join(result_root, "info/psnr_metrics.txt"))
    # with detectors off the fused result equals the base layer
    base = cv.imread(os.path.join(result_root, "artifacts/dcvc_hem",
                                  "im00001.png"))
    fused = cv.imread(os.path.join(result_root, "artifacts/result_frames",
                                   "im00001.png"))
    np.testing.assert_array_equal(base, fused)


def test_video_coder_learned_enhancement_layer(setup):
    """CLI dispatch for ENHANCEMENT_LAYER.CODEC='intra': the ffmpeg-free
    learned enhancement layer produces per-frame .bins + decoded residual
    frames, and the bitrate report counts them (detectors off -> all-zero
    residual content; this drives the dispatch + container round trip)."""
    root, video, settings = setup
    result_root = str(root / "out_learned")
    settings2 = root / "codec_settings_learned.yaml"
    settings2.write_text(settings.read_text() + """
  CODEC: 'intra'
  LEARNED:
    QUALITY: 0
    RATE_COUNT: 2
""")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "video_coder.py"),
         "--video-path", video, "--settings-file", str(settings2),
         "--result-root", result_root],
        capture_output=True, text=True, timeout=3000, env=env, cwd=REPO)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-2500:])

    bins = sorted(os.listdir(os.path.join(result_root,
                                          "encoded/enhancement_bins")))
    assert bins == ["im00001.bin", "im00002.bin"]
    assert all(os.path.getsize(os.path.join(
        result_root, "encoded/enhancement_bins", b)) > 0 for b in bins)
    decoded = os.listdir(os.path.join(result_root,
                                      "artifacts/residuals_h265"))
    assert len(decoded) == 2
    report = open(os.path.join(result_root,
                               "info/bitrate_metrics.txt")).read()
    enh_line = [ln for ln in report.splitlines()
                if "Encoded bpp [enhancement layer]" in ln][0]
    assert float(enh_line.split(":")[1]) > 0
