"""VCM codec pipeline: DCVC-HEM base layer + ROI enhancement layer.

TPU-native re-implementation of the reference video_coder.py building
blocks (video_coder.py:40-801): video<->frame conversion, base-layer
encode/decode via the TPU codec engines, ROI detection (pluggable detector
adapters; reference uses YOLOv8-LP + MTCNN), masked residual computation,
H.265 enhancement layer (ffmpeg subprocess), gradient-mask layer fusion on
decode, and bitrate/PSNR reporting.

External-tool policy: ffmpeg and the detector model zoos are optional host
dependencies — every entry point checks availability and raises an
actionable error; the ROI mask/residual/fusion math itself is dependency-
free numpy and fully tested.
"""

from __future__ import annotations

import json
import logging
import os
import pickle
import shutil
import time
from glob import glob
from subprocess import call

import numpy as np

from ..utils.video import get_video_length, get_video_resolution

_LOGGER_NAME = "CODEC"
PATHS_ARTIFACTS_SOURCE_FRAMES = "artifacts/source_frames"
PATHS_ARTIFACTS_DCVC_HEM = "artifacts/dcvc_hem"
PATHS_ARTIFACTS_RESIDUALS = "artifacts/residuals"
PATHS_ARTIFACTS_RESIDUALS_ENCODED = "artifacts/residuals_h265"
PATHS_ARTIFACTS_RESULT = "artifacts/result_frames"
PATHS_ARTIFACTS_SAME_BITRATE = "artifacts/same_bitrate"
PATHS_ENCODED_DIR = "encoded"
PATHS_DECODED_DIR = "decoded"
PATHS_INFO = "info"


def _require_ffmpeg():
    if shutil.which("ffmpeg") is None:
        raise RuntimeError(
            "ffmpeg (with libx265) is required for the H.265 enhancement "
            "layer but was not found on PATH")


# --------------------------------------------------------------------------
# frames <-> video
# --------------------------------------------------------------------------

def video_to_frames(video_path, result_root, subdir,
                    filename_template="im%05d.png") -> int:
    """(video_coder.py:40-77)"""
    import cv2 as cv

    logger = logging.getLogger(_LOGGER_NAME)
    cap = cv.VideoCapture(video_path)
    if not cap.isOpened():
        logger.error("Failed to open video file '%s'", video_path)
        return 0
    res_folder = os.path.join(result_root, subdir)
    shutil.rmtree(res_folder, ignore_errors=True)
    os.makedirs(res_folder, exist_ok=True)
    cnt = 0
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        cv.imwrite(os.path.join(res_folder, filename_template % (cnt + 1)),
                   frame)
        cnt += 1
    logger.info("Video splitting results in %d frames", cnt)
    return cnt


# --------------------------------------------------------------------------
# base layer (DCVC-HEM on TPU)
# --------------------------------------------------------------------------

def run_dcvc(video_codec, i_codec, args) -> None:
    """Per-frame GOP loop writing decoded PNGs + per-frame .bin streams
    (video_coder.py:80-155)."""
    import jax.numpy as jnp

    from ..models.dmc import make_dpb
    from . import bitstream as bs
    from .png_io import PNGReader, save_image

    logger = logging.getLogger(_LOGGER_NAME)
    frame_num = args["frame_num"]
    gop = args["gop"]
    write_stream = args.get("write_stream", False)
    src_reader = PNGReader(args["img_path"])

    out_dir = args["decoded_frame_folder"]
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    encoding_time = decoding_time = 0.0
    dpb = None
    is_first_p = True
    for frame_idx in range(frame_num):
        rgb = src_reader.read_one_frame()
        x = rgb[None]
        pic_height, pic_width = x.shape[1], x.shape[2]
        x_padded = jnp.asarray(bs.pad_image(x))
        bin_path = (os.path.join(args["bin_folder"],
                                 f"im{str(frame_idx + 1).zfill(5)}.bin")
                    if write_stream else None)

        if frame_idx % gop == 0:
            result = i_codec.encode_decode(
                x_padded, args["i_frame_q_scale"], bin_path,
                pic_height=pic_height, pic_width=pic_width)
            recon = jnp.clip(result["x_hat"], 0, 1)
            dpb = make_dpb(recon, video_codec.model.channel_N,
                           video_codec.model.channel_M)
            is_first_p = True
        else:
            result = video_codec.encode_decode(
                x_padded, dpb, bin_path,
                pic_height=pic_height, pic_width=pic_width,
                mv_y_q_scale=args["p_frame_mv_y_q_scale"],
                y_q_scale=args["p_frame_y_q_scale"], is_first_p=is_first_p)
            dpb = result["dpb"]
            dpb["ref_frame"] = jnp.clip(dpb["ref_frame"], 0, 1)
            recon = dpb["ref_frame"]
            is_first_p = False

        encoding_time += result.get("encoding_time", 0)
        decoding_time += result.get("decoding_time", 0)
        x_hat = np.asarray(recon)[:, :pic_height, :pic_width, :]
        save_image(x_hat, os.path.join(
            out_dir, f"im{str(frame_idx + 1).zfill(5)}.png"))

    logger.info("Average encoding time %.2f ms",
                encoding_time / frame_num * 1000)
    logger.info("Average decoding time %.2f ms",
                decoding_time / frame_num * 1000)


def encode_decode_dcvc(frames_dir, image_model_weights, video_model_weights,
                       anchor_num, gop, rate_count, quality, write_stream,
                       out_frames_dir, out_bins_dir) -> None:
    """Base-layer driver (video_coder.py:158-234): q-scale interpolation to
    rate_count points, model load, CDF-table update, GOP loop."""
    import jax
    import jax.numpy as jnp

    from ..models.dmc import DMC, make_dpb
    from ..utils.weight_import import (get_q_scales_from_ckpt,
                                       import_state_dict,
                                       load_torch_state_dict)
    from .engine import VideoCodec

    logger = logging.getLogger(_LOGGER_NAME)
    assert image_model_weights, "Invalid image model weights"
    assert video_model_weights, "Invalid video model weights"

    i_codec, i_scales = load_intra_codec(image_model_weights, rate_count,
                                         update=write_stream)

    p_model = DMC(anchor_num=anchor_num)
    x0 = jnp.zeros((1, 64, 64, 3))
    p_params = p_model.init(jax.random.PRNGKey(0), x0, make_dpb(x0),
                            1.0, 1.0, method="init_all")
    if video_model_weights.endswith(".pth"):
        p_params = import_state_dict(
            p_params, load_torch_state_dict(video_model_weights), strict="cover")
        y_q, mv_q = get_q_scales_from_ckpt(video_model_weights)
    else:
        from ..train.checkpoint import CheckPointer
        p_params, _, _ = CheckPointer().load(p_params, path=video_model_weights)
        y_q = np.asarray(p_params["params"]["y_q_scale"]).reshape(-1)
        mv_q = np.asarray(p_params["params"]["mv_y_q_scale"]).reshape(-1)

    y_scales = _q_ladder(y_q, rate_count)
    mv_scales = _q_ladder(mv_q, rate_count)

    video_codec = VideoCodec(p_model, p_params)
    if write_stream:
        video_codec.update(force=True)

    shutil.rmtree(out_frames_dir, ignore_errors=True)
    os.makedirs(out_frames_dir, exist_ok=True)
    shutil.rmtree(out_bins_dir, ignore_errors=True)
    os.makedirs(out_bins_dir, exist_ok=True)
    frame_num = len(glob(os.path.join(frames_dir, "*.png")))
    logger.info("Encoding/decoding with DCVC-HEM (TPU)")
    run_dcvc(video_codec, i_codec, dict(
        i_frame_q_scale=float(i_scales[quality]),
        p_frame_y_q_scale=float(y_scales[quality]),
        p_frame_mv_y_q_scale=float(mv_scales[quality]),
        gop=gop, frame_num=frame_num, write_stream=write_stream,
        bin_folder=out_bins_dir, img_path=frames_dir,
        decoded_frame_folder=out_frames_dir))


# --------------------------------------------------------------------------
# ROI detection (pluggable adapters)
# --------------------------------------------------------------------------

def detect_rois(root, kind, prob=0.8, padding=0, detector=None,
                filename_template="%05d") -> None:
    """Detect license plates ('liplates') or faces ('faces') on the source
    frames and pickle uint16 xyxy boxes per frame
    (video_coder.py:237-376). `detector` is a callable
    (rgb_uint8_hwc) -> (boxes_xyxy (N,4), scores (N,)); when None, the
    reference adapters (ultralytics YOLOv8-LP / facenet MTCNN) are built —
    raising an informative error if the packages are unavailable."""
    import cv2 as cv

    logger = logging.getLogger(_LOGGER_NAME)
    assert prob > 0.0 and padding >= 0
    if detector is None:
        detector = build_detector(kind)

    src_folder = os.path.join(root, PATHS_ARTIFACTS_SOURCE_FRAMES)
    files = sorted(glob(os.path.join(src_folder, "*.png")))
    res_folder = os.path.join(
        root, PATHS_ENCODED_DIR,
        "liplates_coords" if kind == "liplates" else "faces_coords")
    shutil.rmtree(res_folder, ignore_errors=True)
    os.makedirs(res_folder, exist_ok=True)

    logger.info("Detecting %s", kind)
    for i, path in enumerate(files):
        frame = cv.cvtColor(cv.imread(path), cv.COLOR_BGR2RGB)
        h, w, _ = frame.shape
        boxes, scores = detector(frame)
        coords = []
        for box, score in zip(np.asarray(boxes).reshape(-1, 4),
                              np.asarray(scores).reshape(-1)):
            if score < prob:
                continue
            x1, y1, x2, y2 = box
            coords.append([
                max(min(int(x1 - padding), w), 0),
                max(min(int(y1 - padding), h), 0),
                max(min(int(x2 + padding), w), 0),
                max(min(int(y2 + padding), h), 0),
            ])
        # match reference layout: [x1, y1, x2, y2]
        coords = [[c[0], c[1], c[2], c[3]] for c in coords]
        with open(os.path.join(res_folder, filename_template % (i + 1)),
                  "wb") as f:
            pickle.dump(np.array(coords, dtype=np.uint16), f)
    logger.info("%s coordinates saved to '%s'", kind, res_folder)


def build_detector(kind: str):
    if kind == "liplates":
        # preferred: the framework's own native detector (TPU inference, no
        # torch zoo) on weights exported once by tools/export_yolo_detector
        native = "pretrained/yolov8-lp.npz"
        if os.path.exists(native):
            from ..eval.yolo_native import build_lp_adapter
            return build_lp_adapter(native)
        try:
            from ultralytics import YOLO
        except ImportError as e:
            raise RuntimeError(
                "license-plate detection needs pretrained/yolov8-lp.npz "
                "(export once with tools/export_yolo_detector.py) or the "
                "'ultralytics' package + pretrained/yolov8-lp.pt") from e

        model = YOLO("pretrained/yolov8-lp.pt")

        def det(frame):
            preds = model(frame, verbose=False)[0]
            return (preds.boxes.xyxy.cpu().numpy(),
                    preds.boxes.conf.cpu().numpy())

        return det
    if kind == "faces":
        # preferred: the framework's native MTCNN cascade (TPU inference)
        # on weights exported once by tools/export_mtcnn.py
        native = "pretrained/mtcnn.npz"
        if os.path.exists(native):
            from ..eval.mtcnn_native import build_face_adapter
            return build_face_adapter(native)
        try:
            from facenet_pytorch import MTCNN
        except ImportError as e:
            raise RuntimeError(
                "face detection needs pretrained/mtcnn.npz (export once "
                "with tools/export_mtcnn.py) or the 'facenet_pytorch' "
                "package") from e

        model = MTCNN(device="cpu")
        model.eval()

        def det(frame):
            boxes, probs = model.detect(frame, landmarks=False)
            if boxes is None:
                return np.zeros((0, 4)), np.zeros((0,))
            return boxes, probs

        return det
    raise ValueError(f"unknown detector kind: {kind}")


# --------------------------------------------------------------------------
# enhancement layer: residuals, H.265, fusion
# --------------------------------------------------------------------------

def _load_coords(root, kind, count):
    folder = os.path.join(root, PATHS_ENCODED_DIR, f"{kind}_coords")
    files = sorted(glob(os.path.join(folder, "*")))
    assert len(files) == count, (folder, len(files), count)
    out = []
    for f in files:
        with open(f, "rb") as fh:
            out.append(pickle.load(fh))
    return out


def compute_residuals(root, use_liplates, use_faces, out_residuals_dir,
                      filename_template="im%05d.png") -> None:
    """(source - decoded + 128) masked by ROI boxes (video_coder.py:379-457)."""
    import cv2 as cv

    logger = logging.getLogger(_LOGGER_NAME)
    source = sorted(glob(os.path.join(root, PATHS_ARTIFACTS_SOURCE_FRAMES,
                                      "*.png")))
    encoded = sorted(glob(os.path.join(root, PATHS_ARTIFACTS_DCVC_HEM,
                                       "*.png")))
    lp = _load_coords(root, "liplates", len(source)) if use_liplates else None
    fc = _load_coords(root, "faces", len(source)) if use_faces else None

    shutil.rmtree(out_residuals_dir, ignore_errors=True)
    os.makedirs(out_residuals_dir, exist_ok=True)
    logger.info("Compute residuals")
    for i, (s_path, e_path) in enumerate(zip(source, encoded)):
        s = cv.imread(s_path).astype(np.float32)
        e = cv.imread(e_path).astype(np.float32)
        h, w, _ = s.shape
        residual = np.clip(s - e + 128, 0.0, 255.0)
        mask = np.zeros((h, w, 1), np.float32)
        for boxes in ((lp[i] if lp is not None else []),
                      (fc[i] if fc is not None else [])):
            for x1, y1, x2, y2 in np.asarray(boxes).reshape(-1, 4):
                mask[y1:y2, x1:x2] = 1.0
        out = (residual * mask).astype(np.uint8)
        cv.imwrite(os.path.join(out_residuals_dir,
                                filename_template % (i + 1)), out)
    logger.info("Residuals saved to '%s'", out_residuals_dir)


def encode_folder_crf(src_files, out_path, crf, preset="ultrafast",
                      pix_fmt="gbrp"):
    _require_ffmpeg()
    call(["ffmpeg", "-i", src_files, "-pix_fmt", pix_fmt, "-c:v", "libx265",
          "-preset", preset, "-crf", str(crf), "-y", out_path])
    return out_path


def encode_folder_bitrate(src_files, out_path, bitrate, preset="ultrafast",
                          pix_fmt="gbrp"):
    _require_ffmpeg()
    call(["ffmpeg", "-i", src_files, "-pix_fmt", pix_fmt, "-c:v", "libx265",
          "-preset", preset, "-b:v", f"{bitrate}k", "-y", out_path])
    return out_path


def encode_frames(src_root, video_path, crf, preset="medium", pix_fmt="gbrp",
                  save_to_frames=True, frames_path="",
                  filename_template="im%05d.png") -> None:
    """(video_coder.py:488-519)"""
    logger = logging.getLogger(_LOGGER_NAME)
    src_files = os.path.join(src_root, filename_template)
    os.makedirs(os.path.dirname(video_path), exist_ok=True)
    logger.info("Encoding '%s' frames to '%s'", src_files, video_path)
    encode_folder_crf(src_files, video_path, crf=crf, preset=preset,
                      pix_fmt=pix_fmt)
    if save_to_frames:
        shutil.rmtree(frames_path, ignore_errors=True)
        os.makedirs(frames_path, exist_ok=True)
        video_to_frames(video_path, frames_path, "", filename_template)


def _q_ladder(q, rate_count):
    """q-scale rate ladder. Untrained/constant q_scales (e.g. fresh
    checkpoints) cannot be log-interpolated; fall back to a constant
    ladder."""
    from ..utils.common import interpolate_log

    q = np.asarray(q).reshape(-1)
    if q[0] <= q[-1]:
        return np.full(rate_count, float(q[0]))
    return interpolate_log(q[-1], q[0], rate_count)


def load_intra_codec(image_model_weights, rate_count=6, update=True):
    """Build an IntraCodec + its q-scale rate ladder.

    Accepts reference .pth, framework checkpoints, or None/"" (random init —
    for smoke tests). Shared by the base-layer driver
    (encode_decode_dcvc) and the learned enhancement layer. `update`
    builds the CDF coding tables (needed for real bitstreams)."""
    import jax
    import jax.numpy as jnp

    from ..models.intra import IntraNoAR
    from ..utils.weight_import import (get_i_frame_q_scales_from_ckpt,
                                       import_state_dict,
                                       load_torch_state_dict)
    from .engine import IntraCodec

    i_model = IntraNoAR()
    i_params = i_model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)), 1.0)
    if image_model_weights and image_model_weights.endswith(".pth"):
        i_params = import_state_dict(
            i_params, load_torch_state_dict(image_model_weights),
            strict="cover")
        i_q = get_i_frame_q_scales_from_ckpt(image_model_weights)
    elif image_model_weights:
        from ..train.checkpoint import CheckPointer
        i_params, _, _ = CheckPointer().load(i_params,
                                             path=image_model_weights)
        i_q = np.asarray(i_params["params"]["q_scale"]).reshape(-1)
    else:
        i_q = np.asarray(i_params["params"]["q_scale"]).reshape(-1)
    codec = IntraCodec(i_model, i_params)
    if update:
        codec.update(force=True)
    return codec, _q_ladder(i_q, rate_count)


def encode_residuals_learned(root, image_model_weights, quality,
                             out_frames_dir, rate_count=6,
                             filename_template="im%05d.png") -> None:
    """TPU-native enhancement layer: the masked-residual frames go through
    the framework's own learned IntraCodec instead of ffmpeg/x265 — one
    container .bin per frame under encoded/enhancement_bins, decoded
    residuals written to `out_frames_dir` for fuse_layers (drop-in for the
    reference's H.265 path, video_coder.py:488-519, with zero external
    binaries; enabled by ENHANCEMENT_LAYER.CODEC="intra")."""
    import cv2 as cv
    import jax.numpy as jnp

    from . import bitstream as bs

    logger = logging.getLogger(_LOGGER_NAME)
    codec, scales = load_intra_codec(image_model_weights, rate_count)
    q_scale = float(scales[quality])

    residuals = sorted(glob(os.path.join(root, PATHS_ARTIFACTS_RESIDUALS,
                                         "*.png")))
    bins_dir = os.path.join(root, PATHS_ENCODED_DIR, "enhancement_bins")
    shutil.rmtree(bins_dir, ignore_errors=True)
    os.makedirs(bins_dir, exist_ok=True)
    shutil.rmtree(out_frames_dir, ignore_errors=True)
    os.makedirs(out_frames_dir, exist_ok=True)
    # a result_root previously encoded with CODEC='h265' may hold a stale
    # enhancement_layer.h265 — size accounting prefers it, so remove it
    stale = os.path.join(root, PATHS_ENCODED_DIR, "enhancement_layer.h265")
    if os.path.exists(stale):
        os.remove(stale)

    logger.info("Encoding %d residual frames with the learned intra codec "
                "(q_scale=%.4f)", len(residuals), q_scale)
    t0, total_bits = time.time(), 0
    for i, path in enumerate(residuals):
        res = cv.imread(path).astype(np.float32) / 255.0
        h, w, _ = res.shape
        x = jnp.asarray(bs.pad_image(res[None]))
        bin_name = os.path.splitext(filename_template % (i + 1))[0] + ".bin"
        out = codec.encode_decode(
            x, q_scale, output_path=os.path.join(bins_dir, bin_name),
            pic_height=h, pic_width=w)
        total_bits += out["bit"]
        recon = np.asarray(out["x_hat"])[0, :h, :w, :]
        cv.imwrite(os.path.join(out_frames_dir, filename_template % (i + 1)),
                   (np.clip(recon, 0, 1) * 255).round().astype(np.uint8))
    logger.info("Learned enhancement layer: %d bits total, %.2f s",
                int(total_bits), time.time() - t0)


def _enhancement_layer_bits(root) -> int:
    """Size of whichever enhancement layer exists: the H.265 file or the
    learned per-frame .bin directory (0 when neither was produced)."""
    h265 = os.path.join(root, PATHS_ENCODED_DIR, "enhancement_layer.h265")
    if os.path.exists(h265):
        return 8 * os.path.getsize(h265)
    bins = os.path.join(root, PATHS_ENCODED_DIR, "enhancement_bins")
    if os.path.isdir(bins):
        return 8 * get_dir_size(bins)
    return 0


def create_gradient_mask(w, h, border_size: int):
    """Soft ROI border ramp (video_coder.py:522-530)."""
    if border_size > 0:
        mask = np.zeros((h, w, 1), np.float32)
        for i, x in enumerate(np.linspace(0.9, 0.0, border_size)):
            mask[i:h - i, i:w - i, :] = 1 - x
    else:
        mask = np.ones((h, w, 1), np.float32)
    return mask


def fuse_layers(root, faces_enable=True, liplates_enable=True,
                faces_padding=0, liplates_padding=0,
                filename_template="im%05d.png") -> None:
    """decoded_base + gradient-masked residual (video_coder.py:533-613)."""
    import cv2 as cv

    logger = logging.getLogger(_LOGGER_NAME)
    base = sorted(glob(os.path.join(root, PATHS_ARTIFACTS_DCVC_HEM, "*.png")))
    enh = sorted(glob(os.path.join(root, PATHS_ARTIFACTS_RESIDUALS_ENCODED,
                                   "*.png")))
    if not enh:  # fall back to the raw residuals (lossless enhancement)
        enh = sorted(glob(os.path.join(root, PATHS_ARTIFACTS_RESIDUALS,
                                       "*.png")))
    lp = _load_coords(root, "liplates", len(base)) if liplates_enable else None
    fc = _load_coords(root, "faces", len(base)) if faces_enable else None

    res_folder = os.path.join(root, PATHS_ARTIFACTS_RESULT)
    shutil.rmtree(res_folder, ignore_errors=True)
    os.makedirs(res_folder, exist_ok=True)
    logger.info("Creating result frames")
    for i, (b_path, e_path) in enumerate(zip(base, enh)):
        b = cv.imread(b_path).astype(np.float32)
        e = cv.imread(e_path).astype(np.float32) - 128
        h, w, _ = b.shape
        mask = np.zeros((h, w, 1), np.float32)
        if lp is not None:
            for x1, y1, x2, y2 in np.asarray(lp[i]).reshape(-1, 4):
                mask[y1:y2, x1:x2] = create_gradient_mask(
                    w=x2 - x1, h=y2 - y1, border_size=liplates_padding)
        if fc is not None:
            for x1, y1, x2, y2 in np.asarray(fc[i]).reshape(-1, 4):
                mask[y1:y2, x1:x2] = create_gradient_mask(
                    w=x2 - x1, h=y2 - y1, border_size=faces_padding)
        out = np.clip(b + mask * e, 0, 255).astype(np.uint8)
        cv.imwrite(os.path.join(res_folder, filename_template % (i + 1)), out)
    logger.info("Created %d result frames", len(base))


def encode_same_bitrate(root, source_video_path, out_video_path,
                        preset="medium", pix_fmt="gbrp", save_to_frames=True,
                        frames_path="", filename_template="im%05d.png"):
    """Bitrate-matched H.265 comparison encode (video_coder.py:616-653)."""
    import cv2 as cv

    cap = cv.VideoCapture(source_video_path)
    fps = cap.get(cv.CAP_PROP_FPS)
    frame_count = int(cap.get(cv.CAP_PROP_FRAME_COUNT))
    duration = frame_count / fps

    enh = _enhancement_layer_bits(root)
    base = 8 * get_dir_size(os.path.join(root, PATHS_ENCODED_DIR,
                                         "dcvc_hem_bins"))
    bitrate = int((enh + base) / duration / 1000)

    src_files = os.path.join(root, PATHS_ARTIFACTS_RESULT, filename_template)
    encode_folder_bitrate(src_files, out_video_path, bitrate=bitrate,
                          preset=preset, pix_fmt=pix_fmt)
    if save_to_frames:
        shutil.rmtree(frames_path, ignore_errors=True)
        os.makedirs(frames_path, exist_ok=True)
        video_to_frames(out_video_path, frames_path, "", filename_template)


def get_dir_size(start_path: str = ".") -> int:
    total = 0
    for dirpath, _, filenames in os.walk(start_path):
        for f in filenames:
            fp = os.path.join(dirpath, f)
            if not os.path.islink(fp):
                total += os.path.getsize(fp)
    return total


# --------------------------------------------------------------------------
# metrics
# --------------------------------------------------------------------------

def calc_bitrate_metrics(root, video_path, gop) -> dict:
    """(video_coder.py:667-711)"""
    logger = logging.getLogger(_LOGGER_NAME)
    frames_num = get_video_length(video_path)
    frame_w, frame_h = get_video_resolution(video_path)
    total_pixels = frames_num * frame_w * frame_h
    assert total_pixels > 0

    src_size = 8 * os.path.getsize(video_path)
    enh_size = _enhancement_layer_bits(root)
    base_size = 8 * get_dir_size(
        os.path.join(root, PATHS_ENCODED_DIR, "dcvc_hem_bins"))
    encoded_size = enh_size + base_size

    src_bpp = src_size / total_pixels
    encoded_bpp = encoded_size / total_pixels

    os.makedirs(os.path.join(root, PATHS_INFO), exist_ok=True)
    metrics_file = os.path.join(root, PATHS_INFO, "bitrate_metrics.txt")
    with open(metrics_file, "w") as f:
        f.write(f"Results for: {video_path}\n")
        f.write(f"Source kB: {src_size / 8 / 1024}\n")
        f.write(f"Encoded kB: {encoded_size / 8 / 1024}\n")
        f.write(f"Source bpp: {src_bpp}\n")
        f.write(f"Encoded bpp [total]: {encoded_bpp}\n")
        f.write(f"Encoded bpp [enhancement layer]: "
                f"{enh_size / total_pixels}\n")
        f.write(f"Encoded bpp [base layer]: {base_size / total_pixels}\n")
        f.write(f"Recompression ratio [total]: {src_bpp / max(encoded_bpp, 1e-12)}\n")
        f.write(f"Recompression ratio [enhancement layer]: "
                f"{src_bpp / max(enh_size / total_pixels, 1e-12)}\n")
        f.write(f"Recompression ratio [base layer]: "
                f"{src_bpp / max(base_size / total_pixels, 1e-12)}\n")
    logger.info("Saved bitrate metrics to %s", metrics_file)

    log_result = {"gop": gop, "avg_bpp": encoded_bpp}
    with open(os.path.join(root, PATHS_INFO, "quality.json"), "w") as fp:
        json.dump(log_result, fp)
    return log_result


def calc_visual_metrics(root, video_path, liplates_padding=0,
                        faces_padding=0) -> dict:
    """Total / base / ROI / same-bitrate PSNR (video_coder.py:714-801)."""
    import cv2 as cv

    logger = logging.getLogger(_LOGGER_NAME)
    source = sorted(glob(os.path.join(root, PATHS_ARTIFACTS_SOURCE_FRAMES,
                                      "*.png")))
    result = sorted(glob(os.path.join(root, PATHS_ARTIFACTS_RESULT, "*.png")))
    same_bitrate = sorted(glob(os.path.join(root, PATHS_ARTIFACTS_SAME_BITRATE,
                                            "*.png")))
    lp_files = sorted(glob(os.path.join(root, PATHS_ENCODED_DIR,
                                        "liplates_coords", "*")))
    fc_files = sorted(glob(os.path.join(root, PATHS_ENCODED_DIR,
                                        "faces_coords", "*")))

    psnrs, psnrs_base, psnrs_enh, psnrs_sb = [], [], [], []
    for idx in range(len(source)):
        hr = cv.imread(source[idx]).astype(np.float32) / 255.0
        res = cv.imread(result[idx]).astype(np.float32) / 255.0
        h, w, _ = hr.shape
        mask = np.zeros((h, w, 1), np.float32)
        if len(lp_files) == len(source):
            with open(lp_files[idx], "rb") as f:
                for x1, y1, x2, y2 in pickle.load(f).reshape(-1, 4):
                    mask[y1 + liplates_padding:y2 - liplates_padding,
                         x1 + liplates_padding:x2 - liplates_padding] = 1.0
        if len(fc_files) == len(source):
            with open(fc_files[idx], "rb") as f:
                for x1, y1, x2, y2 in pickle.load(f).reshape(-1, 4):
                    mask[y1 + faces_padding:y2 - faces_padding,
                         x1 + faces_padding:x2 - faces_padding] = 1.0

        mask_nonzeros = np.count_nonzero(mask)
        mask_zeros = hr.size - mask_nonzeros
        mse = (hr - res) ** 2
        psnrs.append(10 * np.log10(1.0 / max(np.mean(mse), 1e-12)))
        if mask_zeros > 0:
            psnrs_base.append(10 * np.log10(
                1.0 / max(np.sum(mse * (1 - mask)) / mask_zeros, 1e-12)))
        if mask_nonzeros > 0:
            psnrs_enh.append(10 * np.log10(
                1.0 / max(np.sum(mse * mask) / mask_nonzeros, 1e-12)))
        if len(same_bitrate) == len(source):
            sb = cv.imread(same_bitrate[idx]).astype(np.float32) / 255.0
            psnrs_sb.append(10 * np.log10(
                1.0 / max(np.mean((hr - sb) ** 2), 1e-12)))

    os.makedirs(os.path.join(root, PATHS_INFO), exist_ok=True)
    metrics_file = os.path.join(root, PATHS_INFO, "psnr_metrics.txt")
    out = {
        "total_psnr": float(np.mean(psnrs)) if psnrs else 0.0,
        "base_psnr": float(np.mean(psnrs_base)) if psnrs_base else 0.0,
        "roi_psnr": float(np.mean(psnrs_enh)) if psnrs_enh else 0.0,
        "same_bitrate_psnr": float(np.mean(psnrs_sb)) if psnrs_sb else 0.0,
    }
    with open(metrics_file, "w") as f:
        f.write(f"Results for: {video_path}\n")
        f.write(f"Total PSNR [RGB format]: {out['total_psnr']}\n")
        f.write(f"DCVC-HEM PSNR [RGB format]: {out['base_psnr']}\n")
        f.write(f"Enhancement layer PSNR [RGB format]: {out['roi_psnr']}\n")
        f.write(f"H265 encoded with same bitrate as total PSNR [RGB format]: "
                f"{out['same_bitrate_psnr']}\n")
    logger.info("Saved PSNR metrics to %s", metrics_file)
    return out
