"""VCM codec CLI — Video Coding for Machines for Traffic Scenes.

TPU-native equivalent of the reference video_coder.py:808-916: the full
encode/decode pipeline (DCVC-HEM base layer on TPU + ROI enhancement layer
via ffmpeg/x265) with the same settings tree, artifact layout, and metric
reports. See vcm_ts_tpu/codec/vcm_pipeline.py for the building blocks.
"""

from __future__ import annotations

import argparse
import os
import shutil

from vcm_ts_tpu.codec import vcm_pipeline as vp
from vcm_ts_tpu.train.config import default_codec_settings
from vcm_ts_tpu.utils.common import str2bool
from vcm_ts_tpu.utils.logger import setup_logger


def main():
    from vcm_ts_tpu.utils.common import enable_compilation_cache
    enable_compilation_cache()  # tunnel compiles are slow+variable;
    # the persistent cache reuses bench/eval stage binaries across runs
    parser = argparse.ArgumentParser(
        description="Video Coding for Machines for Traffic Scenes (TPU)")
    parser.add_argument("--video-path", dest="video_path", type=str,
                        required=True, help="Path to video to recompress")
    parser.add_argument("--settings-file", dest="settings_file", type=str,
                        default="configs/codec_settings.yaml", metavar="FILE")
    parser.add_argument("--result-root", dest="result_root", type=str,
                        required=True)
    parser.add_argument("--do-encode", dest="do_encode", type=str2bool,
                        default=True)
    parser.add_argument("--do-decode", dest="do_decode", type=str2bool,
                        default=True)
    args = parser.parse_args()

    logger = setup_logger("CODEC", 0)
    logger.info(args)

    codec_settings = default_codec_settings()
    if args.settings_file and os.path.exists(args.settings_file):
        codec_settings.merge_from_file(args.settings_file)
    codec_settings.freeze()

    os.makedirs(os.path.join(args.result_root, vp.PATHS_INFO), exist_ok=True)
    with open(os.path.join(args.result_root, vp.PATHS_INFO,
                           "codec_settings.yaml"), "w") as f:
        f.write(str(codec_settings))

    dets = codec_settings.ENHANCEMENT_LAYER.DETECTORS

    if args.do_encode:
        vp.video_to_frames(args.video_path, args.result_root,
                           vp.PATHS_ARTIFACTS_SOURCE_FRAMES)

        bl = codec_settings.BASE_LAYER.DCVC_HEM
        vp.encode_decode_dcvc(
            frames_dir=os.path.join(args.result_root,
                                    vp.PATHS_ARTIFACTS_SOURCE_FRAMES),
            image_model_weights=bl.I_FRAME_WEIGHTS,
            video_model_weights=bl.P_FRAME_WEIGHTS,
            anchor_num=bl.ANCHOR_NUM, gop=bl.GOP,
            rate_count=bl.RATE_COUNT, quality=bl.QUALITY,
            write_stream=bl.WRITE_STREAM,
            out_frames_dir=os.path.join(args.result_root,
                                        vp.PATHS_ARTIFACTS_DCVC_HEM),
            out_bins_dir=os.path.join(args.result_root, vp.PATHS_ENCODED_DIR,
                                      "dcvc_hem_bins"))

        if dets.LIPLATES.ENABLE:
            vp.detect_rois(args.result_root, "liplates",
                           prob=dets.LIPLATES.PROB,
                           padding=dets.LIPLATES.PADDING)
        if dets.FACES.ENABLE:
            vp.detect_rois(args.result_root, "faces", prob=dets.FACES.PROB,
                           padding=dets.FACES.PADDING)

        vp.compute_residuals(
            args.result_root, use_liplates=dets.LIPLATES.ENABLE,
            use_faces=dets.FACES.ENABLE,
            out_residuals_dir=os.path.join(args.result_root,
                                           vp.PATHS_ARTIFACTS_RESIDUALS))

        enh_codec = codec_settings.ENHANCEMENT_LAYER.CODEC
        if enh_codec not in ("h265", "intra"):
            raise ValueError(
                f"ENHANCEMENT_LAYER.CODEC must be 'h265' or 'intra', got "
                f"{enh_codec!r}")
        have_ffmpeg = shutil.which("ffmpeg") is not None
        if enh_codec == "intra":
            learned = codec_settings.ENHANCEMENT_LAYER.LEARNED
            vp.encode_residuals_learned(
                args.result_root,
                image_model_weights=(
                    learned.I_FRAME_WEIGHTS
                    or codec_settings.BASE_LAYER.DCVC_HEM.I_FRAME_WEIGHTS),
                quality=learned.QUALITY, rate_count=learned.RATE_COUNT,
                out_frames_dir=os.path.join(
                    args.result_root, vp.PATHS_ARTIFACTS_RESIDUALS_ENCODED))
        elif have_ffmpeg:
            # drop any stale learned-layer bins from a previous CODEC=intra
            # run so the size accounting counts this run's layer only
            shutil.rmtree(os.path.join(args.result_root, vp.PATHS_ENCODED_DIR,
                                       "enhancement_bins"),
                          ignore_errors=True)
            h265 = codec_settings.ENHANCEMENT_LAYER.H265
            vp.encode_frames(
                src_root=os.path.join(args.result_root,
                                      vp.PATHS_ARTIFACTS_RESIDUALS),
                video_path=os.path.join(args.result_root,
                                        vp.PATHS_ENCODED_DIR,
                                        "enhancement_layer.h265"),
                crf=h265.CRF, preset=h265.PRESET, pix_fmt=h265.PIX_FMT,
                save_to_frames=True,
                frames_path=os.path.join(args.result_root,
                                         vp.PATHS_ARTIFACTS_RESIDUALS_ENCODED))
        else:
            logger.warning(
                "ffmpeg not found: skipping H.265 enhancement-layer encode; "
                "the decoder will fuse the raw (lossless) residual PNGs "
                "(set ENHANCEMENT_LAYER.CODEC: intra for the ffmpeg-free "
                "learned enhancement layer)")

        vp.calc_bitrate_metrics(args.result_root, args.video_path,
                                gop=codec_settings.BASE_LAYER.DCVC_HEM.GOP)

    if args.do_decode:
        vp.fuse_layers(args.result_root,
                       faces_enable=dets.FACES.ENABLE,
                       liplates_enable=dets.LIPLATES.ENABLE,
                       faces_padding=dets.FACES.PADDING,
                       liplates_padding=dets.LIPLATES.PADDING)

        if shutil.which("ffmpeg") is not None:
            vp.encode_frames(
                src_root=os.path.join(args.result_root,
                                      vp.PATHS_ARTIFACTS_RESULT),
                video_path=os.path.join(args.result_root,
                                        vp.PATHS_DECODED_DIR,
                                        "vcm-ts_decoded.h265"),
                crf=0, preset="medium", pix_fmt="gbrp", save_to_frames=False)

            cmp265 = codec_settings.COMPARE.H265
            vp.encode_same_bitrate(
                args.result_root, args.video_path,
                out_video_path=os.path.join(args.result_root,
                                            vp.PATHS_DECODED_DIR,
                                            "same_bitrate.h265"),
                preset=cmp265.PRESET, pix_fmt=cmp265.PIX_FMT,
                save_to_frames=True,
                frames_path=os.path.join(args.result_root,
                                         vp.PATHS_ARTIFACTS_SAME_BITRATE))
        else:
            logger.warning(
                "ffmpeg not found: skipping lossless export and the "
                "same-bitrate H.265 comparison encode")

        vp.calc_visual_metrics(args.result_root, args.video_path,
                               liplates_padding=dets.LIPLATES.PADDING,
                               faces_padding=dets.FACES.PADDING)


if __name__ == "__main__":
    main()
