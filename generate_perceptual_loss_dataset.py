"""Perceptual-loss dataset generator: videos -> resized frame sequences.

Port of the reference generate_perceptual_loss_dataset.py:32-149: each video
becomes `<name>/raw/%05d.png` resized so min(height) == --min-height, and a
train_sequences.txt list file is emitted for DATASET.TRAIN_SUBDIR_LISTS.
"""

from __future__ import annotations

import argparse
import os
import shutil
from glob import glob

from vcm_ts_tpu.utils.logger import setup_logger

_LOGGER_NAME = "DATASETGEN"


def video2frames(video_path, out_dir, min_height,
                 filename_template="%05d.png"):
    import cv2 as cv

    cap = cv.VideoCapture(video_path)
    os.makedirs(out_dir, exist_ok=True)
    cnt = 0
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        h, w, _ = frame.shape
        if min_height and h > min_height:
            scale = min_height / h
            frame = cv.resize(frame, (int(round(w * scale)), min_height),
                              interpolation=cv.INTER_AREA)
        cv.imwrite(os.path.join(out_dir, filename_template % cnt), frame)
        cnt += 1
    cap.release()
    return cnt


def generate_data_video(src_video, dst_root, min_height):
    name = os.path.splitext(os.path.basename(src_video))[0]
    raw_dir = os.path.join(dst_root, name, "raw")
    shutil.rmtree(os.path.join(dst_root, name), ignore_errors=True)
    n = video2frames(src_video, raw_dir, min_height)
    return name, n


def main():
    parser = argparse.ArgumentParser(
        description="Generate perceptual-loss training dataset")
    parser.add_argument("--src-dir", type=str, required=True,
                        help="directory of source videos")
    parser.add_argument("--dst", type=str, required=True)
    parser.add_argument("--min-height", type=int, default=720)
    args = parser.parse_args()

    logger = setup_logger(_LOGGER_NAME, 0)
    os.makedirs(args.dst, exist_ok=True)
    videos = sorted(sum((glob(os.path.join(args.src_dir, p))
                         for p in ("*.mp4", "*.avi", "*.mkv", "*.mov")), []))
    names = []
    for video in videos:
        name, n = generate_data_video(video, args.dst, args.min_height)
        logger.info("%s: %d frames", name, n)
        names.append(name)
    with open(os.path.join(args.dst, "train_sequences.txt"), "w") as f:
        for name in names:
            f.write(name + "\n")


if __name__ == "__main__":
    main()
