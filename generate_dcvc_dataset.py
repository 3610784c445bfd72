"""Training-dataset generator: videos/frame-folders -> tiled sequences.

Port of the reference generate_dcvc_dataset.py:18-183: splits frames into
tile_size^2 zero-padded tiles, groups every seq_length frames into
`seq_%05d/raw/%05d.png` sequence folders. Fixes the reference's latent bug
where generate_data passed src_root instead of the per-folder path
(reference :84 — documented in SURVEY.md, not replicated).
"""

from __future__ import annotations

import argparse
import math
import os
import shutil
from glob import glob

import numpy as np

from vcm_ts_tpu.utils.logger import setup_logger

_LOGGER_NAME = "DATASETGEN"


def split_frame(frame: np.ndarray, tile_size: int):
    """(generate_dcvc_dataset.py:18-35)"""
    height, width, _ = frame.shape
    rows = height // tile_size + (1 if height % tile_size else 0)
    cols = width // tile_size + (1 if width % tile_size else 0)
    padded = np.pad(frame, [(0, rows * tile_size - height),
                            (0, cols * tile_size - width), (0, 0)],
                    mode="constant", constant_values=0)
    tiles = []
    for i in range(rows):
        for j in range(cols):
            tiles.append(padded[i * tile_size:(i + 1) * tile_size,
                                j * tile_size:(j + 1) * tile_size])
    return tiles


def process_frames(files, dst_root, tile_size, seq_length,
                   dirname_template="seq_%05d", filename_template="%05d.png"):
    """(generate_dcvc_dataset.py:38-65)"""
    import cv2 as cv

    common_index = 0
    frames_in_seq = 0
    seqs_amount = math.floor(len(files) / seq_length)
    for file in files:
        frame = cv.imread(file)
        for tile_index, tile in enumerate(split_frame(frame, tile_size)):
            seq_id = tile_index * seqs_amount + common_index
            raw = os.path.join(dst_root, dirname_template % seq_id, "raw")
            os.makedirs(raw, exist_ok=True)
            cv.imwrite(os.path.join(raw, filename_template % frames_in_seq),
                       tile)
        frames_in_seq += 1
        if frames_in_seq == seq_length:
            common_index += 1
            frames_in_seq = 0


def split_frames_to_tiles(frames_path, out_folder, tile_size, seq_length):
    files = sorted(glob(os.path.join(frames_path, "*")))
    files = files[: (len(files) // seq_length) * seq_length]
    if not files:
        return
    process_frames(files, out_folder, tile_size, seq_length)


def generate_data(src_root, dst_root, tile_size, seq_length,
                  dirname_template="%05d"):
    """Frame-folder mode; iterates each source folder (fixing reference :84)."""
    shutil.rmtree(dst_root, ignore_errors=True)
    os.makedirs(dst_root, exist_ok=True)
    folders = sorted(glob(os.path.join(src_root, "*")))
    for folder_index, folder in enumerate(folders):
        out_folder = os.path.join(dst_root, dirname_template % folder_index)
        split_frames_to_tiles(folder, out_folder, tile_size, seq_length)


def generate_data_video(src_video, dst_root, tile_size, seq_length,
                        filename_template="%05d.png"):
    """Video mode (generate_dcvc_dataset.py:90-114)."""
    import cv2 as cv

    os.makedirs(dst_root, exist_ok=True)
    name = os.path.splitext(os.path.basename(src_video))[0]
    temp = os.path.join(dst_root, "temp_frames")
    shutil.rmtree(temp, ignore_errors=True)
    os.makedirs(temp, exist_ok=True)
    cap = cv.VideoCapture(src_video)
    i = 0
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        cv.imwrite(os.path.join(temp, filename_template % i), frame)
        i += 1
    cap.release()
    split_frames_to_tiles(temp, os.path.join(dst_root, name + "_data"),
                          tile_size, seq_length)
    shutil.rmtree(temp, ignore_errors=True)


def main():
    parser = argparse.ArgumentParser(
        description="Generate tiled DCVC training dataset")
    parser.add_argument("--src", type=str, required=True,
                        help="source video file or frames root")
    parser.add_argument("--dst", type=str, required=True)
    parser.add_argument("--tile-size", type=int, default=256)
    parser.add_argument("--seq-length", type=int, default=16)
    args = parser.parse_args()

    setup_logger(_LOGGER_NAME, 0)
    if os.path.isfile(args.src):
        generate_data_video(args.src, args.dst, args.tile_size,
                            args.seq_length)
    else:
        generate_data(args.src, args.dst, args.tile_size, args.seq_length)


if __name__ == "__main__":
    main()
