"""PNG sequence IO (NHWC).

Equivalent of the reference PNGReader
(DCVC_HEM/src/utils/png_reader.py:10-50): sequential imN.png / imNNNNN.png
reader returning float32 (H, W, 3) in [0, 1], plus an image writer matching
save_torch_image (test_video.py:68-71).
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


class PNGReader:
    def __init__(self, src_folder: str):
        self.src_folder = src_folder
        pngs = os.listdir(src_folder)
        if "im1.png" in pngs:
            self.padding = 1
        elif "im00001.png" in pngs:
            self.padding = 5
        else:
            raise ValueError("unknown image naming convention; please specify")
        self.current_frame_index = 1
        self.eof = False

    def read_one_frame(self, get_png_path: bool = False):
        """Returns (H, W, 3) float32 RGB in [0,1], or None at EOF."""
        if self.eof:
            return (None, None) if get_png_path else None
        png_path = os.path.join(
            self.src_folder,
            f"im{str(self.current_frame_index).zfill(self.padding)}.png")
        if not os.path.exists(png_path):
            self.eof = True
            return (None, None) if get_png_path else None
        rgb = np.asarray(Image.open(png_path).convert("RGB"),
                         dtype=np.float32) / 255.0
        self.current_frame_index += 1
        if get_png_path:
            return rgb, png_path
        return rgb

    def close(self):
        self.current_frame_index = 1
        self.eof = False


def save_image(img, save_path: str):
    """img: (1, H, W, 3) or (H, W, 3) float in [0,1]."""
    img = np.asarray(img)
    if img.ndim == 4:
        img = img[0]
    img = np.clip(np.rint(img * 255), 0, 255).astype(np.uint8)
    Image.fromarray(img).save(save_path)


def read_image(path: str) -> np.ndarray:
    """(1, H, W, 3) float32 RGB in [0,1] (test_video.py:54-59)."""
    rgb = np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0
    return rgb[None]
