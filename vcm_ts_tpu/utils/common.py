"""Misc codec utilities: rate-point interpolation, float-precision JSON dump,
per-sequence metric log builder.

Equivalents of DCVC_HEM/src/utils/common.py:23-112.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def interpolate_log(min_val, max_val, num, decending=True):
    assert max_val > min_val
    assert min_val > 0
    if decending:
        values = np.linspace(np.log(max_val), np.log(min_val), num)
    else:
        values = np.linspace(np.log(min_val), np.log(max_val), num)
    return np.exp(values)


def scale_list_to_str(scales) -> str:
    return "".join(f"{s:.2f} " for s in scales)


def create_folder(path, print_if_create=False):
    if not os.path.exists(path):
        os.makedirs(path)
        if print_if_create:
            print(f"created folder: {path}")


def dump_json(obj, fid, float_digits=-1, **kwargs):
    """JSON dump with fixed float precision (common.py:49-60)."""
    if float_digits >= 0:
        def roundf(o):
            if isinstance(o, float):
                return round(o, float_digits)
            if isinstance(o, dict):
                return {k: roundf(v) for k, v in o.items()}
            if isinstance(o, (list, tuple)):
                return [roundf(v) for v in o]
            return o
        obj = roundf(obj)
    json.dump(obj, fid, **kwargs)


def generate_log_json(frame_num, frame_types, bits, psnrs, ssims,
                      frame_pixel_num, decoded=None):
    """Per-sequence metric JSON (common.py:63-112)."""
    i_bit = i_psnr = i_ssim = 0.0
    p_bit = p_psnr = p_ssim = 0.0
    i_num = p_num = 0
    for idx in range(frame_num):
        if frame_types[idx] == 0:
            i_bit += bits[idx]
            i_psnr += psnrs[idx]
            i_ssim += ssims[idx]
            i_num += 1
        else:
            p_bit += bits[idx]
            p_psnr += psnrs[idx]
            p_ssim += ssims[idx]
            p_num += 1

    log = {
        "frame_pixel_num": frame_pixel_num,
        "i_frame_num": i_num,
        "p_frame_num": p_num,
        "ave_i_frame_bpp": i_bit / i_num / frame_pixel_num,
        "ave_i_frame_psnr": i_psnr / i_num,
        "ave_i_frame_msssim": i_ssim / i_num,
        "frame_bpp": list(np.array(bits) / frame_pixel_num),
        "frame_psnr": psnrs,
        "frame_msssim": ssims,
        "frame_type": frame_types,
    }
    if p_num > 0:
        log["ave_p_frame_bpp"] = p_bit / (p_num * frame_pixel_num)
        log["ave_p_frame_psnr"] = p_psnr / p_num
        log["ave_p_frame_msssim"] = p_ssim / p_num
    else:
        log["ave_p_frame_bpp"] = 0
        log["ave_p_frame_psnr"] = 0
        log["ave_p_frame_msssim"] = 0
    log["ave_all_frame_bpp"] = (i_bit + p_bit) / (frame_num * frame_pixel_num)
    log["ave_all_frame_psnr"] = (i_psnr + p_psnr) / frame_num
    log["ave_all_frame_msssim"] = (i_ssim + p_ssim) / frame_num
    log["decoded"] = decoded
    return log
