"""Misc codec utilities: rate-point interpolation, float-precision JSON dump,
per-sequence metric log builder.

Functional equivalents of DCVC_HEM/src/utils/common.py:23-112, re-derived:
the produced JSON schema (key names, aggregation rules) is kept identical so
downstream tools (benchmark_plot, bd_rate) can consume logs from either
framework, but the implementations are our own (vectorized aggregation, a
non-recursive rounding pass, a corrected `descending` spelling).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

_TRUE = frozenset(("yes", "true", "t", "y", "1"))
_FALSE = frozenset(("no", "false", "f", "n", "0"))


def str2bool(v) -> bool:
    """argparse type for explicit yes/no flags."""
    if isinstance(v, bool):
        return v
    s = str(v).strip().lower()
    if s in _TRUE:
        return True
    if s in _FALSE:
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {v!r}")


def interpolate_log(min_val: float, max_val: float, num: int,
                    descending: bool = True) -> np.ndarray:
    """`num` points geometrically spaced over [min_val, max_val].

    Rate anchors (q_scales, lambdas) are perceptually log-spaced; this is how
    intermediate rate points are synthesized from the trained anchor range.
    """
    if not (0 < min_val < max_val):
        raise ValueError(f"need 0 < min_val < max_val, got "
                         f"[{min_val}, {max_val}]")
    pts = np.geomspace(min_val, max_val, num)
    return pts[::-1].copy() if descending else pts


def scale_list_to_str(scales) -> str:
    return "".join(f"{s:.2f} " for s in scales)


def create_folder(path, print_if_create: bool = False) -> None:
    existed = os.path.isdir(path)
    os.makedirs(path, exist_ok=True)
    if print_if_create and not existed:
        print(f"created folder: {path}")


def _round_floats(obj, digits: int):
    """Round every float in a JSON-ish tree."""
    if isinstance(obj, float):
        return round(obj, digits)
    if isinstance(obj, dict):
        return {k: _round_floats(v, digits) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_round_floats(v, digits) for v in obj]
    return obj


def dump_json(obj, fid, float_digits: int = -1, **kwargs) -> None:
    """json.dump with optional fixed float precision (keeps log files small
    and diffable across runs)."""
    if float_digits >= 0:
        obj = _round_floats(obj, float_digits)
    json.dump(obj, fid, **kwargs)


def generate_log_json(frame_num, frame_types, bits, psnrs, ssims,
                      frame_pixel_num, decoded=None):
    """Per-sequence metric JSON with the reference schema
    (DCVC_HEM/src/utils/common.py:63-112 — key names and I/P aggregation
    rules must match for benchmark_plot/bd_rate interop)."""
    types = np.asarray(frame_types[:frame_num])
    bits_a = np.asarray(bits[:frame_num], dtype=np.float64)
    psnr_a = np.asarray(psnrs[:frame_num], dtype=np.float64)
    ssim_a = np.asarray(ssims[:frame_num], dtype=np.float64)
    is_i = types == 0
    i_num = int(is_i.sum())
    p_num = frame_num - i_num

    def _avg(arr, mask, n):
        return float(arr[mask].sum() / n) if n else 0

    log = {
        "frame_pixel_num": frame_pixel_num,
        "i_frame_num": i_num,
        "p_frame_num": p_num,
        "ave_i_frame_bpp": _avg(bits_a, is_i, i_num) / frame_pixel_num,
        "ave_i_frame_psnr": _avg(psnr_a, is_i, i_num),
        "ave_i_frame_msssim": _avg(ssim_a, is_i, i_num),
        "frame_bpp": list(bits_a / frame_pixel_num),
        "frame_psnr": psnrs,
        "frame_msssim": ssims,
        "frame_type": frame_types,
        "ave_p_frame_bpp": (_avg(bits_a, ~is_i, p_num) / frame_pixel_num
                            if p_num else 0),
        "ave_p_frame_psnr": _avg(psnr_a, ~is_i, p_num),
        "ave_p_frame_msssim": _avg(ssim_a, ~is_i, p_num),
        "ave_all_frame_bpp": float(bits_a.sum()) / (frame_num
                                                    * frame_pixel_num),
        "ave_all_frame_psnr": float(psnr_a.sum()) / frame_num,
        "ave_all_frame_msssim": float(ssim_a.sum()) / frame_num,
        "decoded": decoded,
    }
    return log


def tree_copy(tree):
    """Deep-copy every array leaf of a pytree onto fresh buffers.

    The jitted train steps donate their params/opt_state/dpb inputs
    (train/train_step.py) so XLA updates them in place; a caller that
    needs the pre-step tree afterwards (A/B comparisons, snapshots)
    passes `tree_copy(tree)` to the step and keeps the original."""
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.copy, tree)


def enable_debug_nans(enable: bool = True) -> None:
    """NaN sanitizer for training runs (cfg.SOLVER.DEBUG_NANS).

    Flips jax's debug_nans mode: any NaN produced inside a jitted step
    re-runs the program op-by-op and raises FloatingPointError at the
    producing op. The reference has no sanitizer posture (SURVEY 5.2);
    this is the XLA-native equivalent of running under a numerics
    checker. Debug only — it serializes dispatch."""
    import jax

    jax.config.update("jax_debug_nans", bool(enable))


def enable_compilation_cache(cache_dir: str | None = None,
                             min_compile_secs: float = 2.0) -> str:
    """Point JAX's persistent compilation cache at a repo-local directory.

    The tunnel-attached TPU's compile service is slow and variable (a
    1080p program can take 5-30 min to compile cold); the persistent cache
    makes every subsequent process start instantly for already-seen
    programs — bench.py and the entry points call this so repeated bench /
    driver runs hit warm programs. Safe no-op if the backend ignores it."""
    import os

    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), "artifacts", "xla_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return cache_dir
