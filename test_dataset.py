"""Dataset smoke-check: builds the configured dataset, prints sequence
count, and (optionally) visualizes input/target pairs.

Port of the reference test_dataset.py:7-27; --headless skips the cv2 window
(the default when no display is available).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="Dataset smoke check")
    parser.add_argument("--config-file", type=str, required=True)
    parser.add_argument("--headless", action="store_true",
                        default=not os.environ.get("DISPLAY"))
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    from vcm_ts_tpu.data import build_dataset
    from vcm_ts_tpu.train.config import default_training_cfg

    cfg = default_training_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    for root, lst in zip(cfg.DATASET.TRAIN_ROOT_DIRS,
                         cfg.DATASET.TRAIN_SUBDIR_LISTS):
        dataset = build_dataset(cfg.DATASET.TYPE, root, cfg, lst,
                                is_train=True)
        print(f"{root}: {len(dataset)} sequences")
        if len(dataset) == 0:
            continue
        inputs, targets = dataset[0]
        print(f"  sample shapes: inputs {inputs.shape} targets "
              f"{targets.shape}, range [{inputs.min():.3f}, "
              f"{inputs.max():.3f}]")
        if not args.headless:
            import cv2 as cv

            for inp, tgt in zip(inputs, targets):
                cv.imshow("Input", cv.cvtColor(
                    (inp * 255).astype(np.uint8), cv.COLOR_RGB2BGR))
                cv.imshow("Target", cv.cvtColor(
                    (tgt * 255).astype(np.uint8), cv.COLOR_RGB2BGR))
                if cv.waitKey(0) & 0xFF == ord("q"):
                    return


if __name__ == "__main__":
    main()
