"""Default configuration trees.

Same schema and defaults as the reference's two yacs trees:
- training `cfg` (core/config/training_settings.py:1-78)
- codec `codec_settings` (core/config/codec_settings.py:1-69)
with a few TPU-specific additions under SOLVER/DEVICE kept separate.
"""

from __future__ import annotations

from ..utils.config import CfgNode


def default_training_cfg() -> CfgNode:
    cfg = CfgNode()

    cfg.MODEL = CfgNode()
    cfg.MODEL.ARCHITECTURE = "DCVC_HEM"
    cfg.MODEL.DEVICE = "tpu"
    cfg.MODEL.PRETRAINED_WEIGHTS = ""
    cfg.MODEL.I_FRAME_PRETRAINED_WEIGHTS = ""
    # TPU additions: [channel_mv, channel_N, channel_M]; reference widths
    cfg.MODEL.CHANNELS = [64, 64, 96]

    cfg.INPUT = CfgNode()
    cfg.INPUT.MAKE_DIVISIBLE_BY = 8
    cfg.INPUT.IMAGE_SIZE = [256, 256]

    cfg.DATASET = CfgNode()
    cfg.DATASET.TYPE = ""
    cfg.DATASET.TRAIN_ROOT_DIRS = []
    cfg.DATASET.TRAIN_SUBDIR_LISTS = []
    cfg.DATASET.TEST_ROOT_DIRS = []
    cfg.DATASET.TEST_SUBDIR_LISTS = []
    cfg.DATASET.TEST_OD_ROOT_DIRS = []
    cfg.DATASET.SEQUENCE_LENGTH = 16
    cfg.DATASET.SEQUENCE_STRIDE = 1
    cfg.DATASET.SUBDIR_INPUTS = "raw"
    cfg.DATASET.METADATA_PATH = ""
    cfg.DATASET.OD_GOP_SIZE = 32
    cfg.DATASET.OD_STAGE = 5

    cfg.DATA_LOADER = CfgNode()
    cfg.DATA_LOADER.NUM_WORKERS = 1
    cfg.DATA_LOADER.PIN_MEMORY = True

    cfg.SOLVER = CfgNode()
    cfg.SOLVER.LAMBDAS = [85, 170, 380, 840]
    cfg.SOLVER.PL_MODEL = "resnet"
    cfg.SOLVER.PL_LAYERS = ["1", "2", "3", "4"]
    cfg.SOLVER.PL_LAMBDA = 1e1
    cfg.SOLVER.DIST_LAMBDA = 1.0
    cfg.SOLVER.LR = 1e-4
    # global-norm gradient clipping; 0 disables (= reference behavior,
    # which always fine-tunes from pretrained DCVC weights). From-scratch
    # training needs ~1.0: random-init rate estimates explode.
    cfg.SOLVER.GRAD_CLIP_NORM = 0.0
    # NaN sanitizer (beyond reference parity, SURVEY 5.2): when true the
    # trainers enable jax debug_nans — every jitted step re-runs op-by-op
    # on a NaN and raises FloatingPointError at the producing op instead
    # of training onward on poisoned values. Debug only: it disables
    # async dispatch, so steps serialize (~2-3x slower).
    cfg.SOLVER.DEBUG_NANS = False
    # rematerialize each frame of cascade-BPTT chains (memory flat in
    # p_frames; ~1/3 extra backward FLOPs). Off reproduces the reference's
    # keep-everything autograd behavior.
    cfg.SOLVER.CASCADE_REMAT = True
    # bf16 compute for the train forward/backward with f32 master params
    # and Adam moments (the bit-estimator CDF tables also stay f32 — see
    # train_step.cast_for_compute). No loss scaling needed: bf16 keeps
    # f32's exponent range. Off by default: the reference trains f32, and
    # the RD impact on trained weights is gated by tools/bf16_bd_gate.py
    # before this becomes the recommended setting.
    cfg.SOLVER.MIXED_PRECISION = False
    # gradient accumulation over G contiguous rate-anchor microbatches
    # inside the cascade step (must divide len(LAMBDAS)). Activation
    # memory scales ~1/G for one extra param-tree accumulator; the update
    # is the exact full-batch mean gradient. G=2 is what fits the
    # 4-anchor 256x256 f32 cascade stage on one v5e chip (remat alone
    # leaves it 225 MB over HBM).
    cfg.SOLVER.GRAD_ACCUM_STEPS = 1
    # 8-field stage tuples:
    # [p_frames, modules(me|rec|all), method(single|cascade), loss_dist(me|rec),
    #  loss_rate(none|me|rec|all), lr, epochs, perceptual_loss(true|false)]
    cfg.SOLVER.STAGES = [
        ["1", "me", "single", "me", "none", "0.0001", "1", "false"],
        ["1", "me", "single", "me", "me", "0.0001", "3", "false"],
        ["1", "rec", "single", "rec", "none", "0.0001", "3", "false"],
        ["1", "rec", "single", "rec", "rec", "0.0001", "3", "false"],
        ["1", "all", "single", "rec", "all", "0.0001", "6", "false"],
        ["2", "all", "single", "rec", "all", "0.0001", "5", "false"],
        ["4", "all", "single", "rec", "all", "0.0001", "3", "false"],
        ["4", "all", "single", "rec", "all", "0.00001", "1", "false"],
        ["4", "all", "cascade", "rec", "all", "0.00005", "2", "false"],
        ["4", "all", "cascade", "rec", "all", "0.00001", "3", "false"],
    ]

    cfg.OUTPUT_DIR = "outputs/test"

    cfg.TENSORBOARD = CfgNode()
    cfg.TENSORBOARD.BEST_SAMPLES_NUM = 16
    cfg.TENSORBOARD.WORST_SAMPLES_NUM = 16

    return cfg


def default_codec_settings() -> CfgNode:
    cfg = CfgNode()

    cfg.BASE_LAYER = CfgNode()
    cfg.BASE_LAYER.DCVC_HEM = CfgNode()
    cfg.BASE_LAYER.DCVC_HEM.I_FRAME_WEIGHTS = "pretrained/acmmm2022_image_psnr.pth"
    cfg.BASE_LAYER.DCVC_HEM.P_FRAME_WEIGHTS = "pretrained/acmmm2022_video_psnr.pth"
    cfg.BASE_LAYER.DCVC_HEM.ANCHOR_NUM = 4
    cfg.BASE_LAYER.DCVC_HEM.GOP = 32
    cfg.BASE_LAYER.DCVC_HEM.RATE_COUNT = 6
    cfg.BASE_LAYER.DCVC_HEM.QUALITY = 1
    cfg.BASE_LAYER.DCVC_HEM.WRITE_STREAM = True
    cfg.BASE_LAYER.DCVC_HEM.DEVICE = "tpu"

    cfg.ENHANCEMENT_LAYER = CfgNode()
    cfg.ENHANCEMENT_LAYER.DETECTORS = CfgNode()
    for det in ("FACES", "LIPLATES"):
        node = CfgNode()
        node.DEVICE = "tpu"
        node.ENABLE = True
        node.PADDING = 10
        node.PROB = 0.9
        cfg.ENHANCEMENT_LAYER.DETECTORS[det] = node
    # which codec carries the ROI residuals: "h265" = the reference's
    # ffmpeg/x265 path (video_coder.py:488-519); "intra" = the framework's
    # own learned IntraCodec (TPU-native, zero external binaries — see
    # codec/vcm_pipeline.py encode_residuals_learned)
    cfg.ENHANCEMENT_LAYER.CODEC = "h265"
    cfg.ENHANCEMENT_LAYER.H265 = CfgNode()
    cfg.ENHANCEMENT_LAYER.H265.CRF = 25
    cfg.ENHANCEMENT_LAYER.H265.PIX_FMT = "gbrp"
    cfg.ENHANCEMENT_LAYER.H265.PRESET = "veryfast"
    cfg.ENHANCEMENT_LAYER.LEARNED = CfgNode()
    # "" = reuse BASE_LAYER.DCVC_HEM.I_FRAME_WEIGHTS
    cfg.ENHANCEMENT_LAYER.LEARNED.I_FRAME_WEIGHTS = ""
    cfg.ENHANCEMENT_LAYER.LEARNED.QUALITY = 1
    cfg.ENHANCEMENT_LAYER.LEARNED.RATE_COUNT = 6

    cfg.COMPARE = CfgNode()
    cfg.COMPARE.H265 = CfgNode()
    cfg.COMPARE.H265.PIX_FMT = "gbrp"
    cfg.COMPARE.H265.PRESET = "veryfast"

    return cfg
