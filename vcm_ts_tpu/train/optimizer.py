"""Optimizer factory with stage-dependent parameter freezing.

Functional equivalent of the reference's AdamW factory
(core/solver/optimizer.py:4-15, betas 0.9/0.99, torch-default weight decay
0.01) combined with DCVC_HEM.activate_modules_* requires_grad toggling
(core/model/dcvc_hem.py:23-102): frozen subtrees are expressed as an optax
mask, so their moments/decay are skipped entirely — the same effect torch
gets from grad=None params. Stage boundaries swap the mask by rebuilding the
transformation (mirroring train_multi.py:194-200's model re-init).
"""

from __future__ import annotations

import jax
import optax

# Top-level DMC param groups (core/model/dcvc_hem.py:23-42)
INTER_DIST_MODULES = frozenset({
    "bit_estimator_z_mv",
    "mv_decoder",
    "mv_encoder",
    "mv_hyper_prior_decoder",
    "mv_hyper_prior_encoder",
    "mv_y_spatial_prior",
    "mv_y_prior_fusion",
    "optic_flow",
})
INTER_RATE_PARAMS = frozenset({"mv_y_q_basic", "mv_y_q_scale"})
RECON_RATE_PARAMS = frozenset({"y_q_basic", "y_q_scale"})


def _top_name(path) -> str:
    # path is a tuple of DictKey entries; the first segment under "params"
    key = path[0]
    return getattr(key, "key", str(key))


def trainable_mask(params, mode: str):
    """Boolean pytree: True where the leaf is trainable under `mode`."""

    def rule(top: str) -> bool:
        in_inter = top in INTER_DIST_MODULES
        in_inter_rate = top in INTER_RATE_PARAMS
        in_recon_rate = top in RECON_RATE_PARAMS
        if mode == "inter_dist":
            return in_inter
        if mode == "inter_dist_rate":
            return in_inter or in_inter_rate
        if mode == "recon_dist":
            return not (in_inter or in_inter_rate or in_recon_rate)
        if mode == "recon_dist_rate":
            return not (in_inter or in_inter_rate)
        if mode == "all":
            return True
        raise ValueError(f"unknown trainable mode: {mode}")

    inner = params["params"] if "params" in params else params
    mask_inner = jax.tree_util.tree_map_with_path(
        lambda path, _: rule(_top_name(path)), inner)
    if "params" in params:
        return {"params": mask_inner}
    return mask_inner


def make_optimizer(lr: float, mask=None,
                   grad_clip_norm: float = 0.0) -> optax.GradientTransformation:
    """AdamW(0.9, 0.99), wd=0.01, optionally restricted to the trainable set.

    Frozen leaves get set_to_zero (NOT optax.masked, which passes raw
    gradients through unchanged for masked-out leaves — that would apply
    unscaled gradient ascent to frozen params whenever the loss touches
    them, e.g. recon-path params under cascade BPTT with an inter-only
    stage).

    grad_clip_norm > 0 prepends global-norm clipping. The reference has no
    clipping (it always starts from pretrained DCVC weights); training
    from scratch needs it — at random init the factorized/gaussian rate
    estimates explode (-log2 of vanishing tail mass), and those gradients
    blow up the recurrent DPB chain."""
    tx = optax.adamw(learning_rate=lr, b1=0.9, b2=0.99, weight_decay=0.01)
    if grad_clip_norm and grad_clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    if mask is None:
        return tx
    labels = jax.tree_util.tree_map(
        lambda m: "train" if m else "freeze", mask)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels)


def make_stage_optimizer(params, mode: str, lr: float,
                         grad_clip_norm: float = 0.0):
    """Build (tx, opt_state) for a stage. Fresh moments per stage, matching
    the DDP reference's stage-boundary re-init (train_multi.py:194-200)."""
    mask = trainable_mask(params, mode)
    tx = make_optimizer(lr, mask, grad_clip_norm)
    return tx, tx.init(params)
