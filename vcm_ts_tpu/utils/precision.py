"""Inference dtype policies.

Round-3 measured 19 dB f32-vs-bf16 recon agreement on a HALF-trained
(pre-cascade) checkpoint; round 4's full 6-stage curriculum checkpoint
measures **50.7 dB agreement, +0.22% bpp, BD-rate(bf16) = -0.035%**
(PERF.md round 4) — on properly trained weights bf16 is transparent, and
it stays the bench headline dtype. The per-checkpoint gate
(tools/bf16_bd_gate.py) remains the policy mechanism: agreement is a
property of the checkpoint, so gate each production checkpoint rather
than trusting either measurement generalizes. Streams are
self-consistent in every dtype by construction (the engines run the
decoder's own stage programs inside the encoder).

`cast_params_mixed` implements the middle operating point: parameters of
the reconstruction-critical modules (and the quantization-scale scalars)
stay f32 while everything else casts to bf16. Flax's promote-dtype
semantics (nn.Conv dtype=None) then run those modules' compute in f32
automatically — bf16 activations entering an f32-param module promote to
f32 — so no model changes are needed. Quality/throughput of the policy
is measured per checkpoint by tools/bf16_bd_gate.py (three-way BD-rate:
f32 / bf16 / mixed); the bench exposes it as --dtype mixed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Decode-side reconstruction path of the DMC (models/dmc.py): everything
# from the decoded latents/contexts to x_hat, plus the recurrent feature
# feedback producers, plus the q-scale scalars (index-derivation inputs).
RECON_F32_MODULES = (
    "recon_generation_net",
    "contextual_decoder",
    "context_fusion_net",
    "feature_extractor",
    "feature_adaptor_I",
    "feature_adaptor_P",
    "mv_decoder",
    # quantization scales: tiny, but they sit upstream of symbol rounding
    # and scale-index derivation
    "mv_y_q_scale",
    "y_q_scale",
    "mv_y_q_basic",
    "y_q_basic",
)


def cast_params_mixed(params, keep_f32=RECON_F32_MODULES):
    """Cast f32 leaves to bf16 except subtrees whose path contains a key
    in `keep_f32` (matched at any depth, so it works for both DMC and
    IntraNoAR trees and for scalar q-params)."""
    keep = set(keep_f32)

    def cast(path, v):
        if v.dtype != jnp.float32:
            return v
        for p in path:
            key = getattr(p, "key", None)
            if key in keep:
                return v
        return v.astype(jnp.bfloat16)

    return jax.tree_util.tree_map_with_path(cast, params)


def cast_params(params, dtype):
    """Wholesale dtype cast of all f32 leaves (the bench's bf16 mode)."""
    return jax.tree_util.tree_map(
        lambda v: v.astype(dtype) if v.dtype == jnp.float32 else v, params)
