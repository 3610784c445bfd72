"""Pure training-step functions for the DMC model.

Functional re-design of the reference's forward_single / forward_cascade
training strategies (core/model/dcvc_hem.py:104-252, 324-483):

- `single`: one optimizer step per P-frame, DPB passed by value between steps
  (the reference detaches it; here each step is its own jitted function so
  the cut is structural).
- `cascade`: loss averaged over the whole p_frames chain, one optimizer step,
  full backprop through time (the reference keeps the graph alive; here the
  chain is unrolled inside one jitted loss).

The rate-anchor trick is preserved: batch row i trains at lambda_i with
q_scale row i (reference dcvc_hem.py:14-16,145, data loader batch_size =
len(LAMBDAS)).

All functions are mesh-polymorphic: under shard_map/pjit with a data-sharded
batch, the same code runs data-parallel (gradients reduced by the caller).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from ..models.dmc import make_dpb


class FrameAux(NamedTuple):
    """Per-rate-anchor stats, shape (anchor_num,), replicated across the
    mesh (batch rows tiled over anchors are mean-reduced inside the step)."""
    loss: jnp.ndarray
    rate: jnp.ndarray
    dist: jnp.ndarray
    p_dist: jnp.ndarray
    bpp: jnp.ndarray
    psnr: jnp.ndarray
    me_psnr: jnp.ndarray


def _psnr(mse):
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))


# Mixed-precision keep-list: parameter subtrees that stay f32 even in bf16
# compute mode. The factorized bit estimators' CDF tables (a/b/c/h) shape
# likelihoods through nested sigmoids whose saturation is precision-
# sensitive, and they're tiny — flax promotes their inputs to f32 locally,
# so keeping them costs nothing.
_MP_KEEP_F32 = ("bit_estimator",)


def cast_for_compute(params, dtype):
    """Cast f32 weights to the compute dtype for a bf16 forward/backward.

    Master parameters (and the Adam moments) stay f32 in the optimizer —
    the cast happens inside the loss so its VJP accumulates gradients back
    into f32 (the standard mixed-precision split: bf16 compute, f32
    state). bf16's f32-equal exponent range means no loss scaling is
    needed, unlike fp16 (SURVEY.md perf notes)."""
    def cast(path, v):
        name = jax.tree_util.keystr(path)
        if v.dtype != jnp.float32 or any(k in name for k in _MP_KEEP_F32):
            return v
        return v.astype(dtype)

    return jax.tree_util.tree_map_with_path(cast, params)


def _cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda v: v.astype(dtype) if v.dtype == jnp.float32 else v, tree)


def frame_loss(params, model, x, target, dpb, *, lambdas, dist_lambda,
               pl_lambda, loss_rate_keys: Sequence[str], loss_dist_key: str,
               pl_fn: Optional[Callable], noise_rng, is_first_p: bool,
               training: bool = True, compute_dtype=None,
               anchor_start=None, anchor_count: Optional[int] = None):
    """RD (+ optional perceptual) loss for one P-frame
    (dcvc_hem.py:199-216).

    Batch rows cycle through the rate anchors: a global batch of
    k * anchor_num rows tiles q_scale/lambda k times — the layout a k-rank
    DDP run produces in the reference (each rank's batch = len(LAMBDAS)).

    compute_dtype (SOLVER.MIXED_PRECISION): run the model forward/backward
    in bf16 (weights cast inside the loss, so gradients and the optimizer
    stay f32 master-precision); the model outputs are upcast before the
    loss/metric math so rate+distortion accumulate in f32.

    anchor_start/anchor_count (SOLVER.GRAD_ACCUM_STEPS): the batch rows are
    a contiguous microbatch of `anchor_count` rate anchors starting at
    anchor row `anchor_start` (a traced scalar — the accumulation scan's
    loop index). q_scale rows and lambdas are sliced to match; the slice's
    VJP scatters the q-scale gradients back into their anchor rows, so the
    accumulated gradient equals the full-batch gradient."""
    if compute_dtype is not None:
        params = cast_for_compute(params, compute_dtype)
        x = x.astype(compute_dtype)
        dpb = _cast_tree(dpb, compute_dtype)
    mv_q = params["params"]["mv_y_q_scale"]
    y_q = params["params"]["y_q_scale"]
    if anchor_start is not None:
        mv_q = jax.lax.dynamic_slice_in_dim(mv_q, anchor_start,
                                            anchor_count, 0)
        y_q = jax.lax.dynamic_slice_in_dim(y_q, anchor_start,
                                           anchor_count, 0)
        lambdas = jax.lax.dynamic_slice_in_dim(lambdas, anchor_start,
                                               anchor_count, 0)
    reps = x.shape[0] // mv_q.shape[0]
    if reps > 1:
        mv_q = jnp.tile(mv_q, (reps, 1, 1, 1))
        y_q = jnp.tile(y_q, (reps, 1, 1, 1))
    if lambdas.shape[0] != x.shape[0]:
        lambdas = jnp.tile(lambdas, x.shape[0] // lambdas.shape[0])
    out = model.apply(params, x, dpb, mv_q, y_q, is_first_p,
                      training=training, noise_rng=noise_rng)
    if compute_dtype is not None:
        # loss/metric math and the DPB carry in f32 (the next frame's loss
        # downcasts the carry again, so the cascade scan's carry dtype is
        # invariant across iterations)
        out = jax.tree_util.tree_map(
            lambda v: v.astype(jnp.float32)
            if v.dtype == compute_dtype else v, out)

    rate = jnp.zeros_like(lambdas)
    for key in loss_rate_keys:
        rate = rate + out[key]
    dist = out[loss_dist_key]

    if pl_fn is not None:
        p_dist = pl_fn(target, out["dpb"]["ref_frame"])
    else:
        p_dist = jnp.zeros_like(lambdas)

    eff_lambdas = lambdas if len(loss_rate_keys) else jnp.ones_like(lambdas)
    loss = rate + eff_lambdas * (dist * dist_lambda + p_dist * pl_lambda)

    # Aux stats are reduced per rate anchor: (k * L,) -> (L,) mean over the
    # k tiled replicas. Under a mesh-sharded global batch this mean inserts
    # the cross-device all-reduce, so aux comes out replicated on every
    # process — the TPU-native form of the reference's 6x
    # dist.gather_object metric reduction (train_multi.py:456-494).
    n_anchors = (anchor_count if anchor_count is not None
                 else params["params"]["mv_y_q_scale"].shape[0])

    def _per_anchor(v):
        return v.reshape(-1, n_anchors).mean(0)

    aux = FrameAux(loss=_per_anchor(loss), rate=_per_anchor(rate),
                   dist=_per_anchor(dist), p_dist=_per_anchor(p_dist),
                   bpp=_per_anchor(out["bpp"]),
                   psnr=_per_anchor(_psnr(out["mse"])),
                   me_psnr=_per_anchor(_psnr(out["me_mse"])))
    return jnp.mean(loss), (aux, out["dpb"])


def make_single_frame_step(model, tx, stage, *, lambdas, dist_lambda,
                           pl_lambda, pl_fn=None, compute_dtype=None,
                           shard_constraint=None):
    """Jitted per-frame gradient step for the 'single' strategy.

    Returns step(params, opt_state, x, target, dpb, rng, is_first_p) ->
    (params, opt_state, aux, new_dpb). Mesh-polymorphic: with a data-sharded
    global batch and replicated params, XLA derives the DDP gradient
    all-reduce from the mean-loss structure — no explicit collective.

    compute_dtype=jnp.bfloat16 runs the forward/backward in bf16 with f32
    master params/moments (SOLVER.MIXED_PRECISION).

    shard_constraint (TP training): applied to the updated params and
    opt_state inside the jit, pinning them back to the canonical tensor-
    parallel layout so GSPMD's output-layout choices don't drift the
    sharding (and force a recompile) between steps."""

    lambdas = jnp.asarray(lambdas, jnp.float32)

    def loss_fn(params, x, target, dpb, rng, is_first_p):
        return frame_loss(
            params, model, x, target, dpb, lambdas=lambdas,
            dist_lambda=dist_lambda, pl_lambda=pl_lambda,
            loss_rate_keys=stage.loss_rate_keys,
            loss_dist_key=stage.loss_dist_key,
            pl_fn=pl_fn, noise_rng=rng, is_first_p=is_first_p,
            compute_dtype=compute_dtype)

    # params/opt_state are donated: every caller reassigns them from the
    # step's outputs (run_single_sequence / run_cascade_sequence), so XLA
    # can update Adam's moments and the weights in place instead of
    # holding both generations live — at full width that's ~210 MB of
    # HBM high-water (params + 2 Adam moments), the same scale as the
    # cascade stage's round-4 OOM margin. Callers that reuse an input
    # tree after the call (A/B comparison tests) must pass a copy.
    @partial(jax.jit, static_argnums=(6,), donate_argnums=(0, 1, 4))
    def step(params, opt_state, x, target, dpb, rng, is_first_p):
        (_, (aux, new_dpb)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, x, target, dpb, rng, is_first_p)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if shard_constraint is not None:
            params = shard_constraint(params)
            opt_state = shard_constraint(opt_state)
        new_dpb = jax.lax.stop_gradient(new_dpb)
        return params, opt_state, aux, new_dpb

    return step


def make_cascade_step(model, tx, stage, *, lambdas, dist_lambda, pl_lambda,
                      pl_fn=None, remat=True, compute_dtype=None,
                      shard_constraint=None, accum_steps: int = 1):
    """Jitted whole-chain gradient step for the 'cascade' strategy:
    xs/targets are (p_frames, N, H, W, C); BPTT through the DPB.

    remat (cfg.SOLVER.CASCADE_REMAT): checkpoint each frame of the chain —
    the backward pass recomputes a frame's activations from its DPB carry
    instead of keeping every frame's intermediates live, so BPTT memory
    stays flat in p_frames (the standard XLA remat trade: ~1/3 more
    backward FLOPs for O(chain) -> O(1) activation memory). Measured
    necessary: the 4-anchor 256x256 cascade stage OOMs one v5e chip's HBM
    without it. Gradients are numerically identical (same ops, replayed).

    accum_steps (cfg.SOLVER.GRAD_ACCUM_STEPS): gradient accumulation over
    G contiguous rate-anchor microbatches inside the one jitted step — a
    lax.scan computes each group's whole-chain gradient on anchor_num/G
    batch rows and sums them; one optimizer update applies the mean.
    Activation memory scales ~1/G while the update stays mathematically
    the full-batch gradient (equal group sizes: mean of group means ==
    global mean; q-scale slice VJPs scatter into disjoint anchor rows).
    Measured necessary at G=2: remat alone leaves the 4-anchor 256x256
    f32 cascade stage 225 MB over one v5e chip's 15.75 GB HBM (padding
    expansion on the 67-channel motion-compensation temps). Quantization
    noise is drawn per group (shape-dependent), so trajectories match
    accum=1 statistically, not bit-for-bit."""

    lambdas = jnp.asarray(lambdas, jnp.float32)
    p_frames = stage.p_frames
    n_anchors = lambdas.shape[0]
    if accum_steps > 1 and n_anchors % accum_steps:
        raise ValueError(
            f"GRAD_ACCUM_STEPS={accum_steps} must divide the "
            f"{n_anchors} rate anchors")
    mb = n_anchors // accum_steps

    def one_frame(params, x, target, dpb, sub, anchor_start, is_first_p):
        return frame_loss(
            params, model, x, target, dpb, lambdas=lambdas,
            dist_lambda=dist_lambda, pl_lambda=pl_lambda,
            loss_rate_keys=stage.loss_rate_keys,
            loss_dist_key=stage.loss_dist_key, pl_fn=pl_fn,
            noise_rng=sub, is_first_p=is_first_p,
            compute_dtype=compute_dtype, anchor_start=anchor_start,
            anchor_count=mb if anchor_start is not None else None)

    if remat:
        one_frame = jax.checkpoint(one_frame, static_argnums=(6,))

    def chain_loss(params, xs, targets, dpb, rng, anchor_start=None):
        # same key schedule as a sequential split-per-frame unroll
        subs = []
        for _ in range(p_frames):
            rng, sub = jax.random.split(rng)
            subs.append(sub)

        # frame 0 traces the I-frame feature-adaptor branch; the remaining
        # chain is a lax.scan with the DPB as carry (SURVEY.md section 7
        # design decision 1) — one trace of the frame body regardless of
        # p_frames, so compile time and program size stop scaling with the
        # GOP curriculum. BPTT through the carry is preserved (scan
        # differentiates through the carry chain).
        # is_first_p passed positionally: jax.checkpoint's static_argnums
        # only covers positional arguments
        _, (aux0, dpb) = one_frame(params, xs[0], targets[0], dpb, subs[0],
                                   anchor_start, True)
        if p_frames > 1:
            def body(carry, inp):
                x, target, sub = inp
                _, (aux, new_carry) = one_frame(params, x, target, carry,
                                                sub, anchor_start, False)
                return new_carry, aux
            dpb, rest = jax.lax.scan(
                body, dpb, (xs[1:], targets[1:], jnp.stack(subs[1:])))
            mean_aux = jax.tree_util.tree_map(
                lambda a0, r: (a0 + r.sum(0)) / p_frames, aux0, rest)
        else:
            mean_aux = aux0
        return jnp.mean(mean_aux.loss), (mean_aux, dpb)

    # donate params/opt_state too — see make_single_frame_step's note
    if accum_steps == 1:
        @partial(jax.jit, donate_argnums=(0, 1, 4))
        def step(params, opt_state, xs, targets, dpb0, rng):
            (_, (aux, dpb)), grads = jax.value_and_grad(
                chain_loss, has_aux=True)(params, xs, targets, dpb0, rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if shard_constraint is not None:
                params = shard_constraint(params)
                opt_state = shard_constraint(opt_state)
            return params, opt_state, aux, jax.lax.stop_gradient(dpb)

        return step

    G = accum_steps

    @partial(jax.jit, donate_argnums=(0, 1, 4))
    def step(params, opt_state, xs, targets, dpb0, rng):
        n = xs.shape[1]
        k = n // n_anchors  # replica tiling (k-process-equivalent batches)

        def group(v, axis):
            # rows are anchor-cycled (row i = replica i // A, anchor i % A);
            # split the anchor dim into G contiguous microbatches and lead
            # with the group axis for the scan
            shp = v.shape
            v = v.reshape(shp[:axis] + (k, G, mb) + shp[axis + 1:])
            v = jnp.moveaxis(v, axis + 1, 0)
            return v.reshape((G,) + shp[:axis] + (k * mb,) + shp[axis + 1:])

        xs_g = group(xs, 1)
        ts_g = group(targets, 1)
        dpb_g = jax.tree_util.tree_map(lambda v: group(v, 0), dpb0)
        subs = jax.random.split(rng, G)
        starts = jnp.arange(G) * mb
        zero = jax.tree_util.tree_map(jnp.zeros_like, params)

        def body(acc, inp):
            xs_i, ts_i, dpb_i, sub_i, start_i = inp
            (_, (aux, dpb)), g = jax.value_and_grad(
                chain_loss, has_aux=True)(params, xs_i, ts_i, dpb_i, sub_i,
                                          start_i)
            return jax.tree_util.tree_map(jnp.add, acc, g), (aux, dpb)

        acc, (auxs, dpbs) = jax.lax.scan(
            body, zero, (xs_g, ts_g, dpb_g, subs, starts))
        grads = jax.tree_util.tree_map(lambda v: v / G, acc)
        # per-group FrameAux fields are (mb,); groups are contiguous anchor
        # blocks, so (G, mb) flattens back into anchor order
        aux = jax.tree_util.tree_map(
            lambda v: v.reshape((n_anchors,) + v.shape[2:]), auxs)

        def ungroup(v):
            v = v.reshape((G, k, mb) + v.shape[2:])
            v = jnp.moveaxis(v, 0, 1)
            return v.reshape((n,) + v.shape[3:])

        dpb = jax.tree_util.tree_map(ungroup, dpbs)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if shard_constraint is not None:
            params = shard_constraint(params)
            opt_state = shard_constraint(opt_state)
        return params, opt_state, aux, jax.lax.stop_gradient(dpb)

    return step


def run_single_sequence(model, step_fn, params, opt_state, inputs, targets,
                        stage, rng, i_frame_fn=None, sample_cb=None,
                        to_device=jnp.asarray):
    """The reference's forward_single outer loops (dcvc_hem.py:160-238):
    for each subsequence start t_i, re-key the DPB and take `p_frames`
    per-frame gradient steps. inputs/targets: (N, T, H, W, C) numpy/jax.

    to_device maps a host frame batch onto devices; multi-host training
    passes a global-batch assembler here (parallel/mesh.py global_batch) so
    each process contributes its local rows to one mesh-sharded array."""
    n, t = inputs.shape[0], inputs.shape[1]
    p_frames = stage.p_frames
    aux_list = []
    for t_i in range(t - p_frames):
        ref = (i_frame_fn(inputs[:, t_i]) if i_frame_fn is not None
               else inputs[:, t_i])
        dpb = make_dpb(to_device(ref), model.channel_N, model.channel_M)
        for p_idx in range(p_frames):
            rng, sub = jax.random.split(rng)
            params, opt_state, aux, dpb = step_fn(
                params, opt_state, to_device(inputs[:, t_i + 1 + p_idx]),
                to_device(targets[:, t_i + 1 + p_idx]), dpb, sub,
                p_idx == 0)
            aux_list.append(aux)
            if sample_cb is not None:
                sample_cb(aux, targets[:, t_i + 1 + p_idx],
                          dpb["ref_frame"])
    return params, opt_state, aux_list


def run_cascade_sequence(model, step_fn, params, opt_state, inputs, targets,
                         stage, rng, i_frame_fn=None, sample_cb=None,
                         to_device=jnp.asarray, to_device_seq=None):
    """forward_cascade outer loop (dcvc_hem.py:380-469): one whole-chain
    gradient step per subsequence start.

    The (p_frames, N, H, W, C) chain stack is assembled on host so
    to_device_seq can shard its batch axis (dim 1) in one shot — stacking
    already-sharded global arrays eagerly is not legal multi-host."""
    import numpy as np

    if to_device_seq is None:
        to_device_seq = to_device
    n, t = inputs.shape[0], inputs.shape[1]
    p_frames = stage.p_frames
    aux_list = []
    for t_i in range(t - p_frames):
        ref = (i_frame_fn(inputs[:, t_i]) if i_frame_fn is not None
               else inputs[:, t_i])
        dpb = make_dpb(to_device(ref), model.channel_N, model.channel_M)
        xs = to_device_seq(np.stack(
            [np.asarray(inputs[:, t_i + 1 + k]) for k in range(p_frames)]))
        ts = to_device_seq(np.stack(
            [np.asarray(targets[:, t_i + 1 + k]) for k in range(p_frames)]))
        rng, sub = jax.random.split(rng)
        params, opt_state, aux, dpb = step_fn(params, opt_state, xs, ts, dpb,
                                              sub)
        aux_list.append(aux)
        if sample_cb is not None:
            sample_cb(aux, targets[:, t_i + p_frames], dpb["ref_frame"])
    return params, opt_state, aux_list
