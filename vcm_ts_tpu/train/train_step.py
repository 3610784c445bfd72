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
    loss: jnp.ndarray      # (N,)
    rate: jnp.ndarray      # (N,)
    dist: jnp.ndarray      # (N,)
    p_dist: jnp.ndarray    # (N,)
    bpp: jnp.ndarray       # (N,)
    psnr: jnp.ndarray      # (N,)
    me_psnr: jnp.ndarray   # (N,)


def _psnr(mse):
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))


def frame_loss(params, model, x, target, dpb, *, lambdas, dist_lambda,
               pl_lambda, loss_rate_keys: Sequence[str], loss_dist_key: str,
               pl_fn: Optional[Callable], noise_rng, is_first_p: bool,
               training: bool = True):
    """RD (+ optional perceptual) loss for one P-frame
    (dcvc_hem.py:199-216).

    Batch rows cycle through the rate anchors: a global batch of
    k * anchor_num rows tiles q_scale/lambda k times — the layout a k-rank
    DDP run produces in the reference (each rank's batch = len(LAMBDAS))."""
    mv_q = params["params"]["mv_y_q_scale"]
    y_q = params["params"]["y_q_scale"]
    reps = x.shape[0] // mv_q.shape[0]
    if reps > 1:
        mv_q = jnp.tile(mv_q, (reps, 1, 1, 1))
        y_q = jnp.tile(y_q, (reps, 1, 1, 1))
    if lambdas.shape[0] != x.shape[0]:
        lambdas = jnp.tile(lambdas, x.shape[0] // lambdas.shape[0])
    out = model.apply(params, x, dpb, mv_q, y_q, is_first_p,
                      training=training, noise_rng=noise_rng)

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

    aux = FrameAux(loss=loss, rate=rate, dist=dist, p_dist=p_dist,
                   bpp=out["bpp"], psnr=_psnr(out["mse"]),
                   me_psnr=_psnr(out["me_mse"]))
    return jnp.mean(loss), (aux, out["dpb"])


def make_single_frame_step(model, tx, stage, *, lambdas, dist_lambda,
                           pl_lambda, pl_fn=None, axis_name=None):
    """Jitted per-frame gradient step for the 'single' strategy.

    Returns step(params, opt_state, x, target, dpb, rng, is_first_p) ->
    (params, opt_state, aux, new_dpb). When axis_name is set, gradients are
    psum-averaged across the mesh axis (DDP-equivalent)."""

    lambdas = jnp.asarray(lambdas, jnp.float32)

    def loss_fn(params, x, target, dpb, rng, is_first_p):
        return frame_loss(
            params, model, x, target, dpb, lambdas=lambdas,
            dist_lambda=dist_lambda, pl_lambda=pl_lambda,
            loss_rate_keys=stage.loss_rate_keys,
            loss_dist_key=stage.loss_dist_key,
            pl_fn=pl_fn, noise_rng=rng, is_first_p=is_first_p)

    @partial(jax.jit, static_argnums=(6,))
    def step(params, opt_state, x, target, dpb, rng, is_first_p):
        (_, (aux, new_dpb)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, x, target, dpb, rng, is_first_p)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        new_dpb = jax.lax.stop_gradient(new_dpb)
        return params, opt_state, aux, new_dpb

    return step


def make_cascade_step(model, tx, stage, *, lambdas, dist_lambda, pl_lambda,
                      pl_fn=None, axis_name=None):
    """Jitted whole-chain gradient step for the 'cascade' strategy:
    xs/targets are (p_frames, N, H, W, C); BPTT through the DPB."""

    lambdas = jnp.asarray(lambdas, jnp.float32)
    p_frames = stage.p_frames

    def chain_loss(params, xs, targets, dpb, rng):
        losses = []
        auxes = []
        for p_idx in range(p_frames):
            rng, sub = jax.random.split(rng)
            _, (aux, dpb) = frame_loss(
                params, model, xs[p_idx], targets[p_idx], dpb,
                lambdas=lambdas, dist_lambda=dist_lambda,
                pl_lambda=pl_lambda, loss_rate_keys=stage.loss_rate_keys,
                loss_dist_key=stage.loss_dist_key, pl_fn=pl_fn,
                noise_rng=sub, is_first_p=(p_idx == 0))
            losses.append(aux.loss)
            auxes.append(aux)
        loss = jnp.mean(jnp.stack(losses))
        mean_aux = jax.tree_util.tree_map(
            lambda *xs_: jnp.mean(jnp.stack(xs_), axis=0), *auxes)
        return loss, (mean_aux, dpb)

    @jax.jit
    def step(params, opt_state, xs, targets, dpb0, rng):
        (_, (aux, dpb)), grads = jax.value_and_grad(chain_loss, has_aux=True)(
            params, xs, targets, dpb0, rng)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, aux, jax.lax.stop_gradient(dpb)

    return step


def run_single_sequence(model, step_fn, params, opt_state, inputs, targets,
                        stage, rng, i_frame_fn=None, sample_cb=None):
    """The reference's forward_single outer loops (dcvc_hem.py:160-238):
    for each subsequence start t_i, re-key the DPB and take `p_frames`
    per-frame gradient steps. inputs/targets: (N, T, H, W, C) numpy/jax."""
    n, t = inputs.shape[0], inputs.shape[1]
    p_frames = stage.p_frames
    aux_list = []
    for t_i in range(t - p_frames):
        ref = (i_frame_fn(inputs[:, t_i]) if i_frame_fn is not None
               else inputs[:, t_i])
        dpb = make_dpb(jnp.asarray(ref), model.channel_N, model.channel_M)
        for p_idx in range(p_frames):
            rng, sub = jax.random.split(rng)
            params, opt_state, aux, dpb = step_fn(
                params, opt_state, jnp.asarray(inputs[:, t_i + 1 + p_idx]),
                jnp.asarray(targets[:, t_i + 1 + p_idx]), dpb, sub,
                p_idx == 0)
            aux_list.append(aux)
            if sample_cb is not None:
                sample_cb(aux, targets[:, t_i + 1 + p_idx],
                          dpb["ref_frame"])
    return params, opt_state, aux_list


def run_cascade_sequence(model, step_fn, params, opt_state, inputs, targets,
                         stage, rng, i_frame_fn=None, sample_cb=None):
    """forward_cascade outer loop (dcvc_hem.py:380-469): one whole-chain
    gradient step per subsequence start."""
    n, t = inputs.shape[0], inputs.shape[1]
    p_frames = stage.p_frames
    aux_list = []
    for t_i in range(t - p_frames):
        ref = (i_frame_fn(inputs[:, t_i]) if i_frame_fn is not None
               else inputs[:, t_i])
        dpb = make_dpb(jnp.asarray(ref), model.channel_N, model.channel_M)
        xs = jnp.stack([jnp.asarray(inputs[:, t_i + 1 + k])
                        for k in range(p_frames)])
        ts = jnp.stack([jnp.asarray(targets[:, t_i + 1 + k])
                        for k in range(p_frames)])
        rng, sub = jax.random.split(rng)
        params, opt_state, aux, dpb = step_fn(params, opt_state, xs, ts, dpb,
                                              sub)
        aux_list.append(aux)
        if sample_cb is not None:
            sample_cb(aux, targets[:, t_i + p_frames], dpb["ref_frame"])
    return params, opt_state, aux_list
