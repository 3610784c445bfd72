"""DCVC_HEM — API-parity convenience wrapper over the functional core.

Mirrors the reference model wrapper (core/model/dcvc_hem.py:10-631): one
object owning the DMC, the lambda vectors, the perceptual loss, and the
string-dispatched forward methods ('single', 'single_multi', 'cascade',
'cascade_multi', 'forward_simple'). Internally everything delegates to the
pure train-step functions (train/train_step.py); this class just carries
(params, opt_state) so imperative training code reads like the reference.

The reference mutates requires_grad via activate_modules_*; here the same
five activation methods swap the optax freeze mask (rebuilding the
optimizer, like the DDP reference does at stage boundaries).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..train.optimizer import make_stage_optimizer
from ..train.stages import StageParams
from ..train.train_step import (frame_loss, make_cascade_step,
                                make_single_frame_step, run_cascade_sequence,
                                run_single_sequence)
from .dmc import DMC, make_dpb


class DCVC_HEM:
    def __init__(self, cfg, params=None, pl_fn=None, rng=None):
        self.cfg = cfg
        cmv, cn, cm = cfg.MODEL.CHANNELS
        self.dmc = DMC(anchor_num=len(cfg.SOLVER.LAMBDAS), channel_mv=cmv,
                       channel_N=cn, channel_M=cm)
        self.lambdas = [float(v) for v in cfg.SOLVER.LAMBDAS]
        self.pl_lambda = float(cfg.SOLVER.PL_LAMBDA)
        self.dist_lambda = float(cfg.SOLVER.DIST_LAMBDA)
        self.perceptual_loss = pl_fn
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if params is None:
            x0 = jnp.zeros((1, 64, 64, 3))
            params = self.dmc.init(rng, x0, make_dpb(x0, cn, cm), 1.0, 1.0,
                                   method="init_all")
        self.params = params
        self._mode = "all"
        self._lr = float(cfg.SOLVER.LR)
        self._tx = self._opt_state = None
        self._step_cache = {}
        self._noise_rng = jax.random.PRNGKey(1)

    # ------------------------------------------------- module activation
    def _activate(self, mode: str):
        if mode != self._mode or self._tx is None:
            self._mode = mode
            self._tx, self._opt_state = make_stage_optimizer(
                self.params, mode, self._lr)
            self._step_cache.clear()

    def activate_modules_inter_dist(self):
        self._activate("inter_dist")

    def activate_modules_inter_dist_rate(self):
        self._activate("inter_dist_rate")

    def activate_modules_recon_dist(self):
        self._activate("recon_dist")

    def activate_modules_recon_dist_rate(self):
        self._activate("recon_dist_rate")

    def activate_modules_all(self):
        self._activate("all")

    def set_lr(self, lr: float):
        if lr != self._lr:
            self._lr = lr
            self._tx = None
            self._activate(self._mode)

    # ------------------------------------------------------------ dispatch
    def forward(self, forward_method: str, input, target=None,
                loss_dist_key: Optional[str] = None,
                loss_rate_keys: Optional[Sequence[str]] = None,
                p_frames: Optional[int] = None,
                perceptual_loss: Optional[bool] = None,
                is_train: bool = True, dpb=None, t_i=None,
                i_frame_net=None, i_frame_q_scales=None,
                is_first_p: bool = True):
        """(dcvc_hem.py:605-631). For the *_multi variants the caller owns
        the DPB chaining, so it must pass is_first_p=False for frames whose
        DPB came from a previous P-frame (the reference infers this from
        ref_feature being None)."""
        if forward_method == "single":
            return self._run("single", input, target, loss_dist_key,
                             loss_rate_keys, p_frames, perceptual_loss,
                             is_train, i_frame_net)
        if forward_method == "cascade":
            return self._run("cascade", input, target, loss_dist_key,
                             loss_rate_keys, p_frames, perceptual_loss,
                             is_train, i_frame_net)
        if forward_method in ("single_multi", "cascade_multi"):
            return self._frame_losses(input, target, loss_dist_key,
                                      loss_rate_keys, dpb, perceptual_loss,
                                      forward_method, p_frames, t_i,
                                      is_first_p)
        if forward_method == "forward_simple":
            return self.forward_simple(input, dpb, is_first_p=is_first_p)
        raise ValueError(f"unknown forward method: {forward_method}")

    __call__ = forward

    def _stage(self, method, dist_key, rate_keys, p_frames, pl):
        return StageParams(stage=0, p_frames=p_frames or 1,
                           trainable_mode=self._mode,
                           forward_method=method,
                           loss_dist_key=dist_key or "mse",
                           loss_rate_keys=tuple(rate_keys or ()),
                           lr=self._lr, perceptual_loss=bool(pl))

    def _run(self, method, inputs, targets, dist_key, rate_keys, p_frames,
             pl, is_train, i_frame_fn):
        if not is_train:
            return self._run_eval(method, inputs, targets, dist_key,
                                  rate_keys, p_frames, pl, i_frame_fn)
        self._activate(self._mode)
        stage = self._stage(method, dist_key, rate_keys, p_frames, pl)
        key = (method, stage.loss_dist_key, stage.loss_rate_keys,
               stage.p_frames, bool(pl))
        if key not in self._step_cache:
            maker = (make_single_frame_step if method == "single"
                     else make_cascade_step)
            self._step_cache[key] = maker(
                self.dmc, self._tx, stage, lambdas=self.lambdas,
                dist_lambda=self.dist_lambda, pl_lambda=self.pl_lambda,
                pl_fn=self.perceptual_loss if pl else None)
        step = self._step_cache[key]
        runner = (run_single_sequence if method == "single"
                  else run_cascade_sequence)
        self._noise_rng, sub = jax.random.split(self._noise_rng)
        params, opt_state, aux_list = runner(
            self.dmc, step, self.params, self._opt_state, np.asarray(inputs),
            np.asarray(targets), stage, sub, i_frame_fn=i_frame_fn)
        self.params, self._opt_state = params, opt_state
        return {
            "rate": np.stack([np.asarray(a.rate) for a in aux_list], -1),
            "dist": np.stack([np.asarray(a.dist) for a in aux_list], -1),
            "p_dist": np.stack([np.asarray(a.p_dist) for a in aux_list], -1),
            "loss": np.stack([np.asarray(a.loss) for a in aux_list], -1),
            "single_forwards": len(aux_list),
        }

    def _run_eval(self, method, inputs, targets, dist_key, rate_keys,
                  p_frames, pl, i_frame_fn):
        """Eval path: hard-rounding quantization, no gradients, no optimizer
        (reference is_train=False semantics)."""
        from functools import partial

        stage = self._stage(method, dist_key, rate_keys, p_frames, pl)
        key = ("eval", stage.loss_dist_key, stage.loss_rate_keys, bool(pl))
        if key not in self._step_cache:
            @partial(jax.jit, static_argnums=(4,))
            def eval_frame(params, x, target, dpb, is_first_p):
                return frame_loss(
                    params, self.dmc, x, target, dpb,
                    lambdas=jnp.asarray(self.lambdas, jnp.float32),
                    dist_lambda=self.dist_lambda, pl_lambda=self.pl_lambda,
                    loss_rate_keys=stage.loss_rate_keys,
                    loss_dist_key=stage.loss_dist_key,
                    pl_fn=self.perceptual_loss if pl else None,
                    noise_rng=None, is_first_p=is_first_p, training=False)
            self._step_cache[key] = eval_frame
        eval_frame = self._step_cache[key]

        inputs = np.asarray(inputs)
        targets = np.asarray(targets)
        t = inputs.shape[1]
        pf = stage.p_frames
        aux_list = []
        for t_i in range(t - pf):
            ref = (i_frame_fn(inputs[:, t_i]) if i_frame_fn is not None
                   else inputs[:, t_i])
            dpb = make_dpb(jnp.asarray(ref), self.dmc.channel_N,
                           self.dmc.channel_M)
            for p_idx in range(pf):
                _, (aux, dpb) = eval_frame(
                    self.params, jnp.asarray(inputs[:, t_i + 1 + p_idx]),
                    jnp.asarray(targets[:, t_i + 1 + p_idx]), dpb,
                    p_idx == 0)
                aux_list.append(aux)
        return {
            "rate": np.stack([np.asarray(a.rate) for a in aux_list], -1),
            "dist": np.stack([np.asarray(a.dist) for a in aux_list], -1),
            "p_dist": np.stack([np.asarray(a.p_dist) for a in aux_list], -1),
            "loss": np.stack([np.asarray(a.loss) for a in aux_list], -1),
            "single_forwards": len(aux_list),
        }

    def _frame_losses(self, inputs, targets, dist_key, rate_keys, dpb, pl,
                      method, p_frames, t_i, is_first_p=True):
        """*_multi variants: loss only, optimizer stepping stays external
        (reference train_multi.py:203-268)."""
        stage = self._stage(method, dist_key, rate_keys, p_frames, pl)
        self._noise_rng, sub = jax.random.split(self._noise_rng)
        if method == "single_multi":
            _, (aux, new_dpb) = frame_loss(
                self.params, self.dmc, jnp.asarray(inputs),
                jnp.asarray(targets), dpb,
                lambdas=jnp.asarray(self.lambdas, jnp.float32),
                dist_lambda=self.dist_lambda, pl_lambda=self.pl_lambda,
                loss_rate_keys=stage.loss_rate_keys,
                loss_dist_key=stage.loss_dist_key,
                pl_fn=self.perceptual_loss if pl else None,
                noise_rng=sub, is_first_p=is_first_p)
            return {"loss": aux.loss,
                    "loss_to_opt": jnp.mean(aux.loss),
                    "rate": aux.rate, "dist": aux.dist, "p_dist": aux.p_dist,
                    "dpb": jax.lax.stop_gradient(new_dpb)}
        # cascade_multi: averaged chain loss from frame t_i
        xs = jnp.asarray(inputs)
        ts = jnp.asarray(targets)
        t_i = t_i or 0
        losses, rates, dists, p_dists = [], [], [], []
        cur = dpb
        for p_idx in range(stage.p_frames):
            sub, self._noise_rng = jax.random.split(self._noise_rng)
            _, (aux, cur) = frame_loss(
                self.params, self.dmc, xs[:, t_i + 1 + p_idx],
                ts[:, t_i + 1 + p_idx], cur,
                lambdas=jnp.asarray(self.lambdas, jnp.float32),
                dist_lambda=self.dist_lambda, pl_lambda=self.pl_lambda,
                loss_rate_keys=stage.loss_rate_keys,
                loss_dist_key=stage.loss_dist_key,
                pl_fn=self.perceptual_loss if pl else None,
                noise_rng=sub, is_first_p=(p_idx == 0))
            losses.append(aux.loss)
            rates.append(aux.rate)
            dists.append(aux.dist)
            p_dists.append(aux.p_dist)
        loss = jnp.mean(jnp.stack(losses, -1), -1)
        return {"loss": loss, "loss_to_opt": jnp.mean(loss),
                "rate": jnp.mean(jnp.stack(rates, -1), -1),
                "dist": jnp.mean(jnp.stack(dists, -1), -1),
                "p_dist": jnp.mean(jnp.stack(p_dists, -1), -1),
                "dpb": cur}

    def forward_simple(self, inputs, dpbs, is_first_p=False):
        """Per-rate DPB chaining (dcvc_hem.py:589-603): inputs (N, H, W, C),
        dpbs a list of per-rate DPBs.

        is_first_p must be True for the first chained P-frame after a GOP
        rekey: the reference infers the I-frame feature adaptor from
        `ref_feature is None` (video_model.py:226-231); our dense DPB makes
        that state explicit via the flag.
        """
        mv_qs = self.params["params"]["mv_y_q_scale"]
        y_qs = self.params["params"]["y_q_scale"]
        out = []
        for i, dpb in enumerate(dpbs):
            res = self.dmc.apply(self.params, jnp.asarray(inputs[i:i + 1]),
                                 dpb, mv_qs[i:i + 1], y_qs[i:i + 1],
                                 is_first_p, training=False)
            out.append(res["dpb"])
        return out
