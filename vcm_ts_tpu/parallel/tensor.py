"""Tensor (channel-axis) parallelism via GSPMD weight sharding.

A capability beyond the reference (which only has DDP data parallelism,
train_multi.py:16-39): shard every weight's output-channel dimension over
a "model" mesh axis and let GSPMD partition the convolutions — each device
computes its slice of output channels, with XLA inserting the activation
all-gathers / partial-contraction psums over ICI. Numerics match the
unsharded forward up to f32 reassociation: layer N's sharded output
channels are layer N+1's input channels, and GSPMD may contract the local
Cin slice first and psum across devices, reassociating the reduction
(same noise class as any cross-device reduction; see the SP test's
damped-kernel comparison recipe, tests/test_multichip.py).

What this buys on TPU:
- parameter + optimizer memory scale down ~1/n_model per chip (the
  reference-width DMC is small, but the IntraNoAR + perceptual backbones
  together stress a single chip at training time);
- composes with data parallelism on a 2D (data, model) mesh: the global
  batch shards over "data" while every weight shards over "model", the
  canonical GSPMD layout from the scaling-book recipe.

Channel dims that don't divide the mesh (RGB heads, anchor tables) stay
replicated; GSPMD reshards around them. Usage:

    mesh = make_tp_mesh(4)                        # 1D TP
    p = shard_params_tp(params, mesh)
    out = tp_forward(model, mesh)(p, x, dpb, mv_q, y_q)

    mesh = make_dp_tp_mesh(2, 4)                  # 2D DP x TP training
    p = shard_params_tp(params, mesh)
    x = pm.shard_batch(x, mesh)                   # "data" axis

Every helper is axis-parametric, which also gives FSDP/ZeRO-style
fully-sharded data parallelism for free (trainer_multi --fsdp): shard
weights + Adam moments over the SAME "data" axis the batch shards over
(`shard_params_tp(params, mesh, axis="data")`), and GSPMD inserts the
per-layer weight all-gathers in forward/backward and keeps gradients +
optimizer math sharded — parameter/optimizer memory drops ~1/n_data per
chip while the step stays numerically a data-parallel step (the ZeRO-3
recipe from the scaling-book: same math, sharded state).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_tp_mesh(n_devices: Optional[int] = None, axis: str = "model") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_dp_tp_mesh(n_data: int, n_model: int,
                    data_axis: str = "data",
                    model_axis: str = "model") -> Mesh:
    """2D (data, model) mesh over the first n_data*n_model devices.

    The model axis is the minor (fastest-varying) dimension so TP
    collectives ride the tightest ICI neighbours on a real slice.
    """
    devices = np.asarray(jax.devices()[: n_data * n_model])
    return Mesh(devices.reshape(n_data, n_model), (data_axis, model_axis))


def tp_spec(shape, n_model: int, axis: str = "model") -> P:
    """PartitionSpec sharding the last (output-channel) dim over `axis`.

    Replicated when the dim doesn't divide the mesh — RGB output heads
    (3), anchor-count tables, and the odd narrow head stay whole; GSPMD
    inserts the reshards around them.
    """
    if len(shape) == 0 or shape[-1] % n_model != 0 or shape[-1] < n_model:
        return P()
    return P(*([None] * (len(shape) - 1) + [axis]))


def shard_params_tp(tree, mesh: Mesh, axis: str = "model"):
    """device_put every leaf with its TP spec (params OR optimizer state:
    the spec depends only on leaf shape, and optax's mu/nu mirror the
    param shapes, so the same mapping distributes the Adam moments)."""
    n = mesh.shape[axis]

    from .mesh import _private_put

    def put(x):
        # _private_put: the result is donate-safe — no buffer aliasing back
        # to `tree` (see parallel/mesh.py)
        return _private_put(x, NamedSharding(mesh, tp_spec(x.shape, n, axis)))

    return jax.tree_util.tree_map(put, tree)


def constrain_tp(tree, mesh: Mesh, axis: str = "model"):
    """with_sharding_constraint every leaf to its TP spec (for use INSIDE a
    jitted step, on its outputs). Without this, the updated params/moments
    a train step returns carry whatever layout GSPMD chose for them — e.g.
    an input-channel split on a head whose output channels don't divide the
    mesh — and the next step call recompiles for the drifted layout. The
    constraint pins the canonical TP layout across the whole run."""
    n = mesh.shape[axis]

    def pin(x):
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, tp_spec(x.shape, n, axis)))

    return jax.tree_util.tree_map(pin, tree)


def replicate(tree, mesh: Mesh):
    # delegate: mesh.replicate's _private_put never aliases the source
    # buffers, so the result is safe to hand to the donating train steps
    from . import mesh as _mesh

    return _mesh.replicate(tree, mesh)


def tp_forward(model, mesh: Mesh, is_first_p: bool = False):
    """Jitted per-frame forward with channel-sharded weights.

    Shardings come from the committed inputs (params TP-sharded, frame +
    DPB replicated); GSPMD propagates the channel partitioning through the
    conv stack and gathers the 3-channel reconstruction at the end.
    """

    @jax.jit
    def fwd(params, x, dpb, mv_q, y_q):
        return model.apply(params, x, dpb, mv_q, y_q, is_first_p,
                           training=False)

    return fwd


def assert_params_sharded(tree, mesh: Mesh, axis: str = "model") -> int:
    """Sanity check that TP actually distributed the weights: returns the
    number of leaves whose per-device shard is smaller than the leaf.
    Raises if none are (e.g. a 1-device mesh was passed by mistake)."""
    n = mesh.shape[axis]
    sharded = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        shard_shape = leaf.sharding.shard_shape(leaf.shape)
        if shard_shape != leaf.shape:
            sharded += 1
            assert shard_shape[-1] * n == leaf.shape[-1], (
                leaf.shape, shard_shape)
    assert sharded > 0, f"no leaf is sharded over '{axis}' (mesh {mesh.shape})"
    return sharded
