"""Spatial-axis sharding for multi-chip single-stream inference.

A capability beyond the reference (which only has data parallelism): shard
the frame's H axis across a mesh and jit the per-frame forward with GSPMD —
XLA inserts conv halo exchanges and the collectives the global ops (warp
gathers, spatial priors) need, riding ICI. This scales single-stream 1080p
latency across chips, which batching cannot (the DPB recurrence serializes
frames).

Usage:
    mesh = make_spatial_mesh(4)
    fwd = spatial_forward(model, mesh)
    out = fwd(replicate(params, mesh), shard_spatial(x, mesh),
              shard_spatial_dpb(dpb, mesh), mv_q, y_q)
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_spatial_mesh(n_devices: Optional[int] = None,
                      axis: str = "spatial") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def spatial_sharding(mesh: Mesh, axis: str = "spatial") -> NamedSharding:
    """NHWC arrays sharded along H (axis 1)."""
    return NamedSharding(mesh, P(None, axis))


def shard_spatial(x, mesh: Mesh, axis: str = "spatial"):
    return jax.device_put(x, spatial_sharding(mesh, axis))


def shard_spatial_dpb(dpb: dict, mesh: Mesh, axis: str = "spatial") -> dict:
    """Shard each DPB plane along H when divisible by the mesh; planes too
    small to split (e.g. 1/16-res latents on a large mesh) stay replicated —
    GSPMD reshards them internally as needed."""
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names if a == axis]))
    sh = spatial_sharding(mesh, axis)
    rep = NamedSharding(mesh, P())
    return {k: jax.device_put(v, sh if v.shape[1] % n == 0 else rep)
            for k, v in dpb.items()}


def replicate(tree, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda v: jax.device_put(v, sh), tree)


def spatial_forward(model, mesh: Mesh, axis: str = "spatial",
                    is_first_p: bool = False):
    """Jitted per-frame forward with H-sharded activations.

    Inputs/outputs keep their shardings (x and the DPB along H, params
    replicated); GSPMD decides the internal partitioning — convolutions get
    halo exchanges, the warp's global gather and the full-frame reductions
    get the necessary collectives.
    """
    # shardings are taken from the (committed) inputs; GSPMD propagates
    @jax.jit
    def fwd(params, x, dpb, mv_q, y_q):
        return model.apply(params, x, dpb, mv_q, y_q, is_first_p,
                           training=False)

    return fwd
