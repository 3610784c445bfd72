"""Device-mesh utilities: the TPU-native replacement for the reference's
NCCL/torch.distributed layer (trainer_multi.py:16-39, core/utils/dist_util.py).

Data-parallel training runs the *same* jitted train step as single-device
training, with the global batch sharded over the mesh's "data" axis and
parameters replicated; XLA inserts the gradient all-reduce over ICI. No
explicit collectives are needed in the step itself — psum falls out of
differentiating a mean over a sharded batch against replicated params.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed():
    """Multi-host bring-up (reference init_distributed, trainer_multi.py:16-39).
    Safe no-op in single-process runs."""
    try:
        jax.distributed.initialize()
    except (ValueError, RuntimeError):
        pass  # single-process / already initialized


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def synchronize():
    """Barrier (dist_util.py:24-36 equivalent)."""
    if get_world_size() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("vcm_ts_tpu_barrier")


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_global_mesh(axis: str = "data") -> Mesh:
    """Mesh over ALL devices of ALL processes — the multi-host DP mesh.

    Must be built identically on every process (jax.devices() already
    returns the globally-consistent device list after
    jax.distributed.initialize)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def make_global_dp_tp_mesh(n_model: int, data_axis: str = "data",
                           model_axis: str = "model") -> Mesh:
    """Global 2D (data, model) mesh for TP training (trainer_multi --tp).

    The model axis is the minor (fastest-varying) dim and must fit inside
    one process's devices: jax.devices() orders process-major, so each
    model group then lands on one host's local ICI neighbours — TP
    collectives never cross DCN, and every weight shard stays addressable
    for rank-local checkpoint fetches."""
    n_local = len(jax.local_devices())
    if n_local % n_model != 0:
        raise ValueError(
            f"--tp {n_model} must divide the local device count {n_local} "
            f"(the model axis is intra-process by design)")
    devices = np.asarray(jax.devices())
    return Mesh(devices.reshape(-1, n_model), (data_axis, model_axis))


def global_batch(local, mesh: Mesh, axis: str = "data", batch_dim: int = 0):
    """Assemble per-process local batches into one global jax.Array sharded
    over `axis` (row-concatenated in process order) — the TPU-native
    equivalent of DistributedSampler + DDP's implicit scatter
    (core/data/__init__.py:26, train_multi.py:203-268).

    Every process passes its own local rows; the result is a single global
    array the jitted train step consumes; XLA derives the gradient
    all-reduce from the mean-loss structure. batch_dim selects which array
    dimension is the sharded batch axis (cascade chains use dim 1)."""
    spec = P(*([None] * batch_dim + [axis]))
    sh = NamedSharding(mesh, spec)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        local)


def host_copy(tree):
    """Fetch global arrays to host numpy (for rank-0-only eval/
    checkpointing, the reference's rank-0 .module unwrap).

    Fully-replicated process-spanning arrays (DP params) fetch directly;
    sharded ones (TP params/moments on a data×model mesh, sharded batches)
    are assembled via a cross-process allgather first — device_get alone
    cannot read shards living on another process's devices."""
    def fetch(x):
        if (isinstance(x, jax.Array) and not x.is_fully_addressable
                and not x.is_fully_replicated):
            from jax.experimental import multihost_utils
            return np.asarray(multihost_utils.process_allgather(
                x, tiled=True))
        return np.asarray(jax.device_get(x))

    return jax.tree_util.tree_map(fetch, tree)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _private_put(x, sh):
    """device_put onto `sh` with NO buffer aliasing back to `x`.

    jax.device_put is zero-copy where it can be: shards that already live
    on the right device reuse the source buffer. The sharded trees built
    here are fed to train steps that DONATE them (train/train_step.py), and
    donating an aliased buffer deletes it out from under the caller's
    original tree ("Array has been deleted"). An on-device jnp.copy breaks
    the alias; numpy/python leaves already copy on transfer."""
    import jax.numpy as jnp

    if isinstance(x, jax.Array):
        x = jnp.copy(x)
    return jax.device_put(x, sh)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put an NHWC (or any leading-batch) pytree sharded over `axis`."""
    sh = data_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: _private_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: _private_put(x, sh), tree)


def all_gather_metrics(tree):
    """Cross-process metric gather (reference's dist.gather_object x6,
    train_multi.py:456-494). Single-process: identity."""
    if get_world_size() == 1:
        return tree
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(tree)
