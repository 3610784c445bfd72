"""One process of the multi-host training tests (tests/test_multihost.py).

Usage: python _multihost_worker.py <pid> <nproc> <port> <out.npz> [mode]

With nproc > 1 the process joins a jax.distributed Gloo cluster (2 virtual
CPU devices per process — the parent sets XLA_FLAGS/JAX_PLATFORMS), builds
the global mesh and runs do_train(mesh=...) on its 2-row slice of a fixed
4-row global batch. With nproc == 1 it is the single-process control: same
global batch, no mesh. Both dump the trained motion-branch kernel so the
parent can assert DDP-equivalence (reference semantics:
core/engine/train_multi.py:203-268).

mode "fsdp" (default "dp") additionally shards the weights + Adam moments
over the process-spanning "data" axis (trainer_multi --fsdp): the params
each process holds are then NOT fully addressable, and the final fetch +
do_train's epoch-end host copy go through the collective
process_allgather path in parallel/mesh.host_copy.
"""

import os
import sys


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, out_path = sys.argv[3], sys.argv[4]
    mode = sys.argv[5] if len(sys.argv) > 5 else "dp"

    import jax
    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                                   num_processes=nproc, process_id=pid)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import jax.numpy as jnp
    import numpy as np

    from vcm_ts_tpu.models.dmc import DMC, make_dpb
    from vcm_ts_tpu.parallel import mesh as pm
    from vcm_ts_tpu.train.config import default_training_cfg
    from vcm_ts_tpu.train.train_loop import do_train

    cfg = default_training_cfg()
    cfg.MODEL.CHANNELS = [16, 16, 24]
    cfg.SOLVER.LAMBDAS = [85, 170]
    cfg.DATASET.SEQUENCE_LENGTH = 2
    cfg.SOLVER.STAGES = [["1", "me", "single", "me", "none",
                          "1e-4", "1", "false"]]
    cfg.freeze()

    model = DMC(anchor_num=2, channel_mv=16, channel_N=16, channel_M=24)
    x0 = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x0, make_dpb(x0, 16, 24),
                        1.0, 1.0, method="init_all")
    init_kernel = np.asarray(
        params["params"]["optic_flow"]["moduleBasic.0"]["conv1"]["kernel"])

    # fixed 4-row global batch; a 2-process run feeds 2 rows per process
    rng = np.random.default_rng(7)
    global_inputs = rng.random((4, 2, 64, 64, 3)).astype(np.float32)
    rows_per_proc = global_inputs.shape[0] // nproc
    local = global_inputs[pid * rows_per_proc:(pid + 1) * rows_per_proc]

    class Loader:
        def __len__(self):
            return 1

        def set_epoch(self, epoch):
            pass

        def __iter__(self):
            yield local, local.copy()

    mesh = pm.make_global_mesh() if nproc > 1 else None
    params = do_train(cfg, model, params, Loader(), checkpointer=None,
                      seed=0, world_size=1, is_main=False, mesh=mesh,
                      fsdp=(mode == "fsdp"))

    # host_copy, not device_get: with mode=fsdp the trained params are
    # sharded across processes (collective allgather fetch, both call it)
    kernel = np.asarray(pm.host_copy(
        params["params"]["optic_flow"]["moduleBasic.0"]["conv1"]["kernel"]))
    np.savez(out_path, kernel=kernel, init_kernel=init_kernel)
    print(f"worker pid={pid} nproc={nproc} mode={mode} done", flush=True)


if __name__ == "__main__":
    main()
