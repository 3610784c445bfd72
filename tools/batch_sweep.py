"""Batch-axis throughput sweep at 1080p bf16 on the real chip (round-3
VERDICT item 1 groundwork): aggregate fps for N independent streams
through one batched forward."""
import time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from vcm_ts_tpu.models.dmc import DMC, make_dpb

h, w = 1088, 1920
ns = [int(v) for v in (sys.argv[1:] or ["1", "2", "4"])]
model = DMC(anchor_num=4)
x0 = jnp.zeros((1, 64, 64, 3))
params = model.init(jax.random.PRNGKey(0), x0, make_dpb(x0), 1.0, 1.0, method="init_all")
params = jax.tree_util.tree_map(
    lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v, params)

fwd = jax.jit(lambda p, x, dpb, first: model.apply(p, x, dpb, 0.7, 0.7, first),
              static_argnums=(3,))
rng = np.random.default_rng(0)

for n in ns:
    try:
        frames = jnp.asarray(rng.random((n, h, w, 3)), jnp.bfloat16)
        dpb = make_dpb(frames)
        out = fwd(params, frames, dpb, False)
        _ = float(jnp.sum(out["dpb"]["ref_frame"][0, 0, :2, 0]))  # force
        t0 = time.perf_counter()
        iters = 6
        cur = dpb
        for i in range(iters):
            out = fwd(params, frames, cur, False)
            cur = out["dpb"]
        _ = float(jnp.sum(cur["ref_frame"][0, 0, :2, 0]))
        dt = (time.perf_counter() - t0) / iters
        print(f"n={n}: {dt*1000:.1f} ms/step, {n/dt:.3f} frames/s aggregate", flush=True)
    except Exception as e:
        print(f"n={n}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        break
