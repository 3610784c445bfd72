"""Sweep XLA compiler options on the full 1080p DMC forward.

The round-2 trace says ~245 ms of the 402 ms bf16 frame is layout copies,
unfused elementwise, and pad/reshape — all XLA-internal scheduling and
fusion decisions. The one documented-but-untried lever is the scoped VMEM
limit (the Pallas probe showed ~120 MB usable vs the default ~16 MB);
a larger scratch budget lets the fusion pass build deeper kernels instead
of spilling intermediates to HBM. Also probes the exec-time optimization
effort knob.

Variants compile on parallel threads (compilation is a server-side RPC
that releases the GIL) and are timed sequentially on the chip.

Run: python tools/flag_sweep.py [--frames 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = [
    ("baseline", {}),
    ("vmem64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem112m", {"xla_tpu_scoped_vmem_limit_kib": "114688"}),
    ("effort", {"xla_exec_time_optimization_effort": "0.7"}),
    ("vmem64m+effort", {"xla_tpu_scoped_vmem_limit_kib": "65536",
                        "xla_exec_time_optimization_effort": "0.7"}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--size", default="1088x1920")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vcm_ts_tpu.models.dmc import DMC, make_dpb
    from vcm_ts_tpu.utils.common import enable_compilation_cache

    enable_compilation_cache()

    h, w = (int(v) for v in args.size.split("x"))
    model = DMC(anchor_num=4)
    x0 = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x0, make_dpb(x0), 1.0, 1.0,
                        method="init_all")
    params = jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16)
        if v.dtype == jnp.float32 else v, params)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, h, w, 3)), jnp.bfloat16)
    dpb = make_dpb(x)

    fwd = jax.jit(
        lambda p, x, dpb: model.apply(p, x, dpb, 0.7, 0.7, False))
    lowered = fwd.lower(params, x, dpb)

    compiled = {}
    errors = {}

    def compile_variant(name, opts):
        t0 = time.perf_counter()
        try:
            c = lowered.compile(compiler_options=opts or None)
            compiled[name] = c
            print(f"[compile] {name}: {time.perf_counter()-t0:.0f}s",
                  flush=True)
        except Exception as e:  # unknown flag, service error
            errors[name] = str(e)[:200]
            print(f"[compile] {name}: FAILED {str(e)[:200]}", flush=True)

    threads = [threading.Thread(target=compile_variant, args=(n, o))
               for n, o in VARIANTS]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    def force(out):
        return float(jnp.sum(out["dpb"]["ref_frame"][0, 0, :2, 0]
                             ).astype(jnp.float32))

    for name, _ in VARIANTS:
        c = compiled.get(name)
        if c is None:
            continue
        out = c(params, x, dpb)
        force(out)
        t0 = time.perf_counter()
        cur = dpb
        for _ in range(args.frames):
            out = c(params, x, cur)
            cur = out["dpb"]
        force(out)
        dt = (time.perf_counter() - t0) / args.frames * 1e3
        print(f"[run] {name}: {dt:.1f} ms/frame ({1e3/dt:.3f} fps)",
              flush=True)


if __name__ == "__main__":
    main()
