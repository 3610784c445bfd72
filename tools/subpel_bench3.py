"""Microbench round 3: bias handling for the conv_transpose subpel form.

bench2 showed the tiled (1,r,r,c) bias-plane add costs ~2 ms at the
high-res k=1 sites (it materializes instead of fusing), flipping conv_T
from a win to a loss there. Candidates:

  a) conv+shuffle with fused bias       (current model path, baseline)
  b) conv_T + tiled bias plane          (bench2 loser at high res)
  c) conv_T with bias folded into the contraction: append a constant-1
     input channel and a [dy,dx,-1,c]=b row in the kernel — bias becomes
     part of the matmul, nothing to fuse afterwards
  d) conv_T no bias (floor)

Run on the TPU: python tools/subpel_bench3.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    r = 2
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def timeit(f, *a):
        o = f(*a)
        _ = float(jnp.sum(o[0, 0, :2, 0]).astype(jnp.float32))
        t0 = time.perf_counter()
        iters = 30
        for _ in range(iters):
            o = f(*a)
        _ = float(jnp.sum(o[0, 0, :2, 0]).astype(jnp.float32))
        return (time.perf_counter() - t0) / iters * 1e3

    cases1 = [
        ((1, 68, 120, 128), 64),
        ((1, 136, 240, 64), 64),
        ((1, 272, 480, 64), 32),
        ((1, 544, 960, 32), 16),
    ]
    for shape, cout in cases1:
        n, h, w, cin = shape
        x = jnp.asarray(rng.standard_normal(shape), dt)
        wk = jnp.asarray(rng.standard_normal(
            (1, 1, cin, cout * r * r)) * 0.1, dt)
        bk = jnp.asarray(rng.standard_normal((cout * r * r,)) * 0.1, dt)

        @jax.jit
        def a_shuffle(x, wk, bk):
            y = lax.conv_general_dilated(
                x, wk, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bk
            n_, h_, w_, _ = y.shape
            y = y.reshape(n_, h_, w_, cout, r, r)
            y = y.transpose(0, 1, 4, 2, 5, 3)
            return y.reshape(n_, h_ * r, w_ * r, cout)

        def _wt(wk):
            wt = wk.reshape(cin, cout, r, r).transpose(2, 3, 0, 1)
            return wt[::-1, ::-1]

        @jax.jit
        def b_tile(x, wk, bk):
            y = lax.conv_transpose(
                x, _wt(wk), (r, r), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            bt = bk.reshape(1, cout, r, r).transpose(0, 2, 3, 1)
            return y + jnp.tile(bt, (1, h, w, 1))

        @jax.jit
        def c_onesch(x, wk, bk):
            xa = jnp.concatenate(
                [x, jnp.ones((n, h, w, 1), dt)], axis=-1)
            wt = _wt(wk)                                   # (r,r,cin,cout)
            bt = bk.reshape(1, cout, r, r).transpose(2, 3, 0, 1)
            wa = jnp.concatenate([wt, bt[::-1, ::-1]], axis=2)
            return lax.conv_transpose(
                xa, wa, (r, r), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        @jax.jit
        def d_nobias(x, wk, bk):
            return lax.conv_transpose(
                x, _wt(wk), (r, r), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        t_a = timeit(a_shuffle, x, wk, bk)
        t_b = timeit(b_tile, x, wk, bk)
        t_c = timeit(c_onesch, x, wk, bk)
        t_d = timeit(d_nobias, x, wk, bk)
        ya = np.asarray(a_shuffle(x, wk, bk), np.float32)
        yc = np.asarray(c_onesch(x, wk, bk), np.float32)
        err = np.max(np.abs(ya - yc)) / max(np.max(np.abs(ya)), 1e-9)
        print(f"{shape}->{cout}: shuffle {t_a:.3f} | tile {t_b:.3f} | "
              f"ones-ch {t_c:.3f} | nobias {t_d:.3f} ms | c rel_err "
              f"{err:.2e}", flush=True)


if __name__ == "__main__":
    main()
