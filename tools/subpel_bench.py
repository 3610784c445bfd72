"""Microbench: subpel upsampling variants at the DMC's real shapes.

The round-2 trace attributes ~100 ms/frame to layout copies, much of it
around pixel-shuffle (depth-to-space) relayouts. Three mathematically
equivalent formulations are timed on the chip:

  a) conv(k=1 -> C*r^2) + reshape/transpose pixel shuffle  (current)
  b) lax.conv_transpose with the shuffled kernel (stride r, kernel r x r
     for the k=1 case) — no reshape/transpose in the graph
  c) conv + jax.lax reshape-free shuffle via strided dynamic-update (worst
     case control)

For k=1, (b) is EXACTLY (a): out[r*i+dy, r*j+dx, c] =
sum_ci x[i,j,ci] * W[0,0,ci, c*r*r + dy*r + dx], i.e. a stride-r
transposed conv whose (dy,dx) kernel tap is the corresponding output
channel slice of W. The DMC hits this path in every
ResidualBlockUpsample (ops/layers.py:133-146) — recon UNets, mv decoder,
contextual decoder.

Run on the TPU: python tools/subpel_bench.py
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
    # (shape, cout) pairs taken from the 1080p DMC decode path
    cases = [
        ((1, 68, 120, 128), 64),    # ctx decoder up1 (1/16 -> 1/8)
        ((1, 136, 240, 64), 64),    # ctx decoder up2 (1/8 -> 1/4)
        ((1, 272, 480, 64), 32),    # recon unet up
        ((1, 544, 960, 32), 16),    # near-full-res up
    ]
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def timeit(f, *a):
        o = f(*a)
        _ = float(jnp.sum(o[0, 0, :2, 0]).astype(jnp.float32))
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            o = f(*a)
        _ = float(jnp.sum(o[0, 0, :2, 0]).astype(jnp.float32))
        return (time.perf_counter() - t0) / iters * 1e3

    for shape, cout in cases:
        n, h, w, cin = shape
        x = jnp.asarray(rng.standard_normal(shape), dt)
        wk = jnp.asarray(rng.standard_normal(
            (1, 1, cin, cout * r * r)) * 0.1, dt)

        @jax.jit
        def shuffle_way(x, wk):
            y = lax.conv_general_dilated(
                x, wk, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            n_, h_, w_, _ = y.shape
            y = y.reshape(n_, h_, w_, cout, r, r)
            y = y.transpose(0, 1, 4, 2, 5, 3)
            return y.reshape(n_, h_ * r, w_ * r, cout)

        @jax.jit
        def transpose_way(x, wk):
            # scatter W[0,0,ci, c*r*r + dy*r + dx] -> Wt[dy, dx, ci, c]
            wt = wk.reshape(1, 1, cin, cout, r, r)
            wt = wt.transpose(4, 5, 2, 3, 0, 1).reshape(r, r, cin, cout)
            return lax.conv_transpose(
                x, wt, (r, r), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        t_a = timeit(shuffle_way, x, wk)
        t_b = timeit(transpose_way, x, wk)
        # numeric identity check (bf16-exact: same products, same sums)
        ya = np.asarray(shuffle_way(x, wk), np.float32)
        yb = np.asarray(transpose_way(x, wk), np.float32)
        exact = np.array_equal(ya, yb)
        close = np.allclose(ya, yb, rtol=2e-2, atol=1e-2)
        print(f"{shape}->{cout}: shuffle {t_a:.3f} ms | conv_T {t_b:.3f} ms"
              f" | bitexact={exact} close={close}", flush=True)


if __name__ == "__main__":
    main()
