"""Microbench round 2: CORRECT conv_transpose formulations of subpel conv.

tools/subpel_bench.py measured conv_transpose 1.2-2.3x faster than
conv+pixel-shuffle at the DMC's k=1 sites but with a wrong kernel
permutation. Brute force established the correct mapping: rearrange
W[0,0,ci,c*r*r+dy*r+dx] -> Wt[dy,dx,ci,c], flip both spatial dims,
conv_transpose(stride r, VALID, transpose_kernel=False).

k=3/r=2 case (SubpelConv kernel=3 in context fusion + recon up-chain):
conv3x3(SAME) + shuffle == stride-2 transposed conv with a dense 6x6
kernel Wt6[a,b,ci,c] = W[di+1,dj+1,ci,c*4+dy*2+dx] with a=dy-2*di+2,
b=dx-2*dj+2, cropped [2:2H+2] from the VALID output.

Positional bias (b[c*r*r+dy*r+dx] varies per subpixel) is applied as a
tiled (1,r,r,c) plane add — fuses into the conv consumer, no relayout.

Run on the TPU: python tools/subpel_bench2.py
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
        iters = 20
        for _ in range(iters):
            o = f(*a)
        _ = float(jnp.sum(o[0, 0, :2, 0]).astype(jnp.float32))
        return (time.perf_counter() - t0) / iters * 1e3

    def report(tag, shape, cout, t_a, t_b, ya, yb):
        err = np.max(np.abs(ya - yb)) / max(np.max(np.abs(ya)), 1e-9)
        print(f"{tag} {shape}->{cout}: shuffle {t_a:.3f} ms | "
              f"conv_T {t_b:.3f} ms | rel_err {err:.2e}", flush=True)

    # ---- k=1 sites (ResidualBlockUpsample etc.)
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
        def shuffle_way(x, wk, bk):
            y = lax.conv_general_dilated(
                x, wk, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bk
            n_, h_, w_, _ = y.shape
            y = y.reshape(n_, h_, w_, cout, r, r)
            y = y.transpose(0, 1, 4, 2, 5, 3)
            return y.reshape(n_, h_ * r, w_ * r, cout)

        @jax.jit
        def transpose_way(x, wk, bk):
            wt = wk.reshape(cin, cout, r, r).transpose(2, 3, 0, 1)
            wt = wt[::-1, ::-1]
            y = lax.conv_transpose(
                x, wt, (r, r), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            bt = bk.reshape(1, cout, r, r).transpose(0, 2, 3, 1)
            return y + jnp.tile(bt, (1, h, w, 1))

        t_a = timeit(shuffle_way, x, wk, bk)
        t_b = timeit(transpose_way, x, wk, bk)
        ya = np.asarray(shuffle_way(x, wk, bk), np.float32)
        yb = np.asarray(transpose_way(x, wk, bk), np.float32)
        report("k1", shape, cout, t_a, t_b, ya, yb)

    # ---- k=3 sites (context fusion c3_up/c2_up, recon up1-4)
    cases3 = [
        ((1, 136, 240, 64), 64),   # c3_up 1/8 -> 1/4
        ((1, 272, 480, 96), 64),   # c2_up at 1/4 (cat of 64+32)
        ((1, 272, 480, 64), 64),   # recon up chain mid
        ((1, 544, 960, 64), 32),   # recon near-full-res
    ]
    k = 3
    for shape, cout in cases3:
        n, h, w, cin = shape
        x = jnp.asarray(rng.standard_normal(shape), dt)
        wk = jnp.asarray(rng.standard_normal(
            (k, k, cin, cout * r * r)) * 0.1, dt)
        bk = jnp.asarray(rng.standard_normal((cout * r * r,)) * 0.1, dt)

        @jax.jit
        def shuffle_way3(x, wk, bk):
            y = lax.conv_general_dilated(
                x, wk, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bk
            n_, h_, w_, _ = y.shape
            y = y.reshape(n_, h_, w_, cout, r, r)
            y = y.transpose(0, 1, 4, 2, 5, 3)
            return y.reshape(n_, h_ * r, w_ * r, cout)

        @jax.jit
        def transpose_way3(x, wk, bk):
            # Wt6[a,b,ci,c] = W[di+1,dj+1,ci,c*4+dy*2+dx],
            # a = dy-2*di+2, b = dx-2*dj+2
            w6 = wk.reshape(k, k, cin, cout, r, r)
            # index [di+1, dj+1, ci, c, dy, dx] -> [a, b, ci, c]
            # with a = dy - 2*di + 2 (unique (dy,di) per a), same for b
            rows = []
            for a in range(6):
                dy = a % 2
                di = (dy - (a - 2)) // 2
                cols = []
                for b in range(6):
                    dx = b % 2
                    dj = (dx - (b - 2)) // 2
                    cols.append(w6[di + 1, dj + 1, :, :, dy, dx])
                rows.append(jnp.stack(cols, 0))
            wt6 = jnp.stack(rows, 0)  # (6,6,cin,cout)
            y = lax.conv_general_dilated(
                x, wt6[::-1, ::-1], (1, 1), ((3, 3), (3, 3)),
                lhs_dilation=(r, r),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            bt = bk.reshape(1, cout, r, r).transpose(0, 2, 3, 1)
            return y + jnp.tile(bt, (1, h, w, 1))

        t_a = timeit(shuffle_way3, x, wk, bk)
        t_b = timeit(transpose_way3, x, wk, bk)
        ya = np.asarray(shuffle_way3(x, wk, bk), np.float32)
        yb = np.asarray(transpose_way3(x, wk, bk), np.float32)
        report("k3", shape, cout, t_a, t_b, ya, yb)


if __name__ == "__main__":
    main()
