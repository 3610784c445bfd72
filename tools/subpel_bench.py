"""Microbench: subpel (conv + pixel-shuffle) upsampling variants at the
DMC's real shapes — the consolidated round-1/2/3 probe.

The round-2 trace attributes ~100 ms/frame to layout copies, part of it
around pixel-shuffle (depth-to-space) relayouts. Mathematically equivalent
formulations timed on the chip:

--probe k1       conv(k=1 -> C*r^2)+shuffle vs the EXACT stride-r
                 transposed conv: rearrange W[0,0,ci,c*r*r+dy*r+dx] ->
                 Wt[dy,dx,ci,c], flip both spatial dims,
                 conv_transpose(stride r, VALID). Hit by every
                 ResidualBlockUpsample (recon UNets, mv/contextual
                 decoders).
--probe k1-bias  bias handling for the conv_transpose form: tiled
                 (1,r,r,c) bias-plane add (materializes; the high-res
                 loser), bias folded into the contraction via a
                 constant-1 input channel, and the no-bias floor.
--probe k3       k=3/r=2 SubpelConv sites: conv3x3(SAME)+shuffle vs the
                 dense 6x6 lhs-dilated form Wt6[a,b,ci,c] =
                 W[di+1,dj+1,ci,c*4+dy*2+dx], a=dy-2*di+2, b=dx-2*dj+2.

MEASURED VERDICT (PERF.md "round-3 negative results"): k=3 strictly
slower; k=1 wins only at coarse-res sites and the win drowns in tunnel
timing variance once the bias plane is handled — the shuffle path stays.

Run on the TPU: python tools/subpel_bench.py [--probe k1|k1-bias|k3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R = 2

K1_CASES = [
    ((1, 68, 120, 128), 64),
    ((1, 136, 240, 64), 64),
    ((1, 272, 480, 64), 32),
    ((1, 544, 960, 32), 16),
]
K3_CASES = [
    ((1, 136, 240, 64), 64),   # c3_up 1/8 -> 1/4
    ((1, 272, 480, 96), 64),   # c2_up at 1/4 (cat of 64+32)
    ((1, 272, 480, 64), 64),   # recon up chain mid
    ((1, 544, 960, 64), 32),   # recon near-full-res
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", choices=["k1", "k1-bias", "k3"],
                    default="k1")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def timeit(f, *a):
        o = f(*a)
        _ = float(jnp.sum(o[0, 0, :2, 0]).astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            o = f(*a)
        _ = float(jnp.sum(o[0, 0, :2, 0]).astype(jnp.float32))
        return (time.perf_counter() - t0) / args.iters * 1e3

    def shuffle(y, cout):
        n_, h_, w_, _ = y.shape
        y = y.reshape(n_, h_, w_, cout, R, R)
        y = y.transpose(0, 1, 4, 2, 5, 3)
        return y.reshape(n_, h_ * R, w_ * R, cout)

    def wt_k1(wk, cin, cout):
        wt = wk.reshape(cin, cout, R, R).transpose(2, 3, 0, 1)
        return wt[::-1, ::-1]

    if args.probe in ("k1", "k1-bias"):
        for shape, cout in K1_CASES:
            n, h, w, cin = shape
            x = jnp.asarray(rng.standard_normal(shape), dt)
            wk = jnp.asarray(rng.standard_normal(
                (1, 1, cin, cout * R * R)) * 0.1, dt)
            bk = jnp.asarray(rng.standard_normal((cout * R * R,)) * 0.1, dt)

            @jax.jit
            def a_shuffle(x, wk, bk):
                y = lax.conv_general_dilated(
                    x, wk, (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC")) + bk
                return shuffle(y, cout)

            @jax.jit
            def b_tile(x, wk, bk):
                y = lax.conv_transpose(
                    x, wt_k1(wk, cin, cout), (R, R), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                bt = bk.reshape(1, cout, R, R).transpose(0, 2, 3, 1)
                return y + jnp.tile(bt, (1, h, w, 1))

            if args.probe == "k1":
                t_a = timeit(a_shuffle, x, wk, bk)
                t_b = timeit(b_tile, x, wk, bk)
                ya = np.asarray(a_shuffle(x, wk, bk), np.float32)
                yb = np.asarray(b_tile(x, wk, bk), np.float32)
                err = (np.max(np.abs(ya - yb))
                       / max(np.max(np.abs(ya)), 1e-9))
                print(f"k1 {shape}->{cout}: shuffle {t_a:.3f} ms | "
                      f"conv_T {t_b:.3f} ms | rel_err {err:.2e}",
                      flush=True)
                continue

            @jax.jit
            def c_onesch(x, wk, bk):
                # bias folded into the contraction: constant-1 channel +
                # a bias row in the kernel; nothing left to fuse after
                xa = jnp.concatenate(
                    [x, jnp.ones((n, h, w, 1), dt)], axis=-1)
                wt = wt_k1(wk, cin, cout)
                bt = bk.reshape(1, cout, R, R).transpose(2, 3, 0, 1)
                wa = jnp.concatenate([wt, bt[::-1, ::-1]], axis=2)
                return lax.conv_transpose(
                    xa, wa, (R, R), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

            @jax.jit
            def d_nobias(x, wk, bk):
                return lax.conv_transpose(
                    x, wt_k1(wk, cin, cout), (R, R), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

            t_a = timeit(a_shuffle, x, wk, bk)
            t_b = timeit(b_tile, x, wk, bk)
            t_c = timeit(c_onesch, x, wk, bk)
            t_d = timeit(d_nobias, x, wk, bk)
            ya = np.asarray(a_shuffle(x, wk, bk), np.float32)
            yc = np.asarray(c_onesch(x, wk, bk), np.float32)
            err = np.max(np.abs(ya - yc)) / max(np.max(np.abs(ya)), 1e-9)
            print(f"k1-bias {shape}->{cout}: shuffle {t_a:.3f} | tile "
                  f"{t_b:.3f} | ones-ch {t_c:.3f} | nobias {t_d:.3f} ms "
                  f"| c rel_err {err:.2e}", flush=True)
        return

    # ---- k=3 sites
    k = 3
    for shape, cout in K3_CASES:
        n, h, w, cin = shape
        x = jnp.asarray(rng.standard_normal(shape), dt)
        wk = jnp.asarray(rng.standard_normal(
            (k, k, cin, cout * R * R)) * 0.1, dt)
        bk = jnp.asarray(rng.standard_normal((cout * R * R,)) * 0.1, dt)

        @jax.jit
        def shuffle_way3(x, wk, bk):
            y = lax.conv_general_dilated(
                x, wk, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bk
            return shuffle(y, cout)

        @jax.jit
        def transpose_way3(x, wk, bk):
            # Wt6[a,b,ci,c] = W[di+1,dj+1,ci,c*4+dy*2+dx],
            # a = dy-2*di+2 (unique (dy,di) per a), same for b
            w6 = wk.reshape(k, k, cin, cout, R, R)
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
                lhs_dilation=(R, R),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            bt = bk.reshape(1, cout, R, R).transpose(0, 2, 3, 1)
            return y + jnp.tile(bt, (1, h, w, 1))

        t_a = timeit(shuffle_way3, x, wk, bk)
        t_b = timeit(transpose_way3, x, wk, bk)
        ya = np.asarray(shuffle_way3(x, wk, bk), np.float32)
        yb = np.asarray(transpose_way3(x, wk, bk), np.float32)
        err = np.max(np.abs(ya - yb)) / max(np.max(np.abs(ya)), 1e-9)
        print(f"k3 {shape}->{cout}: shuffle {t_a:.3f} ms | conv_T(6x6) "
              f"{t_b:.3f} ms | rel_err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
