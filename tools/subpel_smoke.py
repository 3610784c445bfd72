"""On-chip smoke + microbench for the Pallas subpel kernels.

Cheap gate in front of the full 1080p --fast-shuffle bench: lowers both
kernels (pixel_shuffle_relayout, subpel_conv1x1) through real Mosaic at
the DMC's actual shapes, checks exactness against the plain-XLA paths,
and times kernel vs XLA per site. Round-4 history: the first kernel
design lowered fine in interpret mode but violated Mosaic's block rules
(last two block dims divisible by (8,128) or full) on the real chip —
this tool exists so that class of failure costs ~2 minutes, not a bench
queue slot.

Exit code: 0 = all sites lowered and exact; 1 = any lowering error or
mismatch (details on stdout).

Run on the TPU: python tools/subpel_smoke.py
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R = 2

# (input shape, cout): k=1 fused sites then k>=3 relayout sites.
# cout=32/16 sites exercise the rc%128!=0 XLA fallback inside the call.
K1_CASES = [
    ((1, 68, 120, 128), 64),
    ((1, 136, 240, 64), 64),
    ((1, 272, 480, 64), 32),
    ((1, 544, 960, 32), 16),
]
RELAYOUT_CASES = [  # post-conv tensors (N, H, W, cout*R*R)
    ((1, 136, 240, 256), 64),
    ((1, 272, 480, 256), 64),
    ((1, 272, 480, 384), 96),
    ((1, 544, 960, 128), 32),
]


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from vcm_ts_tpu.ops.subpel_pallas import (
        permute_out_channels, pixel_shuffle_relayout, subpel_conv1x1)

    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    failures = 0

    def timeit(f, *a, iters=20):
        o = jax.block_until_ready(f(*a))
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f(*a)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / iters * 1e3

    def cmajor_shuffle(y, cout):
        n_, h_, w_, _ = y.shape
        y = y.reshape(n_, h_, w_, cout, R, R)
        y = y.transpose(0, 1, 4, 2, 5, 3)
        return y.reshape(n_, h_ * R, w_ * R, cout)

    interp = jax.default_backend() == "cpu"  # local sanity runs
    print(f"backend: {jax.default_backend()} interpret={interp}", flush=True)

    for shape, cout in RELAYOUT_CASES:
        rc = R * cout
        tag = "kernel" if rc % 128 == 0 else "xla-fallback"
        try:
            x_c = jnp.asarray(rng.standard_normal(shape), dt)  # c-major
            x_k = jnp.asarray(permute_out_channels(x_c, R))    # k-major

            fast = jax.jit(lambda v: pixel_shuffle_relayout(v, R, interpret=interp))
            ref = jax.jit(lambda v: cmajor_shuffle(v, cout))
            ya = np.asarray(fast(x_k), np.float32)
            yb = np.asarray(ref(x_c), np.float32)
            if not np.array_equal(ya, yb):
                print(f"relayout {shape}: MISMATCH max "
                      f"{np.max(np.abs(ya - yb)):.3e}", flush=True)
                failures += 1
                continue
            t_f, t_r = timeit(fast, x_k), timeit(ref, x_c)
            print(f"relayout {shape}->{cout} [{tag}]: pallas {t_f:.3f} ms"
                  f" | xla shuffle {t_r:.3f} ms | exact", flush=True)
        except Exception:
            print(f"relayout {shape}->{cout} [{tag}]: FAILED", flush=True)
            traceback.print_exc()
            failures += 1

        # experimental full-lane variant (any channel count): probe only —
        # a lowering failure here is information, not a smoke failure
        try:
            from vcm_ts_tpu.ops.subpel_pallas import _relayout_impl_fulllane
            full = jax.jit(lambda v: _relayout_impl_fulllane(
                v, R, 8, interpret=interp))
            ya = np.asarray(full(x_k), np.float32)
            yb = np.asarray(ref(x_c), np.float32)
            ok = np.array_equal(ya, yb)
            t_f = timeit(full, x_k)
            print(f"relayout {shape}->{cout} [full-lane]: pallas "
                  f"{t_f:.3f} ms | {'exact' if ok else 'MISMATCH'}",
                  flush=True)
            if not ok:
                failures += 1
        except Exception as e:
            print(f"relayout {shape}->{cout} [full-lane]: no-lower "
                  f"({type(e).__name__})", flush=True)

    for shape, cout in K1_CASES:
        n, h, w, cin = shape
        try:
            x = jnp.asarray(rng.standard_normal(shape), dt)
            wt = jnp.asarray(
                rng.standard_normal((1, 1, cin, cout * R * R)) * 0.1, dt)
            b = jnp.asarray(
                rng.standard_normal((cout * R * R,)) * 0.1, dt)
            wp = permute_out_channels(wt, R)[0, 0]  # (cin, rr*cout)
            wk = wp.reshape(cin, R * R, cout).transpose(1, 0, 2)
            bk = permute_out_channels(b, R).reshape(R * R, cout)

            fused = jax.jit(
                lambda v, wv, bv: subpel_conv1x1(v, wv, bv, R,
                                                 interpret=interp))

            def plain(v, wv, bv):
                y = lax.conv_general_dilated(
                    v, wv, (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC")) + bv
                return cmajor_shuffle(y, cout)

            plain = jax.jit(plain)
            ya = np.asarray(fused(x, wk, bk), np.float32)
            yb = np.asarray(plain(x, wt, b), np.float32)
            err = np.max(np.abs(ya - yb)) / max(np.max(np.abs(yb)), 1e-9)
            # fused accumulates the dot in f32; the bf16 XLA conv may not —
            # allow one-ulp-class differences, fail on anything structural
            if err > 2e-2:
                print(f"conv1x1 {shape}: MISMATCH rel_err {err:.3e}",
                      flush=True)
                failures += 1
                continue
            t_f = timeit(fused, x, wk, bk)
            t_p = timeit(plain, x, wt, b)
            print(f"conv1x1 {shape}->{cout}: pallas {t_f:.3f} ms | "
                  f"conv+shuffle {t_p:.3f} ms | rel_err {err:.1e}",
                  flush=True)
        except Exception:
            print(f"conv1x1 {shape}->{cout}: FAILED", flush=True)
            traceback.print_exc()
            failures += 1

    print(f"failures: {failures}", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
