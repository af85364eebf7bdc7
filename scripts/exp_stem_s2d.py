"""Space-to-depth stem conv: exact-rewrite microbench (round 5).

The profiler shows the 7x7/s2 stem conv on 3 input channels is the single
worst conv in the step: 6.48 ms vs a 0.78 ms HBM floor (~8x off
speed-of-light) — the MXU sees a 3-deep contraction and the T(8,128)
tiling wastes 125/128 lanes on the input. The MLPerf-ResNet TPU rewrite:
zero-pad the kernel 7->8 (leading row/col), space-to-depth the padded
input 2x2 -> 12 channels, and run a 4x4/s1 VALID conv. Exact up to fp
summation order.

Measures: current stem conv vs s2d rewrite, fwd only (the stem is frozen;
with stop_frozen_grads its backward is DCE'd), bf16, batch 16.

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/exp_stem_s2d.py
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

B, H, W = 16, 832, 1344
DT = jnp.bfloat16


def stem_ref(x, w):  # x (B,H,W,3), w (7,7,3,64) HWIO
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def stem_s2d(x, w):
    # kernel: zero leading row/col -> (8,8,3,64); fold 2x2 -> (4,4,12,64)
    w8 = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
    ws = w8.reshape(4, 2, 4, 2, 3, w.shape[-1]).transpose(0, 2, 1, 3, 4, 5)
    ws = ws.reshape(4, 4, 12, w.shape[-1])
    # input: pad (4,2),(4,2) then 2x2 space-to-depth -> (B,(H+6)/2,(W+6)/2,12)
    xp = jnp.pad(x, ((0, 0), (4, 2), (4, 2), (0, 0)))
    Bn, Hp, Wp, C = xp.shape
    y = xp.reshape(Bn, Hp // 2, 2, Wp // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(Bn, Hp // 2, Wp // 2, 4 * C)
    return jax.lax.conv_general_dilated(
        y, ws, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32)).astype(DT)
    w = jnp.asarray((rng.randn(7, 7, 3, 64) * 0.1).astype(np.float32)).astype(DT)

    a = jax.jit(stem_ref)(x, w)
    b = jax.jit(stem_s2d)(x, w)
    an = np.asarray(a.astype(jnp.float32))
    bn = np.asarray(b.astype(jnp.float32))
    assert an.shape == bn.shape, (an.shape, bn.shape)
    rel = np.max(np.abs(an - bn)) / max(np.max(np.abs(an)), 1e-9)
    print(f"shapes {an.shape}; max rel diff {rel:.3e} (fp reorder only)")

    for name, fn in [("7x7s2 (current)", stem_ref), ("s2d 4x4s1", stem_s2d)]:
        # chain iterations through a scalar carry (can't be elided), time
        # the slope between two run lengths (one ~25 ms tunnel sync each)
        def make(k):
            @jax.jit
            def chain():
                def body(c, _):
                    r = fn(x + c, w)
                    return (r.astype(jnp.float32).mean() * 1e-12).astype(DT), None
                c, _ = jax.lax.scan(body, jnp.zeros((), DT), None, length=k)
                return c
            return chain

        short, long_ = make(5), make(20)
        _ = float(short()); _ = float(long_())  # compile both
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); _ = float(short()); ts = time.perf_counter() - t0
            t0 = time.perf_counter(); _ = float(long_()); tl = time.perf_counter() - t0
            best = min(best, (tl - ts) / 15)
        print(f"{name}: {best*1e3:.2f} ms")


if __name__ == "__main__":
    main()
