"""Isolate RoIAlign pallas fwd/bwd and rpn_targets wall cost at bench shapes.

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/exp_roi_iso.py
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 832, 1344
BATCH = int(os.environ.get("BENCH_BATCH", 16))
R = 512
ITERS = int(os.environ.get("ITERS", 10))


def timeit(fn, *args):
    out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].ravel()[0])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        o = None
        for _ in range(ITERS):
            o = fn(*args)
        _ = float(jax.tree.leaves(o)[0].ravel()[0])
        dt = (time.perf_counter() - t0) / ITERS * 1000
        best = dt if best is None else min(best, dt)
    return best


def main():
    from openset_rcnn_tpu.ops.pallas.roi_align_v2 import (
        roi_align_pallas_v2,
        roi_align_pallas_v2_bwd,
    )

    rng = np.random.RandomState(0)
    C = 256
    strides = (4, 8, 16, 32)
    feats = [
        jnp.asarray(
            rng.randn(BATCH, H // s, W // s, C).astype(np.float32), dtype=jnp.bfloat16
        )
        for s in strides
    ]
    # proposal-like boxes: sizes log-uniform 20..500 px
    wh = np.exp(rng.uniform(np.log(20), np.log(500), (BATCH, R, 2))).astype(np.float32)
    xy = rng.uniform(0, 700, (BATCH, R, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    g = jnp.asarray(rng.randn(BATCH, R, 7, 7, C).astype(np.float32))

    fwd = jax.jit(lambda f, b: roi_align_pallas_v2(f, b, strides))
    bwd = jax.jit(lambda f, b, g: roi_align_pallas_v2_bwd(f, b, g, strides))

    ms = timeit(fwd, feats, boxes)
    print(f"roi_align fwd  ({BATCH}x{R}): {ms:7.1f} ms", flush=True)
    ms = timeit(bwd, feats, boxes, g)
    print(f"roi_align bwd  ({BATCH}x{R}): {ms:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
