"""Isolate rpn_targets (fused IoU+matcher kernel + samplers) wall cost.

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/exp_rpn_iso.py
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 832, 1344
BATCH = int(os.environ.get("BENCH_BATCH", 16))
ITERS = 10


def main():
    from openset_rcnn_tpu.config import get_default_cfg
    from openset_rcnn_tpu.models import ModelSpec, compute_anchors, opendet_id_map
    from openset_rcnn_tpu.models.rpn import rpn_targets
    from openset_rcnn_tpu.structures import GroundTruth

    cfg = get_default_cfg()
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
    spec = ModelSpec.from_cfg(cfg, opendet_id_map(81, 20))
    anchors_np, _ = compute_anchors(spec, (H, W))
    anchors = jnp.asarray(anchors_np)
    print("anchors:", anchors.shape, flush=True)

    rng = np.random.RandomState(0)
    G = 100
    boxes = np.zeros((BATCH, G, 4), np.float32)
    valid = np.zeros((BATCH, G), bool)
    for b in range(BATCH):
        xy = rng.uniform(0, 600, (20, 2))
        wh = rng.uniform(30, 300, (20, 2))
        boxes[b, :20] = np.concatenate([xy, xy + wh], 1)
        valid[b, :20] = True
    gt = GroundTruth(jnp.asarray(boxes), jnp.asarray(np.zeros((BATCH, G), np.int32)), jnp.asarray(valid))

    fn = jax.jit(lambda g, k: rpn_targets(anchors, g, k))
    key = jax.random.PRNGKey(0)
    out = fn(gt, key)
    _ = float(out.gt_centerness.ravel()[0])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(gt, key)
        _ = float(out.gt_centerness.ravel()[0])
        dt = (time.perf_counter() - t0) / ITERS * 1000
        best = dt if best is None else min(best, dt)
    print(f"rpn_targets ({BATCH} imgs): {best:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
