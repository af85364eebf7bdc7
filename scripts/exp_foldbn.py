"""Measure the cost of the FrozenBN affine in the train step (real chip).

VERDICT r4 item 5 names "fold FrozenBN scale/bias into conv weights at
load" as a candidate train-perf lever. Folding's gain is bounded above by
the cost of the affine itself, so this experiment measures that bound
directly: the full bf16 batch-16 train step with (a) the normal FrozenBN
affine vs (b) FrozenBN patched to identity (the affine removed from the
graph entirely). If (a) == (b) within noise, XLA is already fusing the
per-channel multiply-add into the conv epilogue and the folding lever is
closed; if not, the delta is the budget a real weight-fold can win.

Methodology: chained steps + single hard sync, min-of-repeats slope
(bench.py rules for the tunneled chip).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

H, W = 832, 1344
BATCH = 16
ITERS = 10
REPEATS = 3


def build(identity_bn: bool):
    from openset_rcnn_tpu.config import get_default_cfg
    from openset_rcnn_tpu.engine import build_optimizer, create_train_state, make_train_step
    from openset_rcnn_tpu.models import (
        ModelSpec, OpensetRCNNModule, compute_anchors, opendet_id_map,
    )
    from openset_rcnn_tpu.models import resnet as resnet_mod
    from openset_rcnn_tpu.structures import GroundTruth, ImageBatch

    if identity_bn:
        resnet_mod.FrozenBN.__call__ = lambda self, x: x  # affine removed
    cfg = get_default_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 81
    cfg.MODEL.ROI_HEADS.NUM_KNOWN_CLASSES = 20
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
    cfg.MODEL.RPN.BBOX_REG_LOSS_TYPE = "iou"
    cfg.OPENDET_BENCHMARK = True
    cfg.TPU.DTYPE = "bfloat16"
    spec = ModelSpec.from_cfg(cfg, opendet_id_map(81, 20))
    module = OpensetRCNNModule(spec=spec)
    params = jax.jit(
        lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))["params"]
    )()
    anchors, level_sizes = compute_anchors(spec, (H, W))
    tx, sched = build_optimizer(cfg, params)
    state = create_train_state(params, tx)
    step_fn = jax.jit(
        make_train_step(module, tx, spec, anchors, level_sizes, sched),
        donate_argnums=0,
    )

    rng = np.random.RandomState(0)
    G = 100
    boxes = np.zeros((BATCH, G, 4), np.float32)
    classes = np.zeros((BATCH, G), np.int32)
    valid = np.zeros((BATCH, G), bool)
    for b in range(BATCH):
        n = 20
        xy = rng.uniform(0, 600, (n, 2))
        wh = rng.uniform(30, 300, (n, 2))
        boxes[b, :n] = np.concatenate([xy, xy + wh], 1)
        classes[b, :n] = rng.randint(0, 20, n)
        valid[b, :n] = True
    batch = ImageBatch(
        images=jnp.asarray(rng.uniform(0, 255, (BATCH, H, W, 3)).astype(np.float32)),
        image_hw=jnp.asarray([[800, 1333]] * BATCH, jnp.float32),
        gt=GroundTruth(jnp.asarray(boxes), jnp.asarray(classes), jnp.asarray(valid)),
    )
    return step_fn, state, batch


def measure(step_fn, state, batch):
    key = jax.random.PRNGKey(0)

    def run(n, st):
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            st, m = step_fn(st, batch, key)
        _ = float(m["total_loss"])
        return time.perf_counter() - t0, st

    _, state = run(3, state)
    per_step = float("inf")
    for _ in range(REPEATS):
        t_short, state = run(ITERS // 2, state)
        t_long, state = run(ITERS * 2, state)
        per_step = min(per_step, (t_long - t_short) / (ITERS * 2 - ITERS // 2))
    return per_step


def main():
    for label, identity in [("frozenbn_affine", False), ("identity_bn", True)]:
        step_fn, state, batch = build(identity)
        per_step = measure(step_fn, state, batch)
        print(f"{label}: {per_step * 1000:.1f} ms/step  {BATCH / per_step:.1f} img/s")


if __name__ == "__main__":
    main()
