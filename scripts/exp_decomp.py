"""Decompose the train step's wall time by benchmarking loss subsets.

XLA dead-code-eliminates everything a loss subset doesn't touch, so timing
value_and_grad over nested subsets isolates each stage:

  feats : backbone+FPN fwd/bwd + SGD update only (loss = mean of features)
  rpn   : + RPN head, targets (IoU matcher), rpn_loc/rpn_ctr losses
  full  : + RoIAlign, box head, box/iou/dml/cls losses (the real step)

Deltas between rows give per-stage wall cost. Chained-dispatch timing with a
single end sync (the axon tunnel's block_until_ready returns early; see
PERFORMANCE.md measurement rules).

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/exp_decomp.py
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 832, 1344
BATCH = int(os.environ.get("BENCH_BATCH", 16))
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")
ITERS = int(os.environ.get("ITERS", 8))


def build():
    from openset_rcnn_tpu.config import get_default_cfg
    from openset_rcnn_tpu.engine import build_optimizer, create_train_state
    from openset_rcnn_tpu.engine.train_state import TrainState
    from openset_rcnn_tpu.models import (
        ModelSpec,
        OpensetRCNNModule,
        compute_anchors,
        opendet_id_map,
        training_losses_and_stats,
    )
    from openset_rcnn_tpu.structures import GroundTruth, ImageBatch
    import optax

    cfg = get_default_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 81
    cfg.MODEL.ROI_HEADS.NUM_KNOWN_CLASSES = 20
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
    cfg.OPENDET_BENCHMARK = True
    cfg.TPU.DTYPE = DTYPE
    cfg.TPU.ROI_ALIGN_BWD = os.environ.get("BENCH_ROI_BWD", "pallas_bf16")
    spec = ModelSpec.from_cfg(cfg, opendet_id_map(81, 20))
    module = OpensetRCNNModule(spec=spec)
    params = jax.jit(
        lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))["params"]
    )()
    anchors_np, level_sizes = compute_anchors(spec, (H, W))
    anchors = jnp.asarray(anchors_np)
    tx, _ = build_optimizer(cfg, params)
    state = create_train_state(params, tx)

    rng = np.random.RandomState(0)
    G = 100
    boxes = np.zeros((BATCH, G, 4), np.float32)
    classes = np.zeros((BATCH, G), np.int32)
    valid = np.zeros((BATCH, G), bool)
    for b in range(BATCH):
        xy = rng.uniform(0, 600, (20, 2))
        wh = rng.uniform(30, 300, (20, 2))
        boxes[b, :20] = np.concatenate([xy, xy + wh], 1)
        classes[b, :20] = rng.randint(0, 20, 20)
        valid[b, :20] = True
    batch = ImageBatch(
        images=jnp.asarray(rng.uniform(0, 255, (BATCH, H, W, 3)).astype(np.float32)),
        image_hw=jnp.asarray([[800, 1333]] * BATCH, jnp.float32),
        gt=GroundTruth(jnp.asarray(boxes), jnp.asarray(classes), jnp.asarray(valid)),
    )

    def make_step(keys):
        """keys: which loss entries feed the total. 'feats' = feature probe."""

        def loss_fn(params, batch, rng):
            if keys == "feats":
                fpn = module.apply(
                    {"params": params}, batch.images, method=OpensetRCNNModule.features
                )
                leaves = jax.tree.leaves(fpn)
                return sum(jnp.mean(f.astype(jnp.float32)) for f in leaves), {}
            losses, _ = training_losses_and_stats(
                module, params, batch, rng, spec, anchors, level_sizes
            )
            return sum(v for k, v in losses.items() if k in keys), {}

        def step(state, batch, rng):
            srng = jax.random.fold_in(rng, state.step)
            (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, srng
            )
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return (
                TrainState(step=state.step + 1, params=new_params, opt_state=new_opt),
                total,
            )

        return jax.jit(step)

    return make_step, state, batch


def time_step(step, state, batch, iters=ITERS):
    key = jax.random.PRNGKey(0)
    st = state
    st, t = step(st, batch, key)  # compile
    _ = float(t)
    best = None
    for _ in range(3):
        st2 = st
        t0 = time.perf_counter()
        for _ in range(iters):
            st2, t = step(st2, batch, key)
        _ = float(t)
        dt = (time.perf_counter() - t0) / iters * 1000
        best = dt if best is None else min(best, dt)
    return best


def main():
    make_step, state, batch = build()
    subsets = [
        ("feats", "feats"),
        ("rpn", ("loss_rpn_loc", "loss_rpn_ctr")),
        ("rpn+box", ("loss_rpn_loc", "loss_rpn_ctr", "loss_box_reg", "loss_iou")),
        (
            "full",
            (
                "loss_rpn_loc",
                "loss_rpn_ctr",
                "loss_box_reg",
                "loss_iou",
                "loss_dml",
                "loss_cls",
            ),
        ),
    ]
    prev = None
    for name, keys in subsets:
        ms = time_step(make_step(keys), state, batch)
        delta = "" if prev is None else f"  (+{ms - prev:.1f} ms)"
        print(f"{name:8s} {ms:7.1f} ms/step{delta}", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
