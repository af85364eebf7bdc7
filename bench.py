"""Benchmark: R50-FPN Openset-RCNN train throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline for vs_baseline: detectron2 Faster-R-CNN-R50-FPN-style training on
an A100 runs ~20 images/sec/chip (d2 model-zoo reports ~0.21 s/iter at batch
16 on V100x8 => ~9.5 img/s/GPU; A100 ~2x => ~20). The BASELINE.json target is
>3x that, i.e. 60 img/s/chip on v5e; vs_baseline is reported against the
20 img/s A100 estimate.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_BASELINE_IMG_S = 20.0

# Benchmark shape: the reference's train distribution resizes the short side
# to 640..800 with max 1333 (configs/Base-RCNN-FPN.yaml:43); we bench the
# padded bucket 832x1344 — the worst-case static shape.
import os

H, W = 832, 1344
# batch 16 fits since the Pallas RoIAlign forward removed the gather
# residuals; with bf16 activations it is also the fastest stable point
# (62.8 img/s vs 61.4 at batch 8, reproduced twice on the shared chip).
BATCH = int(os.environ.get("BENCH_BATCH", 16))
# bfloat16 is the production training configuration (TPU.DTYPE=bfloat16):
# params and loss math stay f32, trunk/head activations run bf16 on the MXU.
# Quality evidence: train-step gradient parity (scripts/exp_grad_parity_tpu
# .py), f32-vs-bf16 end-to-end synthetic learning parity (PERFORMANCE.md
# "bf16 policy"), and golden-forward converter tests. BENCH_DTYPE=float32
# benches the conservative config.
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")
WARMUP = 3
ITERS = 10
REPEATS = int(os.environ.get("BENCH_REPEATS", 3))


def main():
    from openset_rcnn_tpu.config import get_default_cfg
    from openset_rcnn_tpu.engine import build_optimizer, create_train_state, make_train_step
    from openset_rcnn_tpu.models import (
        ModelSpec,
        OpensetRCNNModule,
        compute_anchors,
        opendet_id_map,
    )
    from openset_rcnn_tpu.structures import GroundTruth, ImageBatch

    cfg = get_default_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 81
    cfg.MODEL.ROI_HEADS.NUM_KNOWN_CLASSES = 20
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
    cfg.MODEL.RPN.BBOX_REG_LOSS_TYPE = "iou"
    cfg.MODEL.RPN.BBOX_REG_LOSS_WEIGHT = 0.5
    cfg.MODEL.RPN.CTR_REG_LOSS_WEIGHT = 0.5
    cfg.MODEL.ROI_BOX_HEAD.CLS_LOSS_WEIGHT = 0.9
    cfg.MODEL.PLN.LOSS_WEIGHT = 0.5
    cfg.OPENDET_BENCHMARK = True
    cfg.TPU.DTYPE = DTYPE
    # bf16 RoIAlign-gradient accumulators are the production training
    # configuration (same policy shape as BENCH_DTYPE: the yacs default
    # stays conservative f32, the bench records production). Evidence
    # (PERFORMANCE.md "bf16 RMW accumulators"): interpret-mode parity,
    # on-chip full-step grad error INSIDE the f32 kernel-vs-XLA variant
    # band (7.0e-3 vs 8.5e-3), and 6000-iter from-scratch learning runs
    # converging to the same loss basin with comparable open-set metrics.
    # BENCH_ROI_BWD=pallas benches the conservative f32 path.
    cfg.TPU.ROI_ALIGN_BWD = os.environ.get("BENCH_ROI_BWD", "pallas_bf16")

    spec = ModelSpec.from_cfg(cfg, opendet_id_map(81, 20))
    module = OpensetRCNNModule(spec=spec)
    params = jax.jit(
        lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))["params"]
    )()
    anchors, level_sizes = compute_anchors(spec, (H, W))
    tx, sched = build_optimizer(cfg, params)
    state = create_train_state(params, tx)
    # Donate the state like the engine does (train_loop.py): without donation
    # XLA emits a pass-through %copy for every frozen/pass-through tensor each
    # step (~5 ms/step measured).
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
    key = jax.random.PRNGKey(0)

    # NOTE: on the tunneled TPU backend block_until_ready is unreliable and
    # a host sync costs ~25ms; measure with CHAINED steps and a single hard
    # sync (float() transfer), using the slope between two run lengths.
    def run(n, st):
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            st, m = step_fn(st, batch, key)
        _ = float(m["total_loss"])  # hard sync
        return time.perf_counter() - t0, st

    _, state = run(WARMUP, state)
    # The pooled chip is time-shared: an unlucky contention burst during a
    # single (short, long) pair understates steady-state throughput. Take the
    # best slope over a few repeats (min-of-repeats, timeit-style) — each
    # pair is only ~25 chained steps.
    per_step = float("inf")
    for _ in range(REPEATS):
        t_short, state = run(ITERS // 2, state)
        t_long, state = run(ITERS * 2, state)
        per_step = min(per_step, (t_long - t_short) / (ITERS * 2 - ITERS // 2))

    img_s = BATCH / per_step
    print(
        json.dumps(
            {
                "metric": "train_images_per_sec_per_chip_r50fpn_832x1344",
                "value": round(img_s, 2),
                "unit": "img/s",
                "vs_baseline": round(img_s / A100_BASELINE_IMG_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
