"""Measure scan-K train step vs chained single-step dispatch on the chip.

Usage: python scripts/exp_scan.py [K ...]   (default: 1 4)
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 832, 1344
BATCH = 8


def main():
    ks = [int(a) for a in sys.argv[1:]] or [1, 4]
    from openset_rcnn_tpu.config import get_default_cfg
    from openset_rcnn_tpu.engine import (
        build_optimizer,
        create_train_state,
        make_scan_train_step,
        make_train_step,
    )
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
    cfg.OPENDET_BENCHMARK = True

    spec = ModelSpec.from_cfg(cfg, opendet_id_map(81, 20))
    module = OpensetRCNNModule(spec=spec)
    params = jax.jit(
        lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))["params"]
    )()
    anchors, level_sizes = compute_anchors(spec, (H, W))
    tx, sched = build_optimizer(cfg, params)
    state0 = create_train_state(params, tx)

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

    for k in ks:
        if k == 1:
            fn = jax.jit(make_train_step(module, tx, spec, anchors, level_sizes, sched))
            arg = batch
        else:
            fn = jax.jit(make_scan_train_step(module, tx, spec, anchors, level_sizes, sched))
            arg = jax.tree.map(lambda x: jnp.broadcast_to(x, (k,) + x.shape), batch)

        def run(n_disp, st):
            t0 = time.perf_counter()
            m = None
            for _ in range(n_disp):
                st, m = fn(st, arg, key)
            _ = float(m["total_loss"])
            return time.perf_counter() - t0, st

        # steps per dispatch = k; pick dispatch counts so total steps ~ equal
        short = max(1, 6 // k)
        long = max(2, 24 // k)
        _, st = run(max(1, 3 // k) + 1, state0)  # warmup incl. compile
        t_s, st = run(short, st)
        t_l, st = run(long, st)
        per_step = (t_l - t_s) / ((long - short) * k)
        print(f"K={k}: {per_step*1e3:.1f} ms/step  {BATCH/per_step:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
