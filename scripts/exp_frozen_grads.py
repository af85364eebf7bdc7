"""A/B: stop_gradient on frozen params (FrozenBN affines/stats + stages
below FREEZE_AT) vs computing-then-masking their grads (round-5 lever).

The profiler showed ~22 ms/step of per-channel [C] reductions at batch 16
(245 ops) — dominated by FrozenBN scale/bias cotangents that the optax
mask then throws away. stop_gradient turns them structurally zero so XLA
DCEs the frozen backward subgraph. Updates are bit-identical either way.

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/exp_frozen_grads.py
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

H, W = 832, 1344


def main():
    from bench import load_bench_cfg, make_bench_batch

    from openset_rcnn_tpu.engine import build_optimizer, create_train_state, make_train_step
    from openset_rcnn_tpu.engine.train_loop import build_model_spec
    from openset_rcnn_tpu.models import OpensetRCNNModule, compute_anchors

    cfg = load_bench_cfg()
    B = cfg.SOLVER.IMS_PER_BATCH
    spec = build_model_spec(cfg)
    module = OpensetRCNNModule(spec=spec)
    params = jax.jit(
        lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))["params"]
    )()
    anchors, level_sizes = compute_anchors(spec, (H, W))
    tx, sched = build_optimizer(cfg, params)

    batch = make_bench_batch(B)
    key = jax.random.PRNGKey(0)

    results = {}
    first_metrics = {}
    for name, stop in [("masked(old)", False), ("stop_grad(new)", True)]:
        step_fn = jax.jit(
            make_train_step(module, tx, spec, anchors, level_sizes, sched,
                            stop_frozen_grads=stop),
            donate_argnums=0,
        )
        # donation consumes the state's leaves — give each variant its own copy
        state = create_train_state(jax.tree.map(jnp.copy, params), tx)

        def run(n, st):
            t0 = time.perf_counter()
            m = None
            for _ in range(n):
                st, m = step_fn(st, batch, key)
            _ = float(m["total_loss"])
            return time.perf_counter() - t0, st, m

        _, state, m = run(3, state)
        first_metrics[name] = {k: float(v) for k, v in m.items()}
        per_step = float("inf")
        for _ in range(3):
            t_s, state, _ = run(5, state)
            t_l, state, _ = run(20, state)
            per_step = min(per_step, (t_l - t_s) / 15)
        results[name] = per_step
        print(f"{name}: {per_step*1e3:.1f} ms/step ({B/per_step:.2f} img/s)")

    # same-trajectory check: loss after the 3 warmup steps must match
    # (updates are bit-identical by construction)
    la = first_metrics["masked(old)"]["total_loss"]
    lb = first_metrics["stop_grad(new)"]["total_loss"]
    print(f"loss after 3 steps: old={la:.6f} new={lb:.6f} (diff {abs(la-lb):.2e})")
    print(f"speedup: {results['masked(old)'] / results['stop_grad(new)']:.3f}x")


if __name__ == "__main__":
    main()
