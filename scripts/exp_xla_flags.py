"""Measure XLA compiler-option levers on the production train step
(VERDICT r4 item 4: "measure >=2 levers even if the result is no win").

AOT-compiles the bench-config step with each candidate compiler_options
dict (options ship through the PJRT compile call, so they reach the
tunneled compiler unlike XLA_FLAGS env) and times chained steps.

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/exp_xla_flags.py
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

CANDIDATES = [
    ("baseline", None),
    # latency-hiding scheduler: measure its contribution by turning it OFF
    ("lhs_off", {"xla_tpu_enable_latency_hiding_scheduler": "false"}),
    # scoped VMEM cap: more VMEM per fusion can deepen pipelining of the
    # big convs; v5e has 128 MiB VMEM, default scoped limit is lower
    ("vmem_96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("vmem_112m", {"xla_tpu_scoped_vmem_limit_kib": "114688"}),
]


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

    step = make_train_step(module, tx, spec, anchors, level_sizes, sched)
    # no donation: AOT+donation+repeated states is fine, but keep it simple
    # and identical across variants (relative timings are what we measure)
    lowered = jax.jit(step).lower(create_train_state(params, tx), batch, key)

    for name, opts in CANDIDATES:
        try:
            t0 = time.perf_counter()
            compiled = lowered.compile(compiler_options=opts)
            tc = time.perf_counter() - t0
        except Exception as e:
            print(f"{name}: compile REJECTED: {str(e)[:200]}")
            continue

        def run(n, st):
            t0 = time.perf_counter()
            m = None
            for _ in range(n):
                st, m = compiled(st, batch, key)
            _ = float(m["total_loss"])
            return time.perf_counter() - t0, st

        try:
            state = create_train_state(params, tx)
            _, state = run(3, state)
            per_step = float("inf")
            for _ in range(3):
                t_s, state = run(5, state)
                t_l, state = run(20, state)
                per_step = min(per_step, (t_l - t_s) / 15)
            print(f"{name}: {per_step*1e3:.1f} ms/step ({B/per_step:.2f} img/s) "
                  f"[compile {tc:.0f}s]")
        except Exception as e:
            print(f"{name}: execution FAILED: {str(e)[:200]}")


if __name__ == "__main__":
    main()
