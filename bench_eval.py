"""Benchmark: fused-cascade EVAL throughput on one TPU chip (sibling of
bench.py — pins the eval img/s claim as an artifact, VERDICT r2 weak-8).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology identical to bench.py: chained dispatches, single end sync,
slope between two run lengths (the tunneled deployment charges ~25 ms per
host<->device sync; see CLAUDE.md). The model is the flagship VOC-COCO
R50-FPN Openset-RCNN; the measured program is the full device-side eval —
backbone, CF-RPN proposal selection, ROI heads, and the fused 3-stage
open-set cascade (models/serving.py) — i.e. exactly what do_test dispatches
per batch. vs_baseline compares against the same ~20 img/s A100 estimate as
bench.py (reference eval runs 1 img/GPU, d2 R50-FPN inference ~15-25 img/s
on A100-class hardware).
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_BASELINE_IMG_S = 20.0
H, W = 832, 1344
# batch 16 is the fastest stable point (87.9 img/s vs 87.1 at batch 8;
# the engine's TPU.EVAL_BATCH_SIZE default stays 8, within 1% of it)
BATCH = int(os.environ.get("BENCH_BATCH", 16))


def main():
    from bench import load_bench_cfg, wait_for_chip

    from openset_rcnn_tpu.engine.train_loop import build_model_spec
    from openset_rcnn_tpu.evaluation.postprocess import PostprocessConfig
    from openset_rcnn_tpu.evaluation.testing import CompiledInference
    from openset_rcnn_tpu.models import OpensetRCNNModule

    # The measured configuration is the CHECKED-IN production yaml (same as
    # bench.py) — notably TEST.DETECTIONS_PER_IMAGE=1000 (the reference
    # benchmark value; also the crash-free stage-1 top-k, PERFORMANCE.md
    # round-5 root cause). Round-4's 89.7 img/s record was measured at the
    # yacs-default 100 — not reproducible from any checked-in file — so
    # numbers from this version supersede it.
    # transient-outage resilience, before any backend-touching call (bench.py)
    if "cpu" not in os.environ.get("JAX_PLATFORMS", "axon").lower():
        wait_for_chip()
    cfg = load_bench_cfg()
    # env overrides apply ONLY when explicitly set (bench.py pattern; BENCH_DTYPE
    # is already applied by load_bench_cfg) — the measured default
    # configuration IS the checked-in yaml
    if "BENCH_ROI_IMPL" in os.environ:  # bisection knob for on-chip debugging
        cfg.TPU.ROI_ALIGN_IMPL = os.environ["BENCH_ROI_IMPL"]
    spec = build_model_spec(cfg)
    module = OpensetRCNNModule(spec=spec)
    params = jax.jit(
        lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))["params"]
    )()
    post_cfg = PostprocessConfig.from_cfg(cfg, cfg.OPENDET_BENCHMARK, None)
    infer = CompiledInference(module, params, spec, post_cfg=post_cfg)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.uniform(0, 255, (BATCH, H, W, 3)).astype(np.float32))
    hw = jnp.asarray([[800.0, 1333.0]] * BATCH, jnp.float32)

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = infer(images, hw)
        _ = float(out.scores[0, 0])  # hard sync
        return time.perf_counter() - t0

    run(3)
    # min-of-repeats slope, same contention rationale as bench.py
    per_batch = float("inf")
    for _ in range(int(os.environ.get("BENCH_REPEATS", 3))):
        t_short = run(5)
        t_long = run(20)
        per_batch = min(per_batch, (t_long - t_short) / 15)
    img_s = BATCH / per_batch
    print(
        json.dumps(
            {
                "metric": "eval_images_per_sec_per_chip_r50fpn_832x1344_fused",
                "value": round(img_s, 2),
                "unit": "img/s",
                "vs_baseline": round(img_s / A100_BASELINE_IMG_S, 3),
                # audit labels: the exact measured configuration
                "batch": BATCH,
                "dtype": cfg.TPU.DTYPE,
                "detections_per_image": cfg.TEST.DETECTIONS_PER_IMAGE,
            }
        )
    )


if __name__ == "__main__":
    main()
