"""Benchmark: R50-FPN Openset-RCNN train throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...labels}.

Baseline for vs_baseline: detectron2 Faster-R-CNN-R50-FPN-style training on
an A100 runs ~20 images/sec/chip (d2 model-zoo reports ~0.21 s/iter at batch
16 on V100x8 => ~9.5 img/s/GPU; A100 ~2x => ~20). The BASELINE.json target is
>3x that, i.e. 60 img/s/chip on v5e; vs_baseline is reported against the
20 img/s A100 estimate. NOTE this is an ESTIMATE chain (the reference
publishes no throughput, BASELINE.md); the hardware-grounded metric is the
MFU analysis in PERFORMANCE.md.

The measured configuration is the CHECKED-IN production config
configs/VOC-COCO/openset_rcnn_R50_FPN_128k_tpu.yaml (bf16 activations,
pallas_bf16 RoIAlign-grad accumulators, batch 16) — a user reproduces the
recorded number with `train.py --config-file <that yaml>`. Env overrides
(BENCH_BATCH / BENCH_DTYPE / BENCH_ROI_BWD) exist for experiments only and
are recorded in the output labels either way.

Before timing, a PREFLIGHT gate re-validates the on-chip Pallas kernels
(fused IoU+matcher bitwise vs XLA; RoIAlign fwd/bwd vs the exact gather
path) — the DMA-pipeline blind spot interpret-mode CI can't cover
(ops/pallas/roi_align_v2.py). A failing preflight refuses to record a bench.
BENCH_PREFLIGHT=0 skips (e.g. when iterating on timings only).
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_BASELINE_IMG_S = 20.0

# Benchmark shape: the reference's train distribution resizes the short side
# to 640..800 with max 1333 (configs/Base-RCNN-FPN.yaml:43); we bench the
# padded bucket 832x1344 — the worst-case static shape.
H, W = 832, 1344
WARMUP = 3
ITERS = 10
REPEATS = int(os.environ.get("BENCH_REPEATS", 3))

BENCH_CONFIG = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "configs/VOC-COCO/openset_rcnn_R50_FPN_128k_tpu.yaml",
)


def load_bench_cfg():
    """The benched configuration = the checked-in production yaml + env
    overrides (experiments only; the defaults ARE the yaml values)."""
    from openset_rcnn_tpu.config import get_default_cfg

    cfg = get_default_cfg()
    cfg.merge_from_file(BENCH_CONFIG)
    if "BENCH_BATCH" in os.environ:
        cfg.SOLVER.IMS_PER_BATCH = int(os.environ["BENCH_BATCH"])
    if "BENCH_DTYPE" in os.environ:
        cfg.TPU.DTYPE = os.environ["BENCH_DTYPE"]
    if "BENCH_ROI_BWD" in os.environ:
        cfg.TPU.ROI_ALIGN_BWD = os.environ["BENCH_ROI_BWD"]
    return cfg


def wait_for_chip(max_wait_s: int = 900, probe_timeout_s: int = 90) -> None:
    """Block until the tunneled TPU answers a trivial matmul (bounded).

    The shared chip goes unresponsive for 10-50 min after worker crashes —
    including crashes by OTHER tenants (observed round 5 with no local
    cause). A hanging in-process jax call cannot be timed out, so probe in
    a SUBPROCESS and retry; proceed (and let the real run fail loudly) if
    the chip stays down past max_wait_s. Skipped off-TPU and via
    BENCH_WAIT_CHIP=0."""
    import subprocess

    if os.environ.get("BENCH_WAIT_CHIP", "1") == "0":
        return
    deadline = time.monotonic() + max_wait_s
    probe = ("import jax, jax.numpy as jnp; "
             "print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))")
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               timeout=probe_timeout_s, capture_output=True)
            if r.returncode == 0 and b"512" in r.stdout:
                if attempt > 1:
                    print(f"chip responsive after {attempt} probes", file=sys.stderr)
                return
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() > deadline:
            print(f"chip still unresponsive after {max_wait_s}s; "
                  "proceeding anyway", file=sys.stderr)
            return
        print("chip unresponsive (recovering?); retrying in 60s", file=sys.stderr)
        time.sleep(60)


def make_bench_batch(batch_size: int):
    """The synthetic 832x1344 train batch all bench/A-B experiments measure
    (one definition so exp_profile/exp_frozen_grads/exp_xla_flags compare
    against exactly the bench workload): 20 GT boxes/img uniform in
    position/size, image_hw (800, 1333) in the (832, 1344) bucket."""
    from openset_rcnn_tpu.structures import GroundTruth, ImageBatch

    rng = np.random.RandomState(0)
    G = 100
    boxes = np.zeros((batch_size, G, 4), np.float32)
    classes = np.zeros((batch_size, G), np.int32)
    valid = np.zeros((batch_size, G), bool)
    for b in range(batch_size):
        n = 20
        xy = rng.uniform(0, 600, (n, 2))
        wh = rng.uniform(30, 300, (n, 2))
        boxes[b, :n] = np.concatenate([xy, xy + wh], 1)
        classes[b, :n] = rng.randint(0, 20, n)
        valid[b, :n] = True
    return ImageBatch(
        images=jnp.asarray(rng.uniform(0, 255, (batch_size, H, W, 3)).astype(np.float32)),
        image_hw=jnp.asarray([[800, 1333]] * batch_size, jnp.float32),
        gt=GroundTruth(jnp.asarray(boxes), jnp.asarray(classes), jnp.asarray(valid)),
    )


def preflight() -> None:
    """On-chip kernel gate: refuse to record a bench if the Pallas fast
    paths drift from their exact counterparts on the real device."""
    from openset_rcnn_tpu.models.roi_heads import pool_features
    from openset_rcnn_tpu.models.rpn import rpn_targets
    from openset_rcnn_tpu.ops.anchors import fpn_anchors
    from openset_rcnn_tpu.structures import GroundTruth

    rng = np.random.RandomState(0)
    anchors = jnp.asarray(
        np.concatenate(
            fpn_anchors((H, W), (4, 8, 16, 32, 64),
                        [[32], [64], [128], [256], [512]], [1.0]), 0)
    )
    B, G = 4, 100
    xy = rng.uniform(0, 700, (B, G, 2)).astype(np.float32)
    wh = rng.uniform(20, 400, (B, G, 2)).astype(np.float32)
    gt = GroundTruth(
        boxes=jnp.asarray(np.concatenate([xy, xy + wh], -1)),
        classes=jnp.zeros((B, G), jnp.int32),
        valid=jnp.asarray(rng.rand(B, G) < 0.5),
    )
    key = jax.random.PRNGKey(0)
    ref = jax.jit(lambda g: rpn_targets(anchors, g, key, use_pallas=False))(gt)
    got = jax.jit(lambda g: rpn_targets(anchors, g, key, use_pallas=True))(gt)
    diffs = [float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
             for a, b in zip(ref, got)]
    if max(diffs) != 0.0:
        print(json.dumps({"error": "preflight: fused IoU+matcher not bitwise "
                          f"vs XLA on-chip: {diffs}"}), file=sys.stderr)
        raise SystemExit(2)

    C, S = 256, 128
    feats = {
        f"p{i+2}": jnp.asarray(
            rng.randn(B, H // 4 // 2**i, W // 4 // 2**i, C).astype(np.float32))
        for i in range(4)
    }
    bxy = rng.uniform(0, 500, (B, S, 2)).astype(np.float32)
    bwh = rng.uniform(16, 250, (B, S, 2)).astype(np.float32)
    # aspect <= 3: the pallas kernel level-bumps aspect>3.6 boxes by design
    # (CLAUDE.md known deviations); that deviation has its own unit tests.
    bwh[..., 1] = np.clip(bwh[..., 1], bwh[..., 0] / 3.0, bwh[..., 0] * 3.0)
    boxes = jnp.asarray(np.concatenate([bxy, bxy + bwh], -1))

    def run(impl, bwd="pallas"):
        def f(fs):
            out = pool_features(fs, boxes, impl=impl, bwd_impl=bwd,
                                pool_dtype=jnp.float32)
            return jnp.sum(out * out)

        return float(jax.jit(f)(feats)), jax.tree.map(np.asarray, jax.jit(jax.grad(f))(feats))

    v_ref, g_ref = run("gather")
    v_got, g_got = run("pallas")
    val_rel = abs(v_ref - v_got) / max(abs(v_ref), 1e-30)
    grad_diff = max(float(np.max(np.abs(g_ref[k] - g_got[k]))) for k in feats)
    # historical healthy values: val rel ~1e-7, grad ~1e-6 (PERFORMANCE.md);
    # gate an order of magnitude above that
    if val_rel > 1e-5 or grad_diff > 1e-4:
        print(json.dumps({"error": "preflight: pallas RoIAlign drifted vs "
                          f"gather on-chip: val_rel={val_rel:.3e} "
                          f"grad={grad_diff:.3e}"}), file=sys.stderr)
        raise SystemExit(2)
    # the RECORDED config runs the bf16-accumulator backward
    # (TPU.ROI_ALIGN_BWD=pallas_bf16) — gate it too, against the exact
    # gather grads with a bound sized to accumulator rounding (historical
    # full-step max rel error 7e-3 vs all-XLA, PERFORMANCE.md "bf16 RMW")
    _, g_bf16 = run("pallas", bwd="pallas_bf16")
    gscale = max(float(np.max(np.abs(g_ref[k]))) for k in feats)
    bf16_rel = max(float(np.max(np.abs(g_ref[k] - g_bf16[k]))) for k in feats) / max(gscale, 1e-30)
    if bf16_rel > 3e-2:
        print(json.dumps({"error": "preflight: pallas_bf16 RoIAlign backward "
                          f"drifted vs gather on-chip: rel={bf16_rel:.3e}"}),
              file=sys.stderr)
        raise SystemExit(2)
    print(f"preflight ok: matcher bitwise; roi_align val_rel={val_rel:.2e} "
          f"grad={grad_diff:.2e} bf16_bwd_rel={bf16_rel:.2e}", file=sys.stderr)


def main():
    from openset_rcnn_tpu.engine import build_optimizer, create_train_state, make_train_step
    from openset_rcnn_tpu.engine.train_loop import build_model_spec
    from openset_rcnn_tpu.models import OpensetRCNNModule, compute_anchors

    cfg = load_bench_cfg()
    batch_size = cfg.SOLVER.IMS_PER_BATCH

    # probe BEFORE any backend-touching jax call — on a dead tunnel even
    # jax.default_backend() can block, and only a subprocess can be timed out
    if "cpu" not in os.environ.get("JAX_PLATFORMS", "axon").lower():
        wait_for_chip()
    if os.environ.get("BENCH_PREFLIGHT", "1") != "0" and jax.default_backend() != "cpu":
        preflight()

    spec = build_model_spec(cfg)
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

    batch = make_bench_batch(batch_size)
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

    img_s = batch_size / per_step
    print(
        json.dumps(
            {
                "metric": "train_images_per_sec_per_chip_r50fpn_832x1344",
                "value": round(img_s, 2),
                "unit": "img/s",
                "vs_baseline": round(img_s / A100_BASELINE_IMG_S, 3),
                # audit labels (ADVICE r4): the exact measured configuration
                "config_file": os.path.relpath(BENCH_CONFIG, os.path.dirname(os.path.abspath(__file__))),
                "batch": batch_size,
                "dtype": cfg.TPU.DTYPE,
                "roi_align_bwd": cfg.TPU.ROI_ALIGN_BWD,
            }
        )
    )


if __name__ == "__main__":
    main()
