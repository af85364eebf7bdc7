"""Capture a profiler trace of the production-config train step and print
the top device ops by total duration (parses the xplane proto directly).

The profiled configuration is bench.py's: the checked-in production yaml
(configs/VOC-COCO/openset_rcnn_R50_FPN_128k_tpu.yaml — bf16, batch 16,
pallas_bf16 RoIAlign-grad accumulators) + the same BENCH_* env overrides.
Prints device-busy ms/step by op family, plus device-busy MFU next to
wall MFU (VERDICT r4 item 4).

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/exp_profile.py [out_dir]
(APPEND to PYTHONPATH — overwriting drops /root/.axon_site and with it the
TPU backend, CLAUDE.md)
"""
from __future__ import annotations

import glob
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

H, W = 832, 1344
PROFILE_STEPS = 5
# Ceiling math (PERFORMANCE.md "Train-perf levers"): ~0.98 TFLOP/img
# trained (fwd+bwd) at 832x1344; v5e bf16 peak ~197 TFLOP/s.
TFLOP_PER_IMG = 0.98
V5E_PEAK_TFLOPS = 197.0


def build():
    from openset_rcnn_tpu.engine import build_optimizer, create_train_state, make_train_step
    from openset_rcnn_tpu.engine.train_loop import build_model_spec
    from openset_rcnn_tpu.models import OpensetRCNNModule, compute_anchors

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import load_bench_cfg, make_bench_batch

    cfg = load_bench_cfg()
    spec = build_model_spec(cfg)
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

    BATCH = cfg.SOLVER.IMS_PER_BATCH
    print(f"profiling config: batch={BATCH} dtype={cfg.TPU.DTYPE} "
          f"roi_align_bwd={cfg.TPU.ROI_ALIGN_BWD}")
    return step_fn, state, make_bench_batch(BATCH)


def summarize(out_dir: str, top: int = 30, batch: int | None = None,
              steps: int = PROFILE_STEPS, wall_ms_per_step: float | None = None):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    paths = glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no xplane found under", out_dir)
        return
    totals = {}
    compute_iv, any_iv = [], []  # (start_ps, end_ps) for interval unions
    model_flops = {}  # per unique op, from XLA's own op stats
    op_meta = {}      # name -> (hlo_category, bytes_accessed)
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name.lower():
                continue
            emeta = plane.event_metadata
            smeta = {k: v.name for k, v in plane.stat_metadata.items()}
            for line in plane.lines:
                if "XLA Ops" not in line.name and "ops" not in line.name.lower():
                    continue
                for ev in line.events:
                    em = emeta.get(ev.metadata_id)
                    name = em.name if em else str(ev.metadata_id)
                    totals[name] = totals.get(name, 0) + ev.duration_ps
                    if em is not None and name not in model_flops:
                        cat, nbytes = "", 0
                        for s in em.stats:
                            key = smeta.get(s.metadata_id)
                            if key == "model_flops":
                                model_flops[name] = s.int64_value or s.uint64_value
                            elif key == "hlo_category":
                                cat = s.str_value
                            elif key == "bytes_accessed":
                                nbytes = s.int64_value or s.uint64_value
                        op_meta[name] = (cat, nbytes)
                    iv = (line.timestamp_ns * 1000 + ev.offset_ps,
                          line.timestamp_ns * 1000 + ev.offset_ps + ev.duration_ps)
                    any_iv.append(iv)
                    # async -start ops' duration is issue->complete latency,
                    # overlapping compute (weight/arg prefetches) — exclude
                    # from the TensorCore-busy union
                    if "-start" not in name.split(" =")[0]:
                        compute_iv.append(iv)

    def union_ms(ivs):
        if not ivs:
            return 0.0
        ivs = sorted(ivs)
        tot, cs, ce = 0, *ivs[0]
        for s, e in ivs[1:]:
            if s > ce:
                tot += ce - cs
                cs, ce = s, e
            else:
                ce = max(ce, e)
        return (tot + ce - cs) / 1e9
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
    tot = sum(totals.values())
    print(f"total device op time: {tot/1e9:.2f} ms (all steps)")
    for name, ps in rows:
        print(f"{ps/1e9:9.2f} ms  {100*ps/tot:5.1f}%  {name[:120]}")
    # grouped view: fold HLO instruction names into op families so the
    # breakdown is readable (copy-start/-done are async and overlap compute —
    # their "duration" includes wait time, so treat the group as an upper
    # bound, not real busy time).
    import re

    groups = {}
    for name, ps in totals.items():
        m = re.match(r"%?([a-zA-Z_-]+?)[.\d]*\s*=", name) or re.match(r"%?([a-zA-Z_-]+)", name)
        key = m.group(1) if m else name
        if "fusion" in key:
            key = "fusion"
        groups[key] = groups.get(key, 0) + ps
    print("\nby op family (per profiled step):")
    for key, ps in sorted(groups.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{ps/1e9/steps:9.2f} ms  {100*ps/tot:5.1f}%  {key}")

    # roofline by XLA hlo_category: achieved TFLOP/s, HBM GiB/s, MFU%
    if op_meta:
        cats = {}
        for name, ps in totals.items():
            cat, nbytes = op_meta.get(name, ("?", 0))
            a = cats.setdefault(cat or "?", [0, 0, 0])
            a[0] += ps
            a[1] += model_flops.get(name, 0)
            a[2] += nbytes
        print(f"\nroofline by hlo_category (per step; v5e peaks ~197 bf16 "
              f"TFLOP/s, ~810 GB/s HBM):")
        print(f"{'category':24} {'ms/step':>8} {'TFLOP/s':>8} {'GiB/s':>7} {'MFU%':>6}")
        for cat, (ps, fl, by) in sorted(cats.items(), key=lambda kv: -kv[1][0]):
            ms = ps / 1e9 / steps
            if ms < 0.3:
                continue
            # fl/by are per-execution (recorded once per unique op, each op
            # runs once per step) -> already per-step totals
            sec = ms / 1e3
            print(f"{cat:24} {ms:8.1f} {fl/1e12/sec:8.1f} "
                  f"{by/2**30/sec:7.0f} {100*fl/1e12/sec/V5E_PEAK_TFLOPS:6.1f}")

    busy_any = union_ms(any_iv) / steps
    busy_compute = union_ms(compute_iv) / steps
    print(f"\nbusy (interval union): any-op {busy_any:.1f} ms/step, "
          f"compute (excl. async -start) {busy_compute:.1f} ms/step; "
          f"summed-duration total {tot/1e9/steps:.1f} ms/step "
          f"(inflated by async wait)")
    measured_any = sum(model_flops.values()) > 0
    if batch is not None or measured_any:
        measured = sum(model_flops.values()) / 1e12
        if measured > 0:
            # XLA's own per-op model_flops (each unique HLO op executes once
            # per step) — supersedes the hand estimate
            tflop_step = measured
            src = "XLA model_flops"
        elif batch is not None:
            tflop_step = TFLOP_PER_IMG * batch
            src = f"hand estimate {TFLOP_PER_IMG} TFLOP/img"
        else:
            return
        busy_mfu = tflop_step / (busy_compute / 1e3) / V5E_PEAK_TFLOPS
        print(f"MFU ({tflop_step:.1f} TFLOP/step, {src}): "
              f"compute-busy {busy_compute:.1f} ms/step -> "
              f"{tflop_step/(busy_compute/1e3):.1f} TFLOP/s = "
              f"{100*busy_mfu:.1f}% device-busy MFU", end="")
        if wall_ms_per_step:
            wall_mfu = tflop_step / (wall_ms_per_step / 1e3) / V5E_PEAK_TFLOPS
            print(f"; wall {wall_ms_per_step:.1f} ms/step -> "
                  f"{100*wall_mfu:.1f}% wall MFU "
                  f"(wall/busy {wall_ms_per_step/busy_compute:.2f}x)")
        else:
            print()


def main():
    import time

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/exp_profile"
    step_fn, state, batch = build()
    nimg = int(batch.images.shape[0])
    key = jax.random.PRNGKey(0)
    for _ in range(3):  # warmup / compile
        state, m = step_fn(state, batch, key)
    _ = float(m["total_loss"])
    jax.profiler.start_trace(out_dir)
    t0 = time.perf_counter()
    for _ in range(PROFILE_STEPS):
        state, m = step_fn(state, batch, key)
    _ = float(m["total_loss"])
    wall_ms = (time.perf_counter() - t0) * 1e3 / PROFILE_STEPS
    jax.profiler.stop_trace()
    print("trace written to", out_dir)
    summarize(out_dir, batch=nimg, wall_ms_per_step=wall_ms)


if __name__ == "__main__":
    if os.environ.get("SUMMARIZE_ONLY"):
        summarize(sys.argv[1])
    else:
        main()
