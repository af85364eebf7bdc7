"""Capture a profiler trace of the batch-8 train step and print the top
device ops by total duration (parses the xplane proto directly).

Usage: PYTHONPATH=. python scripts/exp_profile.py [out_dir]
"""
from __future__ import annotations

import glob
import gzip
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

H, W = 832, 1344
BATCH = int(os.environ.get("BENCH_BATCH", 8))
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")  # match bench.py's default


def build():
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
    cfg.OPENDET_BENCHMARK = True
    cfg.TPU.DTYPE = DTYPE
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
    return step_fn, state, batch


def summarize(out_dir: str, top: int = 30):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    paths = glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no xplane found under", out_dir)
        return
    totals = {}
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name.lower():
                continue
            emeta = {k: v.name for k, v in plane.event_metadata.items()}
            for line in plane.lines:
                if "XLA Ops" not in line.name and "ops" not in line.name.lower():
                    continue
                for ev in line.events:
                    name = emeta.get(ev.metadata_id, str(ev.metadata_id))
                    totals[name] = totals.get(name, 0) + ev.duration_ps
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
    print("\nby op family:")
    for key, ps in sorted(groups.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{ps/1e9:9.2f} ms  {100*ps/tot:5.1f}%  {key}")


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/exp_profile"
    step_fn, state, batch = build()
    key = jax.random.PRNGKey(0)
    for _ in range(3):  # warmup / compile
        state, m = step_fn(state, batch, key)
    _ = float(m["total_loss"])
    jax.profiler.start_trace(out_dir)
    for _ in range(5):
        state, m = step_fn(state, batch, key)
    _ = float(m["total_loss"])
    jax.profiler.stop_trace()
    print("trace written to", out_dir)
    summarize(out_dir)


if __name__ == "__main__":
    if os.environ.get("SUMMARIZE_ONLY"):
        summarize(sys.argv[1])
    else:
        main()
