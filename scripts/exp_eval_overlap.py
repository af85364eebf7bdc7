"""do_test wall-clock decomposition on the real chip (VERDICT r4 item 8).

Measures, for the fused eval pipeline at batch 16:
  1. device-only:   chained dispatch of the fused forward+cascade, one sync
                    (the floor the host must keep up with);
  2. host-only:     finalize_serve_image + evaluator.process on prefetched
                    outputs (the per-batch host cost, no device in the way);
  3. pipelined:     inference_on_dataset's 1-batch overlap loop end-to-end.

If (3) ~= max(1, 2) the host work hides under device compute and there is
nothing to win; if (3) ~= (1) + (2) they serialize and overlap is broken.
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
N_BATCHES = 12


def main():
    from openset_rcnn_tpu.config import get_default_cfg
    from openset_rcnn_tpu.evaluation.postprocess import (
        PostprocessConfig,
        finalize_serve_image,
    )
    from openset_rcnn_tpu.evaluation.testing import CompiledInference
    from openset_rcnn_tpu.models import ModelSpec, OpensetRCNNModule, opendet_id_map

    cfg = get_default_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 81
    cfg.MODEL.ROI_HEADS.NUM_KNOWN_CLASSES = 20
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
    cfg.OPENDET_BENCHMARK = True
    cfg.TPU.DTYPE = "bfloat16"
    spec = ModelSpec.from_cfg(cfg, opendet_id_map(81, 20))
    module = OpensetRCNNModule(spec=spec)
    params = jax.jit(
        lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))["params"]
    )()
    post_cfg = PostprocessConfig.from_cfg(cfg, True, None)
    infer = CompiledInference(module, params, spec, post_cfg=post_cfg)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.uniform(0, 255, (BATCH, H, W, 3)).astype(np.float32))
    hw = jnp.asarray([[800.0, 1333.0]] * BATCH, jnp.float32)

    # warmup + one output prototype for host-side timing
    out0 = infer(images, hw)
    out0_np = jax.tree.map(np.asarray, out0)
    _ = float(out0.scores[0, 0])

    # 1) device-only: chained dispatches, single sync
    t0 = time.perf_counter()
    out = None
    for _ in range(N_BATCHES):
        out = infer(images, hw)
    _ = float(out.scores[0, 0])
    dev = (time.perf_counter() - t0) / N_BATCHES

    # 2) host-only: finalize + a VOC-style process() shim on prefetched arrays
    per_class = {c: [] for c in range(21)}

    def process(dets):
        for b, s, c in zip(dets.boxes, dets.scores, dets.classes):
            per_class[int(min(c, 20))].append((float(s), tuple(map(float, b))))

    t0 = time.perf_counter()
    for _ in range(N_BATCHES):
        for i in range(BATCH):
            dets = finalize_serve_image(
                out0_np.boxes[i], out0_np.scores[i], out0_np.classes[i],
                out0_np.valid[i], (800.0, 1333.0), (750.0, 1250.0), post_cfg,
            )
            process(dets)
    host = (time.perf_counter() - t0) / N_BATCHES

    # 3) pipelined loop (device->host transfer + finalize overlapping the
    # next dispatch), mirroring inference_on_dataset
    def consume(o):
        o_np = jax.tree.map(np.asarray, o)
        for i in range(BATCH):
            dets = finalize_serve_image(
                o_np.boxes[i], o_np.scores[i], o_np.classes[i], o_np.valid[i],
                (800.0, 1333.0), (750.0, 1250.0), post_cfg,
            )
            process(dets)

    t0 = time.perf_counter()
    pending = None
    for _ in range(N_BATCHES):
        o = infer(images, hw)
        if pending is not None:
            consume(pending)
        pending = o
    consume(pending)
    piped = (time.perf_counter() - t0) / N_BATCHES

    print(
        f"device-only {dev*1000:.1f} ms/batch ({BATCH/dev:.1f} img/s) | "
        f"host finalize+process {host*1000:.1f} ms/batch | "
        f"pipelined {piped*1000:.1f} ms/batch ({BATCH/piped:.1f} img/s)"
    )
    overlap = "hidden" if piped < dev + 0.5 * host else "SERIALIZED"
    print(f"host work is {overlap} (pipelined vs device+host: "
          f"{piped*1000:.1f} vs {(dev+host)*1000:.1f} ms)")


if __name__ == "__main__":
    main()
