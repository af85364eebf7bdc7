"""Measure fused-cascade eval throughput on the chip (batched EvalLoader
path, chained dispatches, single end sync — same methodology as bench.py).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_eval.py [BATCH ...]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 832, 1344


def main():
    batches = [int(a) for a in sys.argv[1:]] or [8]
    from openset_rcnn_tpu.config import get_default_cfg
    from openset_rcnn_tpu.evaluation.postprocess import PostprocessConfig
    from openset_rcnn_tpu.evaluation.testing import CompiledInference
    from openset_rcnn_tpu.models import ModelSpec, OpensetRCNNModule, opendet_id_map

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
    post_cfg = PostprocessConfig.from_cfg(cfg, True, None)
    infer = CompiledInference(module, params, spec, post_cfg=post_cfg)

    rng = np.random.RandomState(0)
    for B in batches:
        images = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
        hw = jnp.asarray([[800.0, 1333.0]] * B, jnp.float32)

        def run(n):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = infer(images, hw)
            _ = float(out.scores[0, 0])  # hard sync
            return time.perf_counter() - t0

        run(3)
        t_short = run(5)
        t_long = run(20)
        per_batch = (t_long - t_short) / 15
        print(f"batch {B}: {per_batch * 1e3:.1f} ms/batch  {B / per_batch:.1f} img/s")


if __name__ == "__main__":
    main()
