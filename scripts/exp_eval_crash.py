"""Isolate the eval-path TPU worker crash (round 4).

bench_eval.py (fused eval at batch 16, ~3882 proposals/img) reliably kills
the tunneled TPU worker, while the train bench (batch 16, 512 RoIs/img)
and entry() run fine. This driver rebuilds the exact eval proposal
distribution (same model, same random init, same select_proposals) and
exercises ONLY the suspected stage, controlled by env vars:

  STAGE=pool      just pool_features (pallas fwd) on the eval proposals
  STAGE=heads     pool + box head + predictor heads
  STAGE=raw       inference_forward (no fused cascade)
  STAGE=cascade   inference_forward + fused_cascade (the full bench graph)
  R=<n>           override proposals per image (default: real top-k count)
  B=<n>           batch (default 16)
  IMPL=pallas|gather
  NMS=xla         force the XLA NMS fallback inside the fused cascade
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

H, W = 832, 1344
B = int(os.environ.get("B", 16))
STAGE = os.environ.get("STAGE", "pool")
IMPL = os.environ.get("IMPL", "pallas")


def main():
    from openset_rcnn_tpu.config import get_default_cfg
    from openset_rcnn_tpu.models import (
        ModelSpec, OpensetRCNNModule, compute_anchors, opendet_id_map,
    )
    from openset_rcnn_tpu.models.detector import OpensetRCNNModule as M, inference_forward
    from openset_rcnn_tpu.models.roi_heads import pool_features
    from openset_rcnn_tpu.models.rpn import select_proposals
    from openset_rcnn_tpu.ops import Box2BoxTransformLinear

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
    anchors_np, level_sizes = compute_anchors(spec, (H, W))
    anchors = jnp.asarray(anchors_np)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    hw = jnp.asarray([[800.0, 1333.0]] * B, jnp.float32)

    if os.environ.get("NMS") == "xla":
        # force ONLY the NMS onto the XLA fallback (patching
        # pallas_device_local would also flip RoIAlign to gather -> OOM)
        import openset_rcnn_tpu.models.serving as serving_mod
        import openset_rcnn_tpu.ops.nms as nms_mod

        orig = nms_mod.nms_mask
        forced = lambda b, s, v, t, use_pallas=None: orig(b, s, v, t, use_pallas=False)
        nms_mod.nms_mask = forced
        serving_mod.nms_mask = forced

    if STAGE == "cascade_only":
        # run JUST fused_cascade on synthetic raw-detection tensors shaped
        # like the real eval outputs — tiny compile, fast bisection
        from openset_rcnn_tpu.models.serving import fused_cascade
        from openset_rcnn_tpu.structures import RawDetections

        P = int(os.environ.get("R", 4273))
        r = np.random.RandomState(0)
        xy = r.uniform(0, 1200, (B, P, 2)).astype(np.float32)
        wh = r.uniform(5, 300, (B, P, 2)).astype(np.float32)
        obj = jnp.asarray(r.uniform(0, 1, (B, P)).astype(np.float32))
        raw = RawDetections(
            boxes=jnp.asarray(np.concatenate([xy, xy + wh], -1)),
            objectness=obj,
            min_dist=jnp.asarray(r.uniform(0, 1, (B, P)).astype(np.float32)),
            pln_class=jnp.zeros((B, P), jnp.int32),
            known_probs=jnp.asarray(r.dirichlet(np.ones(21), (B, P)).astype(np.float32)),
            valid=jnp.asarray(r.rand(B, P) < 0.9),
            pred_iou=obj,
            centerness=obj,
        )
        fn = jax.jit(lambda rw: fused_cascade(rw, stage1_topk=1000,
                                              max_known_candidates=2000))
        out = fn(raw)
        print("cascade_only ok:", B, P, float(out.scores.sum()))
        return

    if STAGE == "parity":
        # the PARITY config's eval path at production shape: f32 trunk,
        # gather RoIAlign with the adaptive ceil(roi/7) grid, raw outputs
        # for the host cascade, EVAL_BATCH_SIZE=8 (round 4: validates the
        # budgeted gather chunking fits HBM where the single-shot gather
        # OOMed at 74.6 GB)
        cfg2 = get_default_cfg()
        cfg2.MODEL.ROI_HEADS.NUM_CLASSES = 81
        cfg2.MODEL.ROI_HEADS.NUM_KNOWN_CLASSES = 20
        cfg2.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
        cfg2.OPENDET_BENCHMARK = True
        cfg2.TPU.ROI_ALIGN_IMPL = "gather"
        cfg2.TPU.ROI_SAMPLING_RATIO = -1
        cfg2.TPU.DTYPE = "float32"
        spec2 = ModelSpec.from_cfg(cfg2, opendet_id_map(81, 20))
        module2 = OpensetRCNNModule(spec=spec2)
        params2 = jax.jit(
            lambda: module2.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))["params"]
        )()
        Bp = 8
        fn = jax.jit(
            lambda p, im, ih: inference_forward(
                module2, p, im, ih, spec2, anchors, level_sizes
            )
        )
        out = fn(params2, images[:Bp], hw[:Bp])
        print("parity-eval ok:", Bp, float(out.objectness.sum()))
        return

    if STAGE == "split":
        # two chained device dispatches: raw-forward jit -> cascade jit
        # (device arrays flow between them, no host transfer)
        from openset_rcnn_tpu.models.serving import fused_cascade

        raw_fn = jax.jit(
            lambda p, im, ih: inference_forward(
                module, p, im, ih, spec, anchors, level_sizes
            )
        )
        casc_fn = jax.jit(
            lambda rw: fused_cascade(rw, stage1_topk=1000, max_known_candidates=2000)
        )
        import time

        for it in range(4):
            t0 = time.perf_counter()
            out = casc_fn(raw_fn(params, images, hw))
            s = float(out.scores.sum())
            print(f"split iter {it}: ok sum={s:.2f} {time.perf_counter()-t0:.2f}s")
        return

    if STAGE in ("raw", "cascade"):
        if STAGE == "raw":
            fn = jax.jit(
                lambda p, im, ih: inference_forward(
                    module, p, im, ih, spec, anchors, level_sizes
                )
            )
            out = fn(params, images, hw)
            print("raw ok:", float(out.objectness.sum()))
        else:
            from openset_rcnn_tpu.evaluation.postprocess import PostprocessConfig
            from openset_rcnn_tpu.evaluation.testing import CompiledInference

            pc = PostprocessConfig.from_cfg(cfg, True, None)
            infer = CompiledInference(module, params, spec, post_cfg=pc)
            out = infer(images, hw)
            print("cascade ok:", float(out.scores.sum()))
        return

    tf = Box2BoxTransformLinear(normalize_by_size=True)

    @jax.jit
    def get_props(p, im, ih):
        feats = module.apply({"params": p}, im, ih, method=M.features)
        deltas, ctrs, _ = module.apply({"params": p}, feats, method=M.rpn_predictions)
        props = select_proposals(
            anchors, deltas, ctrs, level_sizes, ih, tf,
            pre_topk=spec.pre_nms_topk_test, min_box_size=spec.min_box_size,
        )
        return feats, props

    feats, props = get_props(params, images, hw)
    boxes = props.boxes
    if "R" in os.environ:
        boxes = boxes[:, : int(os.environ["R"])]
    print("proposals:", boxes.shape, "finite:", bool(jnp.isfinite(boxes).all()))

    @jax.jit
    def pool(fs, bx):
        return pool_features(
            fs, bx, resolution=spec.pooler_resolution,
            sampling_ratio=spec.roi_sampling_ratio, impl=IMPL,
        )

    pooled = pool(feats, boxes)
    print("pool ok:", STAGE, IMPL, pooled.shape, float(pooled.astype(jnp.float32).sum()))
    if STAGE == "heads":
        @jax.jit
        def heads(p, fs, bx):
            return module.apply({"params": p}, fs, bx, method=M.roi_forward)

        out = heads(params, feats, boxes)
        print("heads ok:", float(out[2].sum()))


if __name__ == "__main__":
    main()
