"""Isolate the eval-path TPU worker crash (round 4; ROOT-CAUSED round 5).

Round-5 result (full probe table in PERFORMANCE.md): the crash is the
KNOWN-branch candidate selection at a small stage-1 top-k
(TEST.DETECTIONS_PER_IMAGE=100, the yacs default the round-4 bench_eval
accidentally measured) fused into one program with the forward —
`STAGE=fused TOPK=100 SUB=known` crashes; the same branch compiled alone,
the unknown/stage-1-only variants, and the full program at TOPK=1000 all
run clean; AOT memory_analysis shows 3.8 of 16 GiB (not OOM).

This driver rebuilds the exact eval proposal distribution (same model,
same random init, same select_proposals) and exercises ONLY the suspected
stage, controlled by env vars:

  STAGE=pool      just pool_features (pallas fwd) on the eval proposals
  STAGE=heads     pool + box head + predictor heads
  STAGE=raw       inference_forward (no fused cascade)
  STAGE=cascade   inference_forward + fused_cascade via CompiledInference
                  (round 4: this was ONE program and crashed; since the
                  split fix it chains two jits and no longer reproduces)
  STAGE=fused     the ORIGINAL crashing configuration: forward + cascade
                  in ONE jitted program (round-5 bisection entry)
  STAGE=memstats  AOT-compile fused vs the two split halves and print
                  XLA memory_analysis — no execution, crash-free evidence
  SUB=topk|known|unknown  (with STAGE=fused) keep only that cascade stage
  STUB=1          (with STAGE=fused) replace the ResNet+FPN backbone with
                  a single strided conv per level (same feature shapes) —
                  if the crash survives, the repro does not need the trunk
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

    if STAGE in ("fused", "memstats"):
        # the ORIGINAL round-4 crashing configuration: backbone + CF-RPN +
        # ROI heads + fused cascade as ONE jitted program (evaluation/
        # testing.py now splits this into two chained jits as the fix)
        from openset_rcnn_tpu.models.serving import fused_cascade

        if os.environ.get("STUB") == "1":
            # bypass ResNet+FPN: same feature shapes from strided slices of
            # the image (one channel broadcast to 256) — isolates whether
            # the crash needs the trunk's convs in the program
            dt = jnp.bfloat16 if cfg.TPU.DTYPE == "bfloat16" else jnp.float32

            def features_fn(im):
                x = (im[..., :1] / 255.0).astype(dt)
                return {
                    f"p{i+2}": jnp.tile(x[:, :: 4 * 2**i, :: 4 * 2**i, :], (1, 1, 1, 256))
                    for i in range(5)
                }
        else:
            features_fn = None

        from openset_rcnn_tpu.models.detector import raw_detections
        from openset_rcnn_tpu.ops import Box2BoxTransform

        def raw_fn(p, im, ih):
            if features_fn is None:
                return inference_forward(module, p, im, ih, spec, anchors, level_sizes)
            fpn_feats = features_fn(im)
            linear_tf = Box2BoxTransformLinear(normalize_by_size=True)
            roi_tf = Box2BoxTransform(spec.bbox_reg_weights)
            pred_deltas, pred_ctr, _ = module.apply(
                {"params": p}, fpn_feats, method=M.rpn_predictions
            )
            props = select_proposals(
                anchors, pred_deltas, pred_ctr, level_sizes, ih, linear_tf,
                pre_topk=spec.pre_nms_topk_test, min_box_size=spec.min_box_size,
            )
            _, deltas, iou, emb, rec, reps, logits = module.apply(
                {"params": p}, fpn_feats, props.boxes, method=M.roi_forward
            )
            return raw_detections(
                props, deltas, iou, emb, reps, logits, ih, roi_tf,
                spec.num_known_classes, spec.reps_per_class,
                mean_type=spec.mean_type, distance_type=spec.distance_type,
            )

        SUB = os.environ.get("SUB")

        TOPK = int(os.environ.get("TOPK", 1000))  # crash config had 100
        MKC = int(os.environ.get("MKC", 2000))   # 1999 breaks k==n in the
        # known-branch top_k (at TOPK=100, 2000 == 100*20 flattened cands)

        def casc_fn(raw):
            if SUB is None:
                # full padded ServeDetections output — the faithful round-4
                # crashing graph (SUM=1 reduces to a scalar instead, which
                # changes the program tail)
                out = fused_cascade(raw, stage1_topk=TOPK, max_known_candidates=MKC)
                if os.environ.get("SUM") == "1":
                    return out.scores.sum()
                return out
            from openset_rcnn_tpu.ops import batched_nms_mask, nms_mask

            def single(b, o, m, pr, v):
                keep1 = v & (o > 0.05)
                s1, i1 = jax.lax.top_k(jnp.where(keep1, o, -jnp.inf), TOPK)
                v1 = jnp.isfinite(s1)
                boxes1 = b[i1]
                probs1 = pr[i1][:, :-1]
                obj1 = jnp.where(v1, o[i1], 0.0)
                if SUB == "topk":
                    return boxes1.sum() + obj1.sum()
                is_unknown = m[i1] > 0.23
                if SUB == "known":
                    cand = (~is_unknown[:, None]) & v1[:, None] & (probs1 > 0.05)
                    ks = jnp.where(cand, probs1, -jnp.inf).reshape(-1)
                    cs, ci = jax.lax.top_k(ks, min(MKC, ks.shape[0]))
                    cv = jnp.isfinite(cs)
                    K = probs1.shape[-1]
                    res = batched_nms_mask(
                        boxes1[ci // K], jnp.where(cv, cs, 0.0),
                        (ci % K).astype(jnp.int32), cv, 0.5)
                    return res.keep.sum()
                umask = is_unknown & v1
                ures = nms_mask(boxes1, jnp.where(umask, obj1, 0.0), umask, 0.5)
                return ures.keep.sum()

            return jax.vmap(single)(
                raw.boxes, raw.objectness, raw.min_dist, raw.known_probs, raw.valid
            ).sum()

        def fused_fn(p, im, ih):
            return casc_fn(raw_fn(p, im, ih))

        if STAGE == "memstats":
            def report(tag, compiled):
                try:
                    ma = compiled.memory_analysis()
                except Exception as e:  # backend-version dependent surface
                    print(f"{tag}: memory_analysis unavailable ({e})")
                    return
                fields = [f for f in dir(ma) if f.endswith("_in_bytes")]
                parts = {f: getattr(ma, f) for f in fields}
                pretty = ", ".join(
                    f"{f.replace('_size_in_bytes','')}={v/2**30:.2f}GiB"
                    for f, v in sorted(parts.items(), key=lambda kv: -kv[1]))
                print(f"{tag}: {pretty}")

            report("fused(one program)",
                   jax.jit(fused_fn).lower(params, images, hw).compile())
            report("split: raw half",
                   jax.jit(raw_fn).lower(params, images, hw).compile())
            raw_sds = jax.eval_shape(raw_fn, params, images, hw)
            report("split: cascade half",
                   jax.jit(casc_fn).lower(raw_sds).compile())
            return

        import time

        fused_c = jax.jit(fused_fn)
        for it in range(3):
            t0 = time.perf_counter()
            out = fused_c(params, images, hw)
            s = float(out.scores.sum()) if hasattr(out, "scores") else float(out)
            print(f"fused iter {it}: ok sum={s:.2f} {time.perf_counter()-t0:.2f}s "
                  f"(B={B} STUB={os.environ.get('STUB')} SUB={SUB} NMS={os.environ.get('NMS')})")
        return

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
        topk = int(os.environ.get("TOPK", 1000))
        fn = jax.jit(lambda rw: fused_cascade(rw, stage1_topk=topk,
                                              max_known_candidates=2000))
        out = fn(raw)
        print("cascade_only ok:", B, P, topk, float(out.scores.sum()))
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
