"""Inference harness: drive eval over a dataset and score it.

Equivalent of d2's ``inference_on_dataset`` (train.py:96, SURVEY.md §3.2):
compiled device forward per image bucket, host cascade, evaluator feeding.
The jit cache keys on the (static) bucket shape, so at most two compiled
graphs exist (landscape/portrait).
"""
from __future__ import annotations

import logging
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import ModelSpec, OpensetRCNNModule, compute_anchors, inference_forward
from .postprocess import PostprocessConfig, postprocess_image

logger = logging.getLogger(__name__)


class _TwoStageInference:
    """Chained raw-forward + cascade jits (see CompiledInference.__call__)."""

    def __init__(self, raw_c, casc_c):
        self.raw_c = raw_c
        self.casc_c = casc_c

    def __call__(self, params, images, image_hw):
        return self.casc_c(self.raw_c(params, images, image_hw))

    def _cache_size(self):
        # recompilation guard for tests: both stages must stay at 1 entry
        return max(self.raw_c._cache_size(), self.casc_c._cache_size())


class CompiledInference:
    """Caches a jitted inference function per image bucket.

    ``post_cfg`` set: the full 3-stage open-set cascade is FUSED into the
    device graph (models/serving.py) and the call returns small padded
    ``ServeDetections`` — one device dispatch and a tiny transfer per batch,
    with only coordinate rescale left on the host. Unset: returns raw
    per-proposal outputs for the exact host cascade (the parity oracle,
    evaluation/postprocess.py)."""

    def __init__(
        self,
        module: OpensetRCNNModule,
        params,
        spec: ModelSpec,
        post_cfg: Optional[PostprocessConfig] = None,
        mesh=None,
    ):
        """``mesh``: optional ('data','model') mesh — the batch is sharded
        over 'data' and params replicated, so a single-process multi-chip
        deployment evaluates on every chip instead of one (the train mesh's
        DP analog for inference; reference scope is 1 image/GPU/process)."""
        self.module = module
        self.spec = spec
        self.post_cfg = post_cfg
        self.mesh = mesh
        if mesh is not None:
            from ..parallel import replicated

            params = jax.device_put(params, replicated(mesh))
        self.params = params
        self._cache: Dict[tuple, Callable] = {}

    def __call__(self, images: jnp.ndarray, image_hw: jnp.ndarray):
        bucket = tuple(images.shape[1:3])
        if bucket not in self._cache:
            anchors, level_sizes = compute_anchors(self.spec, bucket)
            anchors = jnp.asarray(anchors)
            spec, module, pc = self.spec, self.module, self.post_cfg

            def raw_fn(params, images, image_hw):
                return inference_forward(
                    module, params, images, image_hw, spec, anchors, level_sizes
                )

            if pc is not None:
                from ..models.serving import fused_cascade

                def casc_fn(raw):
                    return fused_cascade(
                        raw,
                        obj_thresh=pc.obj_score_thresh,
                        unk_thr=pc.unk_thr,
                        known_score_thresh=pc.known_score_thresh,
                        known_nms_thresh=pc.known_nms_thresh,
                        known_topk=pc.known_topk,
                        unknown_score_thresh=pc.unknown_score_thresh,
                        unknown_nms_thresh=pc.unknown_nms_thresh,
                        unknown_topk=pc.unknown_topk,
                        unknown_id=pc.unknown_id,
                        stage1_topk=pc.detections_per_image,
                        max_known_candidates=max(2 * pc.detections_per_image, 2000),
                    )

            # The forward and the cascade are TWO chained jits (device arrays
            # flow between them; dispatches pipeline, still one host sync per
            # pull). Fusing both into one program deterministically crashes
            # the TPU worker when detections_per_image is SMALL (the yacs
            # default 100): round-5 bisection pinned it to the known-branch
            # candidate selection (near-full top_k + tiny gather table)
            # fused with the forward — not memory (3.8 of 16 GiB), not the
            # Pallas kernels; topk=1000 (the benchmark configs) is
            # execution-validated clean. The split is kept for ALL configs
            # because it is crash-free everywhere at zero throughput cost:
            # chained-slope measured 87.9 img/s split vs 88.1 fused at
            # batch 16 / topk=1000 (BENCH_EVAL_r05.json; equal within
            # noise). PERFORMANCE.md "root cause of the fused-eval crash".
            if self.mesh is None:
                raw_c = jax.jit(raw_fn)
                casc_c = jax.jit(casc_fn) if pc is not None else None
            else:
                from jax.sharding import NamedSharding, PartitionSpec as P

                batch_sh = NamedSharding(self.mesh, P("data"))
                rep = NamedSharding(self.mesh, P())
                raw_c = jax.jit(
                    raw_fn,
                    in_shardings=(rep, batch_sh, batch_sh),
                    out_shardings=batch_sh,
                )
                casc_c = (
                    jax.jit(casc_fn, in_shardings=batch_sh, out_shardings=batch_sh)
                    if pc is not None
                    else None
                )
            if casc_c is None:
                self._cache[bucket] = raw_c
            else:
                self._cache[bucket] = _TwoStageInference(raw_c, casc_c)
            logger.info(
                "compiled inference for bucket %s (fused=%s, mesh=%s)",
                bucket, pc is not None, self.mesh is not None,
            )
        return self._cache[bucket](self.params, images, image_hw)


class CompiledProposals:
    """Backbone + CF-RPN + top-k proposal selection only — the device side
    of the box-proposals AR task (reference `_eval_box_proposals`,
    os_coco_evaluation.py:297-334). Skips the ROI heads entirely."""

    def __init__(self, module: OpensetRCNNModule, params, spec: ModelSpec, mesh=None):
        self.module = module
        self.spec = spec
        self.mesh = mesh
        if mesh is not None:
            from ..parallel import replicated

            params = jax.device_put(params, replicated(mesh))
        self.params = params
        self._cache: Dict[tuple, Callable] = {}

    def __call__(self, images: jnp.ndarray, image_hw: jnp.ndarray):
        bucket = tuple(images.shape[1:3])
        if bucket not in self._cache:
            from ..models.detector import OpensetRCNNModule as M
            from ..models.rpn import select_proposals
            from ..ops import Box2BoxTransformLinear

            anchors_np, level_sizes = compute_anchors(self.spec, bucket)
            anchors = jnp.asarray(anchors_np)
            spec, module = self.spec, self.module
            tf = Box2BoxTransformLinear(normalize_by_size=True)

            def fn(params, images, image_hw):
                feats = module.apply(
                    {"params": params}, images, image_hw, method=M.features
                )
                deltas, ctrs, _ = module.apply(
                    {"params": params}, feats, method=M.rpn_predictions
                )
                return select_proposals(
                    anchors, deltas, ctrs, level_sizes, image_hw, tf,
                    pre_topk=spec.pre_nms_topk_test, min_box_size=spec.min_box_size,
                )

            if self.mesh is None:
                self._cache[bucket] = jax.jit(fn)
            else:
                from jax.sharding import NamedSharding, PartitionSpec as P

                batch_sh = NamedSharding(self.mesh, P("data"))
                rep = NamedSharding(self.mesh, P())
                self._cache[bucket] = jax.jit(
                    fn, in_shardings=(rep, batch_sh, batch_sh), out_shardings=batch_sh
                )
        return self._cache[bucket](self.params, images, image_hw)


def proposal_ar_on_dataset(
    infer: CompiledProposals,
    loader,
    records,
    limits=(100, 1000),
) -> Dict[str, float]:
    """Collect proposals per image, gather across processes, score AR
    against ALL GT boxes (known + unknown pooled — the reference relabels
    then pools, os_coco_evaluation.py:465-573)."""
    from ..parallel import gather_object, num_processes
    from .proposals import evaluate_box_proposals

    entries = []
    for batch, meta in loader:
        out = jax.tree.map(np.asarray, infer(batch.images, batch.image_hw))
        for i, image_id in enumerate(meta.image_ids):
            v = out.valid[i]
            b = out.boxes[i][v]
            s = out.scores[i][v]
            ih, iw = meta.input_hw[i]
            oh, ow = meta.original_hw[i]
            b = b * np.asarray([ow / iw, oh / ih, ow / iw, oh / ih], b.dtype)
            entries.append({"image_id": image_id, "boxes": b, "scores": s})
    if num_processes() > 1:
        merged = []
        for part in gather_object(entries):
            merged.extend(part)
        entries = merged

    gt_map = {
        r["image_id"]: np.asarray(
            [a["bbox"] for a in r.get("annotations", [])], np.float64
        ).reshape(-1, 4)
        for r in records
    }
    res = evaluate_box_proposals(entries, gt_map, limits=limits)
    logger.info("proposal AR: %s", {k: round(v, 4) for k, v in res.items()})
    return res


def inference_on_dataset(
    infer: CompiledInference,
    loader,
    evaluator,
    post_cfg: PostprocessConfig,
) -> Dict[str, float]:
    """One-batch pipelining: batch i+1 is dispatched to the device before
    batch i's results are pulled to the host, overlapping device compute
    with host post-processing (important on the tunneled deployment where
    every sync costs a ~25 ms round trip)."""
    from .postprocess import finalize_serve_image

    fused = infer.post_cfg is not None
    evaluator.reset()
    n_images = 0
    n_overflow_images = 0
    max_overflow = 0
    t0 = time.perf_counter()

    def consume(out, meta):
        nonlocal n_images, n_overflow_images, max_overflow
        out_np = jax.tree.map(np.asarray, out)
        if fused and getattr(out_np, "known_overflow", None) is not None:
            # the loader pads the final partial batch by repeating its last
            # example and truncates meta.image_ids to the real count — only
            # count overflow on slots that are actually evaluated
            ov = np.asarray(out_np.known_overflow)[: len(meta.image_ids)]
            if (ov > 0).any():
                n_overflow_images += int((ov > 0).sum())
                max_overflow = max(max_overflow, int(ov.max()))
        for i, image_id in enumerate(meta.image_ids):
            if fused:
                dets = finalize_serve_image(
                    out_np.boxes[i],
                    out_np.scores[i],
                    out_np.classes[i],
                    out_np.valid[i],
                    meta.input_hw[i],
                    meta.original_hw[i],
                    post_cfg,
                )
            else:
                dets = postprocess_image(
                    out_np.boxes[i],
                    out_np.objectness[i],
                    out_np.min_dist[i],
                    out_np.pln_class[i],
                    out_np.known_probs[i],
                    out_np.valid[i],
                    meta.input_hw[i],
                    meta.original_hw[i],
                    post_cfg,
                )
            evaluator.process(image_id, dets.boxes, dets.scores, dets.classes)
            n_images += 1

    pending = None
    for batch, meta in loader:
        out = infer(batch.images, batch.image_hw)  # async dispatch
        if pending is not None:
            consume(*pending)
        pending = (out, meta)
    if pending is not None:
        consume(*pending)
    dt = time.perf_counter() - t0
    if n_images:
        logger.info("inference done: %d images in %.1fs (%.2f img/s)", n_images, dt, n_images / dt)
    if n_overflow_images:
        # the fused cascade's static candidate slot truncated (box, class)
        # pairs the reference would have kept (softmax_classifier.py:47-104)
        # -> metrics may diverge from the host cascade on these images
        logger.warning(
            "fused cascade known-candidate overflow on %d/%d images "
            "(max %d pairs dropped before known NMS); re-run with "
            "TPU.EVAL_FUSED=False or raise TEST.DETECTIONS_PER_IMAGE "
            "for exact parity",
            n_overflow_images, n_images, max_overflow,
        )
    return evaluator.evaluate()
