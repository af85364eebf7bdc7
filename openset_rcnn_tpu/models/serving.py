"""Fully-fused on-device inference ("serving" path).

The evaluation harness runs the reference's exact 3-stage cascade on the
host (evaluation/postprocess.py) for metric parity. For production serving,
this module runs the SAME cascade entirely on-device with fixed shapes —
masked top-k + masked NMS (ops/nms.py) — so a single jitted call maps an
image batch to padded final detections with no host round trips.

Stages mirror SURVEY.md §3.2:
  1. objectness = sqrt(iou x centerness) > thresh, top-K1 (NMS@1.0 no-op);
  2. unknown split: min prototype distance > UNK_THR;
  3a. known: per-class scores > thresh, class-wise NMS, top-K;
  3b. unknown: objectness score, class-agnostic NMS, top-K, fixed id.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops import batched_nms_mask, nms_mask
from ..structures import RawDetections


class ServeDetections(NamedTuple):
    boxes: jnp.ndarray    # (B, D, 4) in network-input coordinates
    scores: jnp.ndarray   # (B, D)
    classes: jnp.ndarray  # (B, D) int32 (known index or unknown id)
    valid: jnp.ndarray    # (B, D) bool
    # (B,) int32: known-branch (box, class) candidates above the score
    # threshold that did NOT fit in the static max_known_candidates slot and
    # were silently dropped before NMS. The reference keeps ALL pairs above
    # 0.05 (softmax_classifier.py:47-104), so any nonzero value here is a
    # potential parity divergence from the host cascade — callers must
    # surface it (evaluation/testing.py warns; tests assert visibility).
    known_overflow: jnp.ndarray


def _topk_select(values, mask, k):
    """Top-k by value among mask; returns (values, indices, valid)."""
    neg = jnp.where(mask, values, -jnp.inf)
    v, i = jax.lax.top_k(neg, k)
    return v, i, jnp.isfinite(v)


def fused_cascade_single(
    raw_boxes,      # (P, 4)
    objectness,     # (P,)
    min_dist,       # (P,)
    known_probs,    # (P, K+1)
    valid,          # (P,)
    *,
    obj_thresh: float,
    unk_thr: float,
    known_score_thresh: float,
    known_nms_thresh: float,
    known_topk: int,
    unknown_score_thresh: float,
    unknown_nms_thresh: float,
    unknown_topk: int,
    unknown_id: int,
    stage1_topk: int,
    max_known_candidates: int,
) -> ServeDetections:
    K = known_probs.shape[-1] - 1
    # cap the static selection sizes by what actually exists
    stage1_topk = min(stage1_topk, raw_boxes.shape[0])
    max_known_candidates = min(max_known_candidates, stage1_topk * K)

    # ---- stage 1: objectness filter + top-K1 ----
    keep1 = valid & (objectness > obj_thresh)
    s1, i1, v1 = _topk_select(objectness, keep1, stage1_topk)
    boxes1 = raw_boxes[i1]
    md1 = min_dist[i1]
    probs1 = known_probs[i1][:, :K]  # drop background column
    obj1 = jnp.where(v1, objectness[i1], 0.0)

    is_unknown = md1 > unk_thr

    # ---- stage 3a: known, class-wise ----
    # candidate (box, class) pairs: flatten (K1, K) scores, take top-C
    cand_mask = (~is_unknown[:, None]) & v1[:, None] & (probs1 > known_score_thresh)
    n_cand = jnp.sum(cand_mask, dtype=jnp.int32)
    known_overflow = jnp.maximum(n_cand - max_known_candidates, 0)
    known_scores = jnp.where(cand_mask, probs1, -jnp.inf).reshape(-1)
    cs, ci, cv = _topk_select(known_scores, jnp.isfinite(known_scores), max_known_candidates)
    cand_box = boxes1[ci // K]
    cand_cls = (ci % K).astype(jnp.int32)
    cand_score = jnp.where(cv, cs, 0.0)
    res = batched_nms_mask(cand_box, cand_score, cand_cls, cv, known_nms_thresh)
    kept_rank = jnp.cumsum(res.keep) - 1
    sel = res.keep & (kept_rank < known_topk)
    order = res.order
    # compact: sort selected first, preserving score order
    comp = jnp.where(sel, kept_rank, cand_box.shape[0] + jnp.arange(cand_box.shape[0]))
    perm = jnp.argsort(comp)
    take = order[perm][:known_topk]
    kvalid = sel[perm][:known_topk]
    kboxes = cand_box[take]
    kscores = jnp.where(kvalid, cand_score[take], 0.0)
    kclasses = cand_cls[take]

    # ---- stage 3b: unknown, class-agnostic ----
    umask = is_unknown & v1 & (obj1 > unknown_score_thresh)
    ures = nms_mask(boxes1, jnp.where(umask, obj1, 0.0), umask, unknown_nms_thresh)
    ukept = jnp.cumsum(ures.keep) - 1
    usel = ures.keep & (ukept < unknown_topk)
    ucomp = jnp.where(usel, ukept, boxes1.shape[0] + jnp.arange(boxes1.shape[0]))
    uperm = jnp.argsort(ucomp)
    utake = ures.order[uperm][:unknown_topk]
    uvalid = usel[uperm][:unknown_topk]
    uboxes = boxes1[utake]
    uscores = jnp.where(uvalid, obj1[utake], 0.0)
    uclasses = jnp.full(uboxes.shape[:1], unknown_id, jnp.int32)  # matches utake, which may be < unknown_topk when P is small

    return ServeDetections(
        boxes=jnp.concatenate([uboxes, kboxes], 0),
        scores=jnp.concatenate([uscores, kscores], 0),
        classes=jnp.concatenate([uclasses, kclasses], 0),
        valid=jnp.concatenate([uvalid, kvalid], 0),
        known_overflow=known_overflow,
    )


def fused_cascade(
    raw: RawDetections,
    *,
    obj_thresh: float = 0.05,
    unk_thr: float = 0.23,
    known_score_thresh: float = 0.05,
    known_nms_thresh: float = 0.5,
    known_topk: int = 50,
    unknown_score_thresh: float = 0.0,
    unknown_nms_thresh: float = 0.5,
    unknown_topk: int = 50,
    unknown_id: int = 80,
    stage1_topk: int = 1000,
    max_known_candidates: int = 2000,
) -> ServeDetections:
    fn = jax.vmap(
        lambda b, o, m, p, v: fused_cascade_single(
            b, o, m, p, v,
            obj_thresh=obj_thresh,
            unk_thr=unk_thr,
            known_score_thresh=known_score_thresh,
            known_nms_thresh=known_nms_thresh,
            known_topk=known_topk,
            unknown_score_thresh=unknown_score_thresh,
            unknown_nms_thresh=unknown_nms_thresh,
            unknown_topk=unknown_topk,
            unknown_id=unknown_id,
            stage1_topk=stage1_topk,
            max_known_candidates=max_known_candidates,
        )
    )
    # under an engine mesh, run per-device on the batch shard (keeps the
    # Pallas NMS kernel alive in sharded eval; identity when unsharded)
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import data_shard_map

    fn = data_shard_map(fn, in_specs=(P("data"),) * 5, out_specs=P("data"))
    return fn(raw.boxes, raw.objectness, raw.min_dist, raw.known_probs, raw.valid)
