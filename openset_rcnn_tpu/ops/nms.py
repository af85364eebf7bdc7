"""Masked fixed-shape NMS for TPU.

TPU-native equivalent of torchvision's ``nms`` / detectron2's ``batched_nms``
(consumed by the reference at osrcnn_fast_rcnn.py:135 — thresh 1.0, a no-op —
and softmax_classifier.py:93,154 — the real class-wise NMS at 0.5;
SURVEY.md §2.3). Instead of returning a dynamic keep-index list, we sort by
score, build the pairwise IoU matrix once, and run a fixed-iteration greedy
suppression scan; the result is a keep mask over the sorted order plus the
sort permutation. Everything is static-shaped and jit-friendly.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .boxes import pairwise_iou


class NMSResult(NamedTuple):
    order: jnp.ndarray  # (N,) indices sorting inputs by descending score
    keep: jnp.ndarray   # (N,) bool keep mask *in sorted order*


def nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    use_pallas: bool | None = None,
) -> NMSResult:
    """Greedy NMS over up to N boxes.

    Args:
        boxes: (N, 4) xyxy. scores: (N,). valid: (N,) bool — invalid boxes are
            never kept and never suppress others.
        use_pallas: route the suppression scan through the Pallas kernel
            (ops/pallas/nms_kernel.py; ~5x faster than the XLA loop at
            N=2048, compiles in <1s). Default: auto — on whenever the
            default backend is TPU.
    Returns:
        order + keep mask in sorted order. ``order[keep]``-style dynamic
        gathers are for the host; on device compose with masked ops.

    Suppression uses strict '>' comparison, matching torchvision: with
    iou_threshold=1.0 NMS is a no-op for non-identical boxes.
    """
    n = boxes.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    s = jnp.where(valid, scores, neg_inf)
    order = jnp.argsort(-s, stable=True).astype(jnp.int32)
    b = boxes[order]
    v = valid[order]

    if use_pallas is None:
        # auto: on TPU when this trace sees one device's data — single chip
        # or inside a shard_map body (the fused eval cascade shard_maps
        # itself over the mesh; see models/serving.py)
        from ..parallel.mesh import pallas_device_local

        use_pallas = jax.default_backend() == "tpu" and pallas_device_local()
    if use_pallas:
        from .pallas.nms_kernel import nms_keep_pallas

        keep = nms_keep_pallas(b, v, iou_threshold)
        return NMSResult(order=order, keep=keep)

    iou = pairwise_iou(b, b)  # (N, N)
    # above[i, j] = True if j ranks before i (higher score).
    col = jnp.arange(n)
    above = col[None, :] < col[:, None]
    suppress_cand = above & (iou > iou_threshold) & v[None, :] & v[:, None]

    def body(i, keep):
        # Box i is kept iff no *kept* higher-ranked box suppresses it.
        sup = jnp.any(suppress_cand[i] & keep)
        return keep.at[i].set(~sup & v[i])

    # derive the init from v so it inherits v's varying-manual-axes type
    # when this runs inside a shard_map body (the sharded eval cascade)
    keep = jax.lax.fori_loop(0, n, body, v & jnp.zeros((n,), bool))
    return NMSResult(order=order, keep=keep)


def batched_nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    class_ids: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
) -> NMSResult:
    """Class-aware NMS via the coordinate-offset trick (d2 batched_nms)."""
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0)) + 1.0
    offsets = class_ids.astype(boxes.dtype)[:, None] * max_coord
    return nms_mask(boxes + offsets, scores, valid, iou_threshold)


def nms_select(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    topk: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NMS then keep top-k survivors; returns fixed-size (boxes, scores, valid)."""
    res = nms_mask(boxes, scores, valid, iou_threshold)
    b = boxes[res.order]
    s = scores[res.order]
    kept_rank = jnp.cumsum(res.keep) - 1
    sel = res.keep & (kept_rank < topk)
    # Compact survivors to the front, preserving score order.
    comp_key = jnp.where(sel, kept_rank, boxes.shape[0] + jnp.arange(boxes.shape[0]))
    perm = jnp.argsort(comp_key)
    out_valid = sel[perm][:topk]
    return b[perm][:topk], jnp.where(out_valid, s[perm][:topk], 0.0), out_valid
