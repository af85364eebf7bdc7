"""Box utilities in pure JAX (XYXY absolute coordinates throughout).

TPU-native equivalents of detectron2's ``Boxes`` helpers and ``pairwise_iou``
(consumed by the reference at classification_free_rpn.py:365,
osrcnn_roi_heads.py:187, box_regression_w_iou.py:57). Everything is
fixed-shape and batched; "removing" a box is expressed by a validity mask,
never by dynamic filtering (SURVEY.md §7.1).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of (..., 4) xyxy boxes."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return w * h


def clip_boxes(boxes: jnp.ndarray, image_hw) -> jnp.ndarray:
    """Clip (..., 4) boxes to [0, W] x [0, H]. image_hw: (h, w) scalars/arrays."""
    h, w = image_hw[0], image_hw[1]
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def nonempty(boxes: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    """Mask of boxes with both sides > threshold (d2 Boxes.nonempty)."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return (w > threshold) & (h > threshold)


def pairwise_intersection(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Intersection areas, shapes (M, 4) x (N, 4) -> (M, N)."""
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix (M, N). Zero where union is zero (matches d2 semantics)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    inter = pairwise_intersection(boxes1, boxes2)
    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(inter > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def elementwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """IoU of aligned box pairs, shapes (..., 4) x (..., 4) -> (...)."""
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(boxes1) + box_area(boxes2) - inter
    return jnp.where(inter > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)
