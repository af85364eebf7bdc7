"""Loss primitives — masked, fixed-shape.

Rebuilds fvcore's ``smooth_l1_loss``/``giou_loss`` and the reference's
IoU-family dense box-regression loss (box_regression_w_iou.py:14-86) as
masked reductions: padded rows contribute exactly zero, so the padded batch
is provably equivalent to the reference's dynamically-filtered tensors
(SURVEY.md §7.1, §7.3 item 3).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import elementwise_iou


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float) -> jnp.ndarray:
    """Elementwise smooth-L1; beta=0 reduces to pure L1 (fvcore semantics)."""
    diff = jnp.abs(pred - target)
    if beta <= 0.0:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def masked_sum(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Sum of values where mask (broadcast over trailing dims of values)."""
    if values.ndim > mask.ndim:
        mask = mask[..., None]
    return jnp.sum(jnp.where(mask, values, 0.0))


def iou_box_loss(
    pred_boxes: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    fg_mask: jnp.ndarray,
) -> jnp.ndarray:
    """sum over fg of (1 - IoU(pred, gt)), IoU clamped >= 1e-6.

    The "iou" branch of the reference's dense box-regression loss
    (box_regression_w_iou.py:50-62) used by both RPN loc loss and the ROI
    box head under BBOX_REG_LOSS_TYPE="iou".
    """
    ious = jnp.clip(elementwise_iou(pred_boxes, gt_boxes), 1e-6)
    return masked_sum(1.0 - ious, fg_mask)


def giou_box_loss(pred_boxes, gt_boxes, fg_mask) -> jnp.ndarray:
    """Masked sum GIoU loss (reference giou branch, box_regression_w_iou.py:63)."""
    iou = elementwise_iou(pred_boxes, gt_boxes)
    # smallest enclosing box
    lt = jnp.minimum(pred_boxes[..., :2], gt_boxes[..., :2])
    rb = jnp.maximum(pred_boxes[..., 2:], gt_boxes[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    enclose = wh[..., 0] * wh[..., 1]
    # union recomputed from areas
    area_p = (pred_boxes[..., 2] - pred_boxes[..., 0]) * (pred_boxes[..., 3] - pred_boxes[..., 1])
    area_g = (gt_boxes[..., 2] - gt_boxes[..., 0]) * (gt_boxes[..., 3] - gt_boxes[..., 1])
    inter = iou * jnp.where(area_p + area_g > 0, area_p + area_g, 1.0) / jnp.where(1 + iou > 0, 1 + iou, 1.0)
    union = area_p + area_g - inter
    giou = iou - (enclose - union) / jnp.where(enclose > 0, enclose, 1.0)
    return masked_sum(1.0 - giou, fg_mask)


def _center_dist2_and_diag2(pred_boxes, gt_boxes):
    px = 0.5 * (pred_boxes[..., 0] + pred_boxes[..., 2])
    py = 0.5 * (pred_boxes[..., 1] + pred_boxes[..., 3])
    gx = 0.5 * (gt_boxes[..., 0] + gt_boxes[..., 2])
    gy = 0.5 * (gt_boxes[..., 1] + gt_boxes[..., 3])
    d2 = (px - gx) ** 2 + (py - gy) ** 2
    lt = jnp.minimum(pred_boxes[..., :2], gt_boxes[..., :2])
    rb = jnp.maximum(pred_boxes[..., 2:], gt_boxes[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    c2 = wh[..., 0] ** 2 + wh[..., 1] ** 2
    return d2, c2


def diou_box_loss(pred_boxes, gt_boxes, fg_mask) -> jnp.ndarray:
    """Masked sum Distance-IoU loss (reference diou branch,
    box_regression_w_iou.py:70)."""
    iou = elementwise_iou(pred_boxes, gt_boxes)
    d2, c2 = _center_dist2_and_diag2(pred_boxes, gt_boxes)
    diou = iou - d2 / jnp.where(c2 > 0, c2, 1.0)
    return masked_sum(1.0 - diou, fg_mask)


def ciou_box_loss(pred_boxes, gt_boxes, fg_mask) -> jnp.ndarray:
    """Masked sum Complete-IoU loss (reference ciou branch,
    box_regression_w_iou.py:77): DIoU + aspect-ratio consistency term."""
    iou = elementwise_iou(pred_boxes, gt_boxes)
    d2, c2 = _center_dist2_and_diag2(pred_boxes, gt_boxes)
    pw = jnp.clip(pred_boxes[..., 2] - pred_boxes[..., 0], 1e-9)
    ph = jnp.clip(pred_boxes[..., 3] - pred_boxes[..., 1], 1e-9)
    gw = jnp.clip(gt_boxes[..., 2] - gt_boxes[..., 0], 1e-9)
    gh = jnp.clip(gt_boxes[..., 3] - gt_boxes[..., 1], 1e-9)
    v = (4.0 / (jnp.pi ** 2)) * (jnp.arctan(gw / gh) - jnp.arctan(pw / ph)) ** 2
    alpha = jax.lax.stop_gradient(v / jnp.where(1.0 - iou + v > 0, 1.0 - iou + v, 1.0))
    ciou = iou - d2 / jnp.where(c2 > 0, c2, 1.0) - alpha * v
    return masked_sum(1.0 - ciou, fg_mask)


def dense_box_regression_loss(
    pred_boxes,
    gt_boxes,
    fg_mask,
    loss_type: str = "iou",
):
    """Dispatch over the reference's IoU-family loss types
    (box_regression_w_iou.py:41-85; smooth_l1 is handled by callers that
    work in delta space)."""
    if loss_type == "iou":
        return iou_box_loss(pred_boxes, gt_boxes, fg_mask)
    if loss_type == "giou":
        return giou_box_loss(pred_boxes, gt_boxes, fg_mask)
    if loss_type == "diou":
        return diou_box_loss(pred_boxes, gt_boxes, fg_mask)
    if loss_type == "ciou":
        return ciou_box_loss(pred_boxes, gt_boxes, fg_mask)
    raise ValueError(f"Invalid dense box regression loss type '{loss_type}'")


def softmax_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Mean CE over valid rows (torch cross_entropy(reduction='mean'))."""
    zmax = jnp.max(logits, -1)
    lse = jnp.log(jnp.sum(jnp.exp(logits - zmax[..., None]), -1)) + zmax
    nll = lse - jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(valid.sum(), 1)
    return jnp.sum(jnp.where(valid, nll, 0.0)) / denom
