"""IoU-threshold matcher (vectorized, fixed-shape).

TPU-native equivalent of detectron2's ``Matcher`` as instantiated by the
reference: dual matchers over a single IoU matrix (box-regression matcher at
[0.3, 0.7] and objectness matcher at [0.1, 0.3], both with low-quality-match
rescue; classification_free_rpn.py:290-295), and the ROI matcher at [0.5]
without rescue (d2 ROIHeads defaults, osrcnn_roi_heads.py:190).

Instead of per-image Python loops over dynamic GT lists, GT is padded to a
fixed ``G`` with a validity mask; invalid rows can never win a match.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax.numpy as jnp


class MatchResult(NamedTuple):
    matched_idx: jnp.ndarray   # (N,) int32 index into GT rows (0 if no GT)
    labels: jnp.ndarray        # (N,) int32 in {-1, 0, 1}


def match(
    iou: jnp.ndarray,
    gt_valid: jnp.ndarray,
    thresholds: Sequence[float],
    labels: Sequence[int],
    allow_low_quality_matches: bool,
) -> MatchResult:
    """Assign each of N candidates to one of G (padded) GT boxes.

    Args:
        iou: (G, N) match-quality matrix.
        gt_valid: (G,) bool mask of real GT rows.
        thresholds: ascending IoU thresholds, e.g. [0.3, 0.7].
        labels: len(thresholds)+1 labels from lowest to highest bin,
            e.g. [0, -1, 1].
    Returns:
        matched_idx (N,), labels (N,) in {-1, 0, 1}. With zero valid GT all
        labels are the lowest bin's label (background), matching d2's
        empty-GT path.
    """
    neg_inf = jnp.asarray(-1.0, iou.dtype)
    masked = jnp.where(gt_valid[:, None], iou, neg_inf)
    matched_idx = jnp.argmax(masked, axis=0).astype(jnp.int32)
    matched_vals = jnp.max(masked, axis=0)

    out = jnp.full(matched_vals.shape, labels[0], dtype=jnp.int32)
    for lo, lab in zip(thresholds, labels[1:]):
        out = jnp.where(matched_vals >= lo, jnp.int32(lab), out)

    if allow_low_quality_matches:
        # For each GT, candidates tying its best IoU are rescued to positive.
        # d2 Matcher.set_low_quality_matches_ does not update matched_idx.
        # Deviation: we additionally require the best IoU > 0 so a degenerate
        # GT box (zero overlap with every anchor) cannot mark ALL anchors
        # positive. Unreachable on real data: the A=1 stride-4 32px anchor
        # grid covers every image pixel, so any GT with positive area inside
        # the image overlaps some anchor (IoU > 0), and the loader drops
        # degenerate boxes (transforms.py) — the guard only changes behavior
        # for inputs the reference could never see.
        best_per_gt = jnp.max(masked, axis=1, keepdims=True)  # (G, 1)
        tie = (masked == best_per_gt) & (best_per_gt > 0) & gt_valid[:, None]
        rescued = jnp.any(tie, axis=0)
        out = jnp.where(rescued, jnp.int32(1), out)

    any_gt = jnp.any(gt_valid)
    out = jnp.where(any_gt, out, jnp.int32(labels[0]))
    return MatchResult(matched_idx=matched_idx, labels=out)
