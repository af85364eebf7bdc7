"""Training-target computation for CF-RPN (centerness) — pure JAX.

Re-derives the centerness target of the reference
(classification_free_rpn.py:393-402): for each anchor, take the (l, r, t, b)
distances from the anchor center to the sides of its objectness-matched GT
box; centerness = sqrt((min(l,r)/max(l,r)) * (min(t,b)/max(t,b))), zeroed when
the anchor center lies outside the box or the anchor is a sampled negative.
The size-normalization of the linear transform cancels in the ratios.
"""
from __future__ import annotations

import jax.numpy as jnp


def centerness_targets(
    anchors: jnp.ndarray,
    matched_gt: jnp.ndarray,
    objectness_labels: jnp.ndarray,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """Args:
        anchors: (N, 4) xyxy.
        matched_gt: (N, 4) xyxy GT box matched by the objectness matcher.
        objectness_labels: (N,) in {-1, 0, 1}; label 0 forces target 0.
    Returns:
        (N,) centerness in [0, 1].
    """
    cx = 0.5 * (anchors[..., 0] + anchors[..., 2])
    cy = 0.5 * (anchors[..., 1] + anchors[..., 3])
    l = cx - matched_gt[..., 0]
    r = matched_gt[..., 2] - cx
    t = cy - matched_gt[..., 1]
    b = matched_gt[..., 3] - cy

    inside = (l >= 0) & (r >= 0) & (t >= 0) & (b >= 0)
    l, r, t, b = (jnp.where(inside, v, 0.0) for v in (l, r, t, b))

    lr_ratio = jnp.minimum(l, r) / (jnp.maximum(l, r) + eps)
    tb_ratio = jnp.minimum(t, b) / (jnp.maximum(t, b) + eps)
    ctr = jnp.sqrt(jnp.clip(lr_ratio * tb_ratio, 0.0))
    return jnp.where(objectness_labels == 0, 0.0, ctr)
