"""Box parameterizations.

TPU-native equivalents of detectron2's ``Box2BoxTransform`` (xywh deltas,
weights (10,10,5,5); used by the ROI box predictor, osrcnn_fast_rcnn.py:231)
and ``Box2BoxTransformLinear`` with ``normalize_by_size=True`` (FCOS-style
ltrb distances; used by CF-RPN, classification_free_rpn.py:278).

All functions are shape-polymorphic over leading dims and operate on xyxy
boxes.
"""
from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp

# Maximum log-space delta (d2 _DEFAULT_SCALE_CLAMP = log(1000/16)).
SCALE_CLAMP = math.log(1000.0 / 16.0)


def _ctr_wh(boxes: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    return cx, cy, w, h


class Box2BoxTransform:
    """Scale-invariant (dx, dy, dw, dh) deltas between source and target boxes."""

    def __init__(self, weights: Sequence[float] = (10.0, 10.0, 5.0, 5.0)):
        self.weights = tuple(float(w) for w in weights)

    def get_deltas(self, src: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        scx, scy, sw, sh = _ctr_wh(src)
        tcx, tcy, tw, th = _ctr_wh(target)
        wx, wy, ww, wh = self.weights
        dx = wx * (tcx - scx) / sw
        dy = wy * (tcy - scy) / sh
        dw = ww * jnp.log(tw / sw)
        dh = wh * jnp.log(th / sh)
        return jnp.stack([dx, dy, dw, dh], axis=-1)

    def apply_deltas(self, deltas: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
        scx, scy, sw, sh = _ctr_wh(boxes)
        wx, wy, ww, wh = self.weights
        dx = deltas[..., 0] / wx
        dy = deltas[..., 1] / wy
        dw = jnp.minimum(deltas[..., 2] / ww, SCALE_CLAMP)
        dh = jnp.minimum(deltas[..., 3] / wh, SCALE_CLAMP)
        pcx = dx * sw + scx
        pcy = dy * sh + scy
        pw = jnp.exp(dw) * sw
        ph = jnp.exp(dh) * sh
        return jnp.stack(
            [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph],
            axis=-1,
        )


class Box2BoxTransformLinear:
    """(l, t, r, b) distances from source-box center to target-box sides.

    With ``normalize_by_size`` the distances are divided by the source box's
    width/height — the parameterization CF-RPN regresses
    (classification_free_rpn.py:278, SURVEY.md §2.1).
    """

    def __init__(self, normalize_by_size: bool = True):
        self.normalize_by_size = normalize_by_size

    def get_deltas(self, src: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        scx, scy, sw, sh = _ctr_wh(src)
        l = scx - target[..., 0]
        t = scy - target[..., 1]
        r = target[..., 2] - scx
        b = target[..., 3] - scy
        deltas = jnp.stack([l, t, r, b], axis=-1)
        if self.normalize_by_size:
            deltas = deltas / jnp.stack([sw, sh, sw, sh], axis=-1)
        return deltas

    def apply_deltas(self, deltas: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
        # d2 clamps predicted distances at >= 0 (boxes cannot invert).
        deltas = jnp.maximum(deltas, 0.0)
        scx, scy, sw, sh = _ctr_wh(boxes)
        if self.normalize_by_size:
            scale = jnp.stack([sw, sh, sw, sh], axis=-1)
            deltas = deltas * scale
        x1 = scx - deltas[..., 0]
        y1 = scy - deltas[..., 1]
        x2 = scx + deltas[..., 2]
        y2 = scy + deltas[..., 3]
        return jnp.stack([x1, y1, x2, y2], axis=-1)
