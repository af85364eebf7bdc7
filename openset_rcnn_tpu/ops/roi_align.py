"""Multilevel RoIAlign (V2 / aligned=True) in pure JAX.

TPU-native replacement for detectron2's C++/CUDA ``ROIAlignV2`` +
``ROIPooler`` pair (built at osrcnn_roi_heads.py:108-113; SURVEY.md §2.3).

Design (TPU-first, not a kernel translation):
  * All FPN levels are flattened into ONE (sum_l H_l*W_l, C) buffer so every
    RoI — regardless of its assigned level — is served by a single fused
    gather. No per-level dynamic partitioning, no host round trips.
  * FPN level assignment follows the FPN paper / d2 ``assign_boxes_to_levels``:
    level = floor(4 + log2(sqrt(area)/224)), clamped to [2, 5].
  * Sampling ratio is static (default 2 -> 2x2 samples/bin). The reference
    inherits d2's adaptive ratio (ceil(roi/7)); a data-dependent grid is
    hostile to XLA, and a fixed 2x2 grid is the standard accuracy-neutral
    choice (documented deviation, SURVEY.md §7.3 item 2).
  * Differentiable by construction: the backward pass is XLA's scatter-add
    of the same gather, so no custom VJP is needed for correctness.

Shapes: feats are NHWC per level; boxes are (R, 4) xyxy in image coordinates.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def assign_levels(
    boxes: jnp.ndarray,
    min_level: int = 2,
    max_level: int = 5,
    canonical_size: float = 224.0,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """(R,) int32 FPN level index (0-based: level - min_level)."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    size = jnp.sqrt(jnp.clip(w * h, 0.0))
    lvl = jnp.floor(canonical_level + jnp.log2(size / canonical_size + 1e-8))
    lvl = jnp.clip(lvl, min_level, max_level)
    return (lvl - min_level).astype(jnp.int32)


def multilevel_roi_align(
    feats: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    strides: Sequence[int],
    out_size: int = 7,
    sampling_ratio: int = 2,
    min_level: int = 2,
) -> jnp.ndarray:
    """Pool (R, out_size, out_size, C) features for R boxes from an FPN.

    Args:
        feats: per-level (H_l, W_l, C) features for ONE image (vmap for batch).
        boxes: (R, 4) xyxy.
        strides: per-level integer strides (e.g. [4, 8, 16, 32]).
    """
    assert len(feats) == len(strides)
    C = feats[0].shape[-1]
    R = boxes.shape[0]
    S = sampling_ratio
    P = out_size

    hs = jnp.asarray([f.shape[0] for f in feats], jnp.int32)
    ws = jnp.asarray([f.shape[1] for f in feats], jnp.int32)
    sizes = [f.shape[0] * f.shape[1] for f in feats]
    offsets = jnp.asarray([0] + list(jnp.cumsum(jnp.asarray(sizes))[:-1]), jnp.int32)
    inv_strides = jnp.asarray([1.0 / s for s in strides], jnp.float32)
    flat = jnp.concatenate([f.reshape(-1, C) for f in feats], axis=0)

    lvl = assign_levels(boxes, min_level=min_level, max_level=min_level + len(feats) - 1)
    scale = inv_strides[lvl]                       # (R,)
    H = hs[lvl]
    W = ws[lvl]
    off = offsets[lvl]

    # ROIAlignV2 "aligned" semantics: half-pixel shift after scaling.
    x1 = boxes[:, 0] * scale - 0.5
    y1 = boxes[:, 1] * scale - 0.5
    x2 = boxes[:, 2] * scale - 0.5
    y2 = boxes[:, 3] * scale - 0.5
    roi_w = x2 - x1
    roi_h = y2 - y1
    bin_w = roi_w / P
    bin_h = roi_h / P

    # Sample-point grid: (P*S,) fractional positions along each axis.
    grid = (jnp.arange(P * S, dtype=jnp.float32) + 0.5) / S  # in bin units
    ys = y1[:, None] + grid[None, :] * bin_h[:, None]        # (R, P*S)
    xs = x1[:, None] + grid[None, :] * bin_w[:, None]        # (R, P*S)

    Hf = H.astype(jnp.float32)[:, None]
    Wf = W.astype(jnp.float32)[:, None]
    y_ok = (ys > -1.0) & (ys < Hf)
    x_ok = (xs > -1.0) & (xs < Wf)
    ys = jnp.clip(ys, 0.0, Hf - 1.0)
    xs = jnp.clip(xs, 0.0, Wf - 1.0)

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    y1i = jnp.minimum(y0 + 1, Hf - 1.0)
    x1i = jnp.minimum(x0 + 1, Wf - 1.0)
    ly = ys - y0
    lx = xs - x0

    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1i = y1i.astype(jnp.int32)
    x1i = x1i.astype(jnp.int32)

    # Flat indices for the 4 bilinear neighbors of every (y, x) pair:
    # combine (R, PS) y rows with (R, PS) x cols -> (R, PS, PS).
    Wl = W[:, None, None]
    base = off[:, None, None]

    def flat_idx(yy, xx):
        return base + yy[:, :, None] * Wl + xx[:, None, :]

    i00 = flat_idx(y0, x0)
    i01 = flat_idx(y0, x1i)
    i10 = flat_idx(y1i, x0)
    i11 = flat_idx(y1i, x1i)

    w00 = ((1 - ly)[:, :, None] * (1 - lx)[:, None, :])
    w01 = ((1 - ly)[:, :, None] * lx[:, None, :])
    w10 = (ly[:, :, None] * (1 - lx)[:, None, :])
    w11 = (ly[:, :, None] * lx[:, None, :])
    pt_ok = (y_ok[:, :, None] & x_ok[:, None, :]).astype(flat.dtype)

    def g(idx):
        return flat[idx.reshape(-1)].reshape(R, P * S, P * S, C)

    val = (
        g(i00) * w00[..., None]
        + g(i01) * w01[..., None]
        + g(i10) * w10[..., None]
        + g(i11) * w11[..., None]
    ) * pt_ok[..., None]

    # Average S x S sample points per bin.
    val = val.reshape(R, P, S, P, S, C)
    return val.mean(axis=(2, 4))
