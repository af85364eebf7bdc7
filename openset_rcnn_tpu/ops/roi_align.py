"""Multilevel RoIAlign (V2 / aligned=True) in pure JAX.

TPU-native replacement for detectron2's C++/CUDA ``ROIAlignV2`` +
``ROIPooler`` pair (built at osrcnn_roi_heads.py:108-113; SURVEY.md §2.3).

Design (TPU-first, not a kernel translation):
  * All FPN levels are flattened into ONE (sum_l H_l*W_l, C) buffer so every
    RoI — regardless of its assigned level — is served by a single fused
    gather. No per-level dynamic partitioning, no host round trips.
  * FPN level assignment follows the FPN paper / d2 ``assign_boxes_to_levels``:
    level = floor(4 + log2(sqrt(area)/224)), clamped to [2, 5].
  * Sampling ratio: static by default (2 -> 2x2 samples/bin, the standard
    accuracy-neutral choice). ``sampling_ratio=-1`` reproduces d2's adaptive
    ``ceil(roi_size/out_size)`` grid (ROIAlignV2 with sampling_ratio=0, the
    pooler built at osrcnn_roi_heads.py:108-113) for checkpoint-parity runs:
    the grid stays a STATIC (ADAPTIVE_MAX_RATIO)^2 lattice per bin and
    samples beyond the per-RoI adaptive count are masked out, so shapes
    stay fixed under jit; the per-axis count is capped at
    ADAPTIVE_MAX_RATIO=8 (d2 exceeds 8 only for degenerate aspect>24 boxes).
  * Differentiable by construction: the backward pass is XLA's scatter-add
    of the same gather, so no custom VJP is needed for correctness.

Shapes: feats are NHWC per level; boxes are (R, 4) xyxy in image coordinates.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

# Static lattice size for the adaptive (sampling_ratio=-1) grid; d2's
# ceil(roi/7) exceeds 8 samples/axis only for aspect-ratio>24 boxes.
ADAPTIVE_MAX_RATIO = 8


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
    impl: str = "gather",
) -> jnp.ndarray:
    """Dispatch: 'gather' (default; exact reference semantics for every box
    shape — and, counter-intuitively, the fastest XLA formulation measured
    on v5e: the 'window' variant materializes 4x more HBM traffic because
    XLA cannot fuse through the window gather) or 'window'."""
    if impl == "window":
        return multilevel_roi_align_window(
            feats, boxes, strides, out_size, sampling_ratio, min_level
        )
    return _multilevel_roi_align_gather(
        feats, boxes, strides, out_size, sampling_ratio, min_level
    )


def _multilevel_roi_align_gather(
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
    adaptive = sampling_ratio == -1
    S = ADAPTIVE_MAX_RATIO if adaptive else sampling_ratio
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

    # Sample-point grid along each axis: bin index p, sample index j within
    # the bin -> position p + (j+0.5)/n in bin units ((idx+0.5)/S when n==S).
    idx_grid = jnp.arange(P * S)
    p_idx = (idx_grid // S).astype(jnp.float32)
    j_idx = (idx_grid % S).astype(jnp.float32)
    if adaptive:
        # d2 ROIAlignV2 adaptive count: ceil(roi_extent / out_size) samples
        # per bin axis, evaluated on a masked static S-lattice.
        n_y = jnp.clip(jnp.ceil(roi_h / P), 1.0, S)  # (R,)
        n_x = jnp.clip(jnp.ceil(roi_w / P), 1.0, S)
    else:
        n_y = n_x = jnp.full((R,), float(S), jnp.float32)
    ys = y1[:, None] + (p_idx + (j_idx + 0.5) / n_y[:, None]) * bin_h[:, None]  # (R, P*S)
    xs = x1[:, None] + (p_idx + (j_idx + 0.5) / n_x[:, None]) * bin_w[:, None]
    act_y = j_idx[None, :] < n_y[:, None]  # (R, P*S) sample active on y-axis
    act_x = j_idx[None, :] < n_x[:, None]

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
    pt_ok = (
        (y_ok & act_y)[:, :, None] & (x_ok & act_x)[:, None, :]
    ).astype(flat.dtype)

    def g(idx):
        return flat[idx.reshape(-1)].reshape(R, P * S, P * S, C)

    val = (
        g(i00) * w00[..., None]
        + g(i01) * w01[..., None]
        + g(i10) * w10[..., None]
        + g(i11) * w11[..., None]
    ) * pt_ok[..., None]

    # Average the active sample points per bin (n_y*n_x of the S*S lattice;
    # boundary-clipped points contribute 0 to the sum but stay in the count,
    # matching d2's `output_val /= count`).
    val = val.reshape(R, P, S, P, S, C)
    if adaptive:
        return val.sum(axis=(2, 4)) / (n_y * n_x)[:, None, None, None]
    return val.mean(axis=(2, 4))


# ---------------------------------------------------------------------------
# Fast TPU path: windowed RoIAlign
# ---------------------------------------------------------------------------
#
# XLA's per-row gather reaches only a few % of HBM bandwidth on TPU for the
# (R * samples * 4-neighbor) x (1, C) access pattern of classic RoIAlign.
# This path instead
#   1. reads ONE contiguous (WINDOW, WINDOW-row) block per RoI from a
#      flattened FPN buffer (gathers of (WINDOW, C) chunks -> long
#      sequential DMA bursts), and
#   2. evaluates bilinear sampling as TWO small interpolation matmuls per
#      RoI (MXU work), Wy @ window @ Wx^T, followed by the 2x2 bin average.
#
# A RoI whose feature-space extent exceeds the static window is assigned a
# coarser FPN level until it fits ("level bump"). With WINDOW=56 this only
# affects boxes with aspect ratio > ~3.6 near a level boundary; the sampled
# values remain exactly bilinear, just from one level coarser (documented
# deviation from d2's ROIPooler; the 'gather' impl keeps exact semantics).

WINDOW = 56
_MAX_EXTENT = WINDOW - 3.0


def multilevel_roi_align_window(
    feats: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    strides: Sequence[int],
    out_size: int = 7,
    sampling_ratio: int = 2,
    min_level: int = 2,
) -> jnp.ndarray:
    C = feats[0].shape[-1]
    R = boxes.shape[0]
    S = sampling_ratio
    P = out_size
    PS = P * S
    n_levels = len(feats)

    hs = jnp.asarray([f.shape[0] for f in feats], jnp.int32)
    ws = jnp.asarray([f.shape[1] for f in feats], jnp.int32)
    sizes = [f.shape[0] * f.shape[1] for f in feats]
    offsets = jnp.asarray([0] + list(jnp.cumsum(jnp.asarray(sizes))[:-1]), jnp.int32)
    inv_strides = jnp.asarray([1.0 / s for s in strides], jnp.float32)
    flat = jnp.concatenate(
        [f.reshape(-1, C) for f in feats]
        + [jnp.zeros((WINDOW, C), feats[0].dtype)],  # overrun pad
        axis=0,
    )

    # --- level assignment with bump-to-fit ---
    lvl = assign_levels(boxes, min_level=min_level, max_level=min_level + n_levels - 1)
    bw = boxes[:, 2] - boxes[:, 0]
    bh = boxes[:, 3] - boxes[:, 1]
    max_side = jnp.maximum(jnp.maximum(bw, bh), 1e-6)
    # smallest level index i with max_side / (strides[0] * 2^i) <= MAX_EXTENT
    need = jnp.ceil(jnp.log2(max_side / (strides[0] * _MAX_EXTENT)))
    lvl = jnp.clip(jnp.maximum(lvl, need.astype(jnp.int32)), 0, n_levels - 1)

    scale = inv_strides[lvl]
    H = hs[lvl]
    W = ws[lvl]
    off = offsets[lvl]
    Hf = H.astype(jnp.float32)
    Wf = W.astype(jnp.float32)

    x1 = boxes[:, 0] * scale - 0.5
    y1 = boxes[:, 1] * scale - 0.5
    x2 = boxes[:, 2] * scale - 0.5
    y2 = boxes[:, 3] * scale - 0.5
    bin_w = (x2 - x1) / P
    bin_h = (y2 - y1) / P

    grid = (jnp.arange(PS, dtype=jnp.float32) + 0.5) / S
    ys = y1[:, None] + grid[None, :] * bin_h[:, None]   # (R, PS)
    xs = x1[:, None] + grid[None, :] * bin_w[:, None]

    y_ok = (ys > -1.0) & (ys < Hf[:, None])
    x_ok = (xs > -1.0) & (xs < Wf[:, None])
    ys = jnp.clip(ys, 0.0, Hf[:, None] - 1.0)
    xs = jnp.clip(xs, 0.0, Wf[:, None] - 1.0)

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    y1i = jnp.minimum(y0 + 1, Hf[:, None] - 1.0)
    x1i = jnp.minimum(x0 + 1, Wf[:, None] - 1.0)
    ly = ys - y0
    lx = xs - x0

    # --- window bases (per roi) ---
    base_y = jnp.clip(y0[:, 0].astype(jnp.int32), 0, jnp.maximum(H - WINDOW, 0))
    base_x = jnp.clip(x0[:, 0].astype(jnp.int32), 0, jnp.maximum(W - WINDOW, 0))

    # --- interpolation matrices (R, PS, WINDOW) ---
    cols = jnp.arange(WINDOW, dtype=jnp.int32)
    y0r = y0.astype(jnp.int32) - base_y[:, None]
    y1r = y1i.astype(jnp.int32) - base_y[:, None]
    x0r = x0.astype(jnp.int32) - base_x[:, None]
    x1r = x1i.astype(jnp.int32) - base_x[:, None]

    def interp(rel0, rel1, frac, ok):
        w0 = ((1.0 - frac) * ok)[..., None] * (cols[None, None, :] == rel0[..., None])
        w1 = (frac * ok)[..., None] * (cols[None, None, :] == rel1[..., None])
        return w0 + w1  # (R, PS, WINDOW)

    Wy = interp(y0r, y1r, ly, y_ok.astype(jnp.float32))
    Wx = interp(x0r, x1r, lx, x_ok.astype(jnp.float32))

    # --- contiguous window reads: WINDOW row-chunks of (WINDOW, C) each ---
    rows = jnp.clip(base_y[:, None] + cols[None, :], 0, H[:, None] - 1)  # (R, WINDOW)
    starts = off[:, None] + rows * W[:, None] + base_x[:, None]          # (R, WINDOW)
    win = jax.lax.gather(
        flat,
        starts.reshape(-1, 1),
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
        ),
        slice_sizes=(WINDOW, C),
        mode="clip",
    ).reshape(R, WINDOW, WINDOW, C)

    # --- two interpolation matmuls + bin average ---
    dtype = win.dtype
    tmp = jnp.einsum("rph,rhwc->rpwc", Wy.astype(dtype), win)      # (R, PS, WINDOW, C)
    val = jnp.einsum("rqw,rpwc->rpqc", Wx.astype(dtype), tmp)      # (R, PS, PS, C)
    val = val.reshape(R, P, S, P, S, C).mean(axis=(2, 4))
    return val.astype(feats[0].dtype)


# ---------------------------------------------------------------------------
# Hybrid Pallas forward / XLA-scatter backward (batched API)
# ---------------------------------------------------------------------------

# Sample-point budget per sequential gather step. The gather formulation
# materializes (R, P*S, P*S, C) intermediates; at eval scale (~4k
# proposals/img, batch 16 — and S=8 on the adaptive parity grid) that is
# tens of GB scheduled all at once (measured: a clean 74.6 GB compile-time
# OOM). Chunking over RoIs with lax.map bounds the peak to one chunk with
# equal-within-fp-rounding numbers — pure scheduling. The chunk size
# scales inversely with the sample-grid area so the adaptive grid (16x the
# static-2 samples) gets 16x smaller chunks; training (512 RoIs/img,
# static 2) stays on the single-shot path.
GATHER_CHUNK_BUDGET = 512 * (7 * 2) ** 2  # 512 RoIs at the static-2 grid


def _gather_chunked(
    feats, boxes, strides, out_size: int = 7, sampling_ratio: int = 2
) -> jnp.ndarray:
    R = boxes.shape[0]
    S = ADAPTIVE_MAX_RATIO if sampling_ratio == -1 else sampling_ratio
    chunk = max(32, GATHER_CHUNK_BUDGET // ((out_size * S) ** 2))
    if R <= chunk:
        return _multilevel_roi_align_gather(
            feats, boxes, strides, out_size, sampling_ratio
        )
    pad = (-R) % chunk
    bb = jnp.pad(boxes, ((0, pad), (0, 0)))
    chunks = bb.reshape(-1, chunk, 4)
    # checkpoint: the backward recomputes each chunk's gathers instead of
    # storing every chunk's residuals (restores the memory bound under AD)
    body = jax.checkpoint(
        lambda cb: _multilevel_roi_align_gather(
            feats, cb, strides, out_size, sampling_ratio
        )
    )
    out = jax.lax.map(body, chunks)
    return out.reshape(-1, *out.shape[2:])[:R]


def multilevel_roi_align_batched(
    feats,
    boxes,
    strides: Sequence[int],
    out_size: int = 7,
    sampling_ratio: int = 2,
    impl: str = "gather",
    bwd_impl: str = "pallas",
):
    """Batched RoIAlign: feats per-level (B, H, W, C); boxes (B, R, 4).

    impl='pallas' runs the fori-loop Pallas kernel forward
    (ops/pallas/roi_align_v2.py — ~5x the XLA gather on v5e) with a custom
    VJP. The backward defaults to the mirrored Pallas window-RMW kernel
    (roi_align_pallas_v2_bwd — replaces XLA's row scatter-add, the largest
    single device cost of the train step); bwd_impl='xla' falls back to the
    gather formulation's scatter-add (the unused forward gathers inside the
    VJP are DCE'd by XLA). Boxes receive zero gradient (proposals are
    stop-gradient upstream, SURVEY.md §3.1).
    NOTE: the pallas path pools aspect-ratio>~3.6 boxes one FPN level
    coarser (window fit); use 'gather' for exact reference parity.
    """
    feats = tuple(feats)
    if sampling_ratio == -1:
        impl = "gather"  # adaptive grid is only expressed by the gather impl
    if impl == "gather":
        return jax.vmap(
            lambda fl, bb: _gather_chunked(
                list(fl), bb, strides, out_size, sampling_ratio
            )
        )(feats, boxes)

    from .pallas.roi_align_v2 import roi_align_pallas_v2, roi_align_pallas_v2_bwd

    strides_t = tuple(strides)

    interp = jax.default_backend() != "tpu"  # CPU tests: interpret mode

    @jax.custom_vjp
    def _hybrid(fs, bx):
        return roi_align_pallas_v2(
            list(fs), bx, strides_t, out_size, sampling_ratio, interpret=interp
        )

    def _fwd(fs, bx):
        return _hybrid(fs, bx), (fs, bx)

    def _bwd(res, g):
        fs, bx = res
        if bwd_impl in ("pallas", "pallas_bf16"):
            # pallas_bf16: bf16 gradient accumulators halve the window-RMW
            # HBM traffic (the step's largest kernel cost); opt-in — each
            # accumulator cell rounds once per contributing RoI.
            dfs = roi_align_pallas_v2_bwd(
                list(fs), bx, g, strides_t, out_size, sampling_ratio,
                interpret=interp,
                acc_dtype=jnp.bfloat16 if bwd_impl == "pallas_bf16" else jnp.float32,
            )
            dfs = tuple(d.astype(f.dtype) for d, f in zip(dfs, fs))
        else:
            # f32 for the scatter accumulation regardless of pooling dtype
            _, vjp = jax.vjp(
                lambda f: jax.vmap(
                    lambda fl, bb: _multilevel_roi_align_gather(
                        list(fl), bb, strides_t, out_size, sampling_ratio
                    )
                )(f, bx),
                fs,
            )
            (dfs,) = vjp(g)
        return dfs, jnp.zeros_like(bx)

    _hybrid.defvjp(_fwd, _bwd)
    return _hybrid(feats, boxes)
