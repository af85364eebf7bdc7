"""Pallas TPU fused IoU + matcher kernel for RPN target assignment.

The reference materializes a (num_gt x num_anchors) IoU matrix and runs two
matchers over it (classification_free_rpn.py:365-367) — at ~93k anchors
that is a ~37 MB round trip per image per matcher pass. This kernel never
forms the matrix: it loops over (padded) GT boxes and updates per-anchor
running best-IoU/argmax vectors in VMEM, plus a second sweep for the
low-quality-rescue flags. Both the box-regression and objectness matchers
consume the SAME outputs (they only differ in thresholds, applied outside).

Outputs per image:
  max_iou (R,)  — best IoU over valid GT (-1 when no valid GT, matching
                  ops/matcher.py's masked convention);
  matched_idx (R,) — argmax GT row (first-max-wins, like jnp.argmax);
  rescued (R,)  — anchor ties a GT's best IoU and that best > 0
                  (ops/matcher.py low-quality rescue semantics).

fori_loop over G keeps compile time flat (same pattern as the NMS kernel).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(gt_ref, gtv_ref, anchors_ref, iou_ref, idx_ref, resc_ref, mbox_ref, gmax_ref, *, G: int, R: int):
    # gt_ref is the FLATTENED (B*G*4,) GT table and gtv_ref the flattened
    # (B*G,) validity: 2-D/3-D scalar-prefetch arrays are sublane/lane
    # padded (4 lanes -> 128), which overflowed the 1 MB SMEM at batch 24
    # (24x104x128x4 B = 1.28 MB); flat 1-D arrays prefetch unpadded.
    b = pl.program_id(0)

    def gt(g, c):
        return gt_ref[(b * G + g) * 4 + c]
    ax1 = anchors_ref[0, :]
    ay1 = anchors_ref[1, :]
    ax2 = anchors_ref[2, :]
    ay2 = anchors_ref[3, :]
    a_area = (ax2 - ax1) * (ay2 - ay1)

    def iou_row(g):
        gx1 = gt(g, 0)
        gy1 = gt(g, 1)
        gx2 = gt(g, 2)
        gy2 = gt(g, 3)
        g_area = (gx2 - gx1) * (gy2 - gy1)
        iw = jnp.maximum(jnp.minimum(gx2, ax2) - jnp.maximum(gx1, ax1), 0.0)
        ih = jnp.maximum(jnp.minimum(gy2, ay2) - jnp.maximum(gy1, ay1), 0.0)
        inter = iw * ih
        union = g_area + a_area - inter
        row = jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)
        valid = (gtv_ref[b * G + g] > 0).astype(jnp.float32)
        return jnp.where(valid > 0, row, -1.0)

    def pass1(g, carry):
        best, best_idx, bx1, by1, bx2, by2 = carry
        row = iou_row(g)
        gmax_ref[g] = jnp.max(row)  # per-GT best (SMEM scratch)
        better = row > best
        best = jnp.where(better, row, best)
        best_idx = jnp.where(better, g, best_idx)
        # carry the matched GT box coordinates so callers never pay the
        # (B*R, 4) XLA gather of gt_boxes[matched_idx] (~4 ms/step at 93k
        # anchors x batch 8 — profiled as the 2nd-largest non-conv fusion)
        bx1 = jnp.where(better, gt(g, 0), bx1)
        by1 = jnp.where(better, gt(g, 1), by1)
        bx2 = jnp.where(better, gt(g, 2), bx2)
        by2 = jnp.where(better, gt(g, 3), by2)
        return best, best_idx, bx1, by1, bx2, by2

    # matched-box init = GT row 0, matching the fallback's gt_boxes[argmax]
    # convention when nothing matches (argmax of an all(-1) row is 0)
    init_box = [jnp.full((R,), gt(0, c), jnp.float32) for c in range(4)]
    best, best_idx, bx1, by1, bx2, by2 = jax.lax.fori_loop(
        0,
        G,
        pass1,
        (jnp.full((R,), -1.0, jnp.float32), jnp.zeros((R,), jnp.int32), *init_box),
    )
    iou_ref[0, 0, :] = best
    idx_ref[0, 0, :] = best_idx
    mbox_ref[0, 0, :] = bx1
    mbox_ref[0, 1, :] = by1
    mbox_ref[0, 2, :] = bx2
    mbox_ref[0, 3, :] = by2

    def pass2(g, resc):
        row = iou_row(g)
        gm = gmax_ref[g]
        return resc + ((row == gm) & (gm > 0)).astype(jnp.float32)

    resc = jax.lax.fori_loop(0, G, pass2, jnp.zeros((R,), jnp.float32))
    resc_ref[0, 0, :] = jnp.minimum(resc, 1.0)


def iou_match_pallas(
    anchors: jnp.ndarray,   # (R, 4) shared across the batch
    gt_boxes: jnp.ndarray,  # (B, G, 4)
    gt_valid: jnp.ndarray,  # (B, G) bool
    interpret: bool = False,
):
    """Returns (max_iou (B, R), matched_idx (B, R), rescued (B, R) bool,
    matched_boxes (B, R, 4))."""
    B, G = gt_boxes.shape[:2]
    R = anchors.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        # outputs carry a unit middle dim so the (sublane, lane) block is
        # (1, R) — satisfying the TPU block-divisibility rule
        out_specs=[
            pl.BlockSpec((1, 1, R), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, R), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, R), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, 4, R), lambda b, *_: (b, 0, 0)),
        ],
        scratch_shapes=[pltpu.SMEM((G,), jnp.float32)],
    )
    max_iou, idx, resc, mbox = pl.pallas_call(
        functools.partial(_kernel, G=G, R=R),
        interpret=interpret,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, R), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, R), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, R), jnp.float32),
            jax.ShapeDtypeStruct((B, 4, R), jnp.float32),
        ),
    )(
        # flat 1-D scalar prefetch (SMEM): see _kernel docstring
        gt_boxes.astype(jnp.float32).reshape(-1),
        gt_valid.astype(jnp.int32).reshape(-1),
        anchors.T.astype(jnp.float32),  # (4, R) VMEM
    )
    return max_iou[:, 0], idx[:, 0], resc[:, 0] > 0.5, jnp.swapaxes(mbox, 1, 2)
