"""Pallas TPU greedy-NMS kernel.

TPU-native replacement for torchvision's CUDA ``nms`` (SURVEY.md §2.3) used
by the fused serving cascade. The XLA fallback (ops/nms.py) materializes the
full N x N IoU matrix and runs an N-step ``fori_loop`` over HLO dynamic
slices; this kernel keeps everything in VMEM and never forms the matrix:

  per iteration i (score order):
    * "is box i still alive" and box i's coordinates are obtained with
      one-hot reductions (no dynamic scalar reads from VMEM);
    * one vectorized IoU row of box i against ALL boxes updates the
      suppression vector.

O(N^2) VPU work on (1, N) vectors with a non-unrolled loop — compile time
stays flat in N, and N is a single static shape per call site.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, valid_ref, out_ref, *, n: int, thresh: float):
    x1 = boxes_ref[0, :]
    y1 = boxes_ref[1, :]
    x2 = boxes_ref[2, :]
    y2 = boxes_ref[3, :]
    valid = valid_ref[0, :]
    area = (x2 - x1) * (y2 - y1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)[0]

    def body(i, carry):
        keep, sup = carry
        onehot = (iota == i).astype(jnp.float32)
        alive = jnp.sum(onehot * (1.0 - sup) * valid)  # 1.0 if box i survives
        bx1 = jnp.sum(onehot * x1)
        by1 = jnp.sum(onehot * y1)
        bx2 = jnp.sum(onehot * x2)
        by2 = jnp.sum(onehot * y2)
        barea = (bx2 - bx1) * (by2 - by1)
        iw = jnp.maximum(jnp.minimum(bx2, x2) - jnp.maximum(bx1, x1), 0.0)
        ih = jnp.maximum(jnp.minimum(by2, y2) - jnp.maximum(by1, y1), 0.0)
        inter = iw * ih
        union = barea + area - inter
        iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)
        hit = (iou > thresh) & (iota > i)
        sup = jnp.minimum(sup + alive * hit.astype(jnp.float32), 1.0)
        keep = keep + alive * onehot
        return keep, sup

    keep, _ = jax.lax.fori_loop(
        0, n, body, (jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32))
    )
    out_ref[0, :] = keep


def nms_keep_pallas(
    boxes_sorted: jnp.ndarray,  # (N, 4) xyxy, already sorted by descending score
    valid: jnp.ndarray,         # (N,) bool
    thresh: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Keep mask (N,) bool over score-sorted boxes (strict '>' suppression)."""
    n = boxes_sorted.shape[0]
    keep = pl.pallas_call(
        functools.partial(_nms_kernel, n=n, thresh=float(thresh)),
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(
        boxes_sorted.T.astype(jnp.float32),          # (4, N): coordinate-major
        valid.astype(jnp.float32).reshape(1, n),
    )
    return keep[0] > 0.5
