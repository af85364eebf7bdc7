"""Pallas RoIAlign v2: fori-loop body -> flat Mosaic compile time.

Same math as ops/pallas/roi_align_kernel.py (window DMA + on-chip bilinear)
but with NON-unrolled loops, following the pattern that keeps the NMS and
IoU-match kernels' compile times flat:

  * step 1 (y-interp), fori over the 14 sample rows: two dynamic dim-0 reads
    from the window + FMA, stored into t1 at a dynamic LANE offset p*C
    (C=256 is a multiple of the 128-lane tile, so the store is aligned);
    t1 carries a unit middle dim so its leading dim stays untiled;
  * step 2 (x-interp), fori over the 14 sample columns: dynamic dim-0 reads
    of t1 rows, accumulated at dynamic lane offsets of s;
  * the sample ordering [all sub-sample 0 | all sub-sample 1] makes the 2x2
    bin average four STATIC slices in both axes.

Backward: a custom VJP reuses the exact-gather implementation's gradient
(the scatter-add cost is unchanged; this kernel accelerates the forward).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align_kernel import WIN_X, WIN_Y, _geometry

CHUNK = 1024  # SMEM: 8 flattened (CHUNK*14,) arrays must stay under the 1 MB budget


def _kernel(
    lvl_ref, gy_ref, bx_ref, y0_ref, y1_ref, x0_ref, x1_ref,
    w0y_ref, w1y_ref, w0x_ref, w1x_ref,
    f0_ref, f1_ref, f2_ref, f3_ref,
    out_ref,
    win_ref, t1_ref, s_ref, sem,
    *, P: int, S: int, C: int,
):
    r = pl.program_id(0)
    PS = P * S
    lvl = lvl_ref[r]
    gy = gy_ref[r]
    bx = pl.multiple_of(bx_ref[r], 8)
    base = r * PS

    for li, f_ref in enumerate((f0_ref, f1_ref, f2_ref, f3_ref)):
        @pl.when(lvl == li)
        def _():
            dma = pltpu.make_async_copy(
                f_ref.at[pl.ds(gy, WIN_Y), pl.ds(bx, WIN_X), :], win_ref, sem
            )
            dma.start()
            dma.wait()

    # step 1: t1[x, 0, p*C:(p+1)*C] = w0y_p win[y0_p, x, :] + w1y_p win[y1_p, x, :]
    # (window may be bf16 to halve DMA traffic; interpolation math is f32)
    def yloop(p, _):
        r0 = win_ref[y0_ref[base + p], :, :].astype(jnp.float32)
        r1 = win_ref[y1_ref[base + p], :, :].astype(jnp.float32)
        row = r0 * w0y_ref[base + p] + r1 * w1y_ref[base + p]  # (WIN_X, C)
        off = pl.multiple_of(p * C, 128)
        t1_ref[:, 0, pl.ds(off, C)] = row
        return 0

    jax.lax.fori_loop(0, PS, yloop, 0)

    # step 2: s[q, 0, :] = w0x_q t1[x0_q] + w1x_q t1[x1_q]   (rows are (1, PS*C))
    def xloop(q, _):
        c0 = t1_ref[x0_ref[base + q], 0, :]
        c1 = t1_ref[x1_ref[base + q], 0, :]
        s_ref[q, 0, :] = c0 * w0x_ref[base + q] + c1 * w1x_ref[base + q]
        return 0

    jax.lax.fori_loop(0, PS, xloop, 0)

    # bin average via static quadrant slices (both p and q sample-major)
    HALF = P * C
    acc = None
    for a in range(S):          # q sub-sample
        for b in range(S):      # p sub-sample
            blk = s_ref[a * P : (a + 1) * P, 0, b * HALF : (b + 1) * HALF]
            acc = blk if acc is None else acc + blk
    acc = acc * (1.0 / (S * S))          # (P_x, P_y*C): x-bin rows, y-bin lanes
    out_ref[0] = acc.reshape(P, P, C)    # (q, p, C); transposed to (p, q, C) outside


def roi_align_pallas_v2(
    feats: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    strides: Sequence[int],
    out_size: int = 7,
    sampling_ratio: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """feats: per-level (B, H_l, W_l, C); boxes: (B, R, 4) -> (B, R, P, P, C)."""
    B, R = boxes.shape[:2]
    C = feats[0].shape[-1]
    P, S = out_size, sampling_ratio
    PS = P * S

    buf, real_hw, pad_hw = [], [], []
    for f in feats:
        Hp = max(f.shape[1], WIN_Y)
        # Wp must be 8-aligned: base_x is aligned DOWN to the sublane tile,
        # so the clip bound (Wp - WIN_X) must itself be a multiple of 8 or
        # right-edge RoIs need window columns past WIN_X.
        Wp = (max(f.shape[2], WIN_X) + 7) // 8 * 8
        fp = jnp.pad(f, ((0, 0), (0, Hp - f.shape[1]), (0, Wp - f.shape[2]), (0, 0)))
        buf.append(fp.reshape(B * Hp, Wp, C))
        real_hw.append((f.shape[1], f.shape[2]))
        pad_hw.append((Hp, Wp))

    flat_boxes = boxes.reshape(B * R, 4)
    geo = _geometry(real_hw, pad_hw, strides, flat_boxes, P, S, len(feats))
    img = jnp.repeat(jnp.arange(B, dtype=jnp.int32), R)
    hps = jnp.asarray([h for h, _ in pad_hw], jnp.int32)
    gy = img * hps[geo["lvl"]] + geo["base_y"]

    N = B * R
    outs = []
    for start in range(0, N, CHUNK):
        end = min(start + CHUNK, N)
        sl = slice(start, end)
        n = end - start
        out = pl.pallas_call(
            functools.partial(_kernel, P=P, S=S, C=C),
            interpret=interpret,
            out_shape=jax.ShapeDtypeStruct((n, P, P, C), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=11,
                grid=(n,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
                out_specs=pl.BlockSpec((1, P, P, C), lambda r, *_: (r, 0, 0, 0)),
                scratch_shapes=[
                    pltpu.VMEM((WIN_Y, WIN_X, C), feats[0].dtype),  # DMA dtype
                    pltpu.VMEM((WIN_X, 1, PS * C), jnp.float32),
                    pltpu.VMEM((PS, 1, PS * C), jnp.float32),
                    pltpu.SemaphoreType.DMA,
                ],
            ),
        )(
            geo["lvl"][sl], gy[sl], geo["base_x"][sl],
            geo["y0r"][sl].reshape(-1), geo["y1r"][sl].reshape(-1),
            geo["x0r"][sl].reshape(-1), geo["x1r"][sl].reshape(-1),
            geo["w0y"][sl].reshape(-1), geo["w1y"][sl].reshape(-1),
            geo["w0x"][sl].reshape(-1), geo["w1x"][sl].reshape(-1),
            *buf,
        )
        outs.append(out)
    out = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    # kernel emits (x_bin, y_bin, C); swap to RoIAlign's (y_bin, x_bin, C)
    return out.reshape(B, R, P, P, C).transpose(0, 1, 3, 2, 4)
