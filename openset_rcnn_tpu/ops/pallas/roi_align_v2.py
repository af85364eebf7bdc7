"""Pallas RoIAlign v2: fori-loop body -> flat Mosaic compile time.

Same math as ops/pallas/roi_align_kernel.py (window DMA + on-chip bilinear)
but with NON-unrolled loops, following the pattern that keeps the NMS and
IoU-match kernels' compile times flat:

  * step 1 (y-interp), fori over the 14 sample rows: two dynamic dim-0 reads
    from the window + FMA, stored into t1 at a dynamic LANE offset p*C
    (C=256 is a multiple of the 128-lane tile, so the store is aligned);
  * step 2 (x-interp), fori over the 14 sample columns: dynamic dim-0 reads
    of t1 rows, accumulated at dynamic lane offsets of s;
  * the sample ordering [all sub-sample 0 | all sub-sample 1] makes the 2x2
    bin average four STATIC slices in both axes.

Window classes: both directions are HBM-bandwidth bound on the per-RoI
window DMA, and the worst-case window (56x64, sized for MAX_EXTENT) wastes
~3x traffic on typical RoIs whose bilinear footprint fits 32x40. Each RoI
is assigned the SMALLEST window class that contains its samples (host-side
membership masks); one pallas_call per class runs the same kernel at that
window size, non-member programs skip all DMA. Semantics are identical to
the single-window kernel — only the fetched rectangle shrinks.

Backward: `roi_align_pallas_v2_bwd` mirrors the forward — per RoI it
computes the (win_y, win_x, C) window gradient by running the two
interpolation steps transposed (dout -> dt1 -> dwin), then read-modify-
writes the window into a per-level f32 HBM accumulator. The RMW is
race-free because the TPU Pallas grid executes sequentially on the core
(dimension_semantics "arbitrary"); replaces XLA's row scatter-add, the
single largest device cost of the train step (PERFORMANCE.md).
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

# (win_y, win_x) classes, smallest first; the last must cover MAX_EXTENT
# (+1 bilinear neighbor, +1 span, +7 x-alignment slack) — it is the
# catch-all. win_x carries an extra 8 columns because base_x is aligned
# DOWN to the sublane tile.
WINDOWS = ((32, 40), (WIN_Y, WIN_X))


def _pad_levels(feats_shapes):
    """Padded per-level (Hp, Wp) sized for the LARGEST window class (all
    classes read from the same padded buffers)."""
    wy, wx = WINDOWS[-1]
    pad_hw = []
    for h, w in feats_shapes:
        Hp = max(h, wy)
        # Wp must be 8-aligned: base_x is aligned DOWN to the sublane tile,
        # so every clip bound (Wp - win_x) must itself be a multiple of 8 or
        # right-edge RoIs need window columns past win_x.
        Wp = (max(w, wx) + 7) // 8 * 8
        pad_hw.append((Hp, Wp))
    return pad_hw


def _window_members(real_hw, pad_hw, strides, flat_boxes, P, S, n_levels, B, R):
    """Per window class: geometry (bases clamped for that class) and a
    membership mask assigning each RoI its smallest fitting class."""
    geos, fits = [], []
    for wy, wx in WINDOWS:
        geo = _geometry(
            real_hw, pad_hw, strides, flat_boxes, P, S, n_levels, win_y=wy, win_x=wx
        )
        fits.append((jnp.max(geo["y1r"], axis=1) < wy) & (jnp.max(geo["x1r"], axis=1) < wx))
        geos.append(geo)
    members = []
    taken = None
    for k in range(len(WINDOWS) - 1):
        m = fits[k] if taken is None else fits[k] & ~taken
        members.append(m)
        taken = m if taken is None else taken | m
    members.append(~taken if taken is not None else jnp.ones_like(fits[-1]))
    img = jnp.repeat(jnp.arange(B, dtype=jnp.int32), R)
    hps = jnp.asarray([h for h, _ in pad_hw], jnp.int32)
    gys = [img * hps[g["lvl"]] + g["base_y"] for g in geos]
    return geos, members, gys


def _kernel(
    mem_ref, lvl_ref, gy_ref, bx_ref, y0_ref, y1_ref, x0_ref, x1_ref,
    w0y_ref, w1y_ref, w0x_ref, w1x_ref,
    f0_ref, f1_ref, f2_ref, f3_ref,
    out_ref,
    win_ref, t1_ref, s_ref, sem,
    *, P: int, S: int, C: int, WY: int, WX: int,
):
    r = pl.program_id(0)
    PS = P * S
    member = mem_ref[r] != 0

    @pl.when(jnp.logical_not(member))
    def _():
        out_ref[0] = jnp.zeros((P, P, C), out_ref.dtype)

    @pl.when(member)
    def _():
        lvl = lvl_ref[r]
        gy = gy_ref[r]
        bx = pl.multiple_of(bx_ref[r], 8)
        base = r * PS

        for li, f_ref in enumerate((f0_ref, f1_ref, f2_ref, f3_ref)):
            @pl.when(lvl == li)
            def _():
                dma = pltpu.make_async_copy(
                    f_ref.at[pl.ds(gy, WY), pl.ds(bx, WX), :], win_ref, sem
                )
                dma.start()
                dma.wait()

        # step 1: t1[x, 0, p*C:(p+1)*C] = w0y_p win[y0_p, x, :] + w1y_p win[y1_p, x, :]
        # (window may be bf16 to halve DMA traffic; interpolation math is f32)
        def yloop(p, _):
            r0 = win_ref[y0_ref[base + p], :, :].astype(jnp.float32)
            r1 = win_ref[y1_ref[base + p], :, :].astype(jnp.float32)
            row = r0 * w0y_ref[base + p] + r1 * w1y_ref[base + p]  # (WX, C)
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
        out_ref[0] = acc.reshape(P, P, C).astype(out_ref.dtype)


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

    real_hw = [(f.shape[1], f.shape[2]) for f in feats]
    pad_hw = _pad_levels(real_hw)
    buf = []
    for f, (Hp, Wp) in zip(feats, pad_hw):
        fp = jnp.pad(f, ((0, 0), (0, Hp - f.shape[1]), (0, Wp - f.shape[2]), (0, 0)))
        buf.append(fp.reshape(B * Hp, Wp, C))

    flat_boxes = boxes.reshape(B * R, 4)
    geos, members, gys = _window_members(
        real_hw, pad_hw, strides, flat_boxes, P, S, len(feats), B, R
    )

    N = B * R
    outs = []
    for start in range(0, N, CHUNK):
        end = min(start + CHUNK, N)
        sl = slice(start, end)
        n = end - start
        out = None
        # one call per window class; non-members emit zeros, classes
        # partition the RoIs, so the per-class outputs sum to the result.
        for (wy, wx), geo, member, gy in zip(WINDOWS, geos, members, gys):
            o = pl.pallas_call(
                functools.partial(_kernel, P=P, S=S, C=C, WY=wy, WX=wx),
                interpret=interpret,
                out_shape=jax.ShapeDtypeStruct((n, P, P, C), jnp.float32),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=12,
                    grid=(n,),
                    in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
                    out_specs=pl.BlockSpec((1, P, P, C), lambda r, *_: (r, 0, 0, 0)),
                    scratch_shapes=[
                        pltpu.VMEM((wy, wx, C), feats[0].dtype),  # DMA dtype
                        pltpu.VMEM((wx, 1, PS * C), jnp.float32),
                        pltpu.VMEM((PS, 1, PS * C), jnp.float32),
                        pltpu.SemaphoreType.DMA,
                    ],
                ),
            )(
                member[sl].astype(jnp.int32),
                geo["lvl"][sl], gy[sl], geo["base_x"][sl],
                geo["y0r"][sl].reshape(-1), geo["y1r"][sl].reshape(-1),
                geo["x0r"][sl].reshape(-1), geo["x1r"][sl].reshape(-1),
                geo["w0y"][sl].reshape(-1), geo["w1y"][sl].reshape(-1),
                geo["w0x"][sl].reshape(-1), geo["w1x"][sl].reshape(-1),
                *buf,
            )
            out = o if out is None else out + o
        outs.append(out)
    out = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    # kernel emits (x_bin, y_bin, C); swap to RoIAlign's (y_bin, x_bin, C)
    return out.reshape(B, R, P, P, C).transpose(0, 1, 3, 2, 4)


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(
    mem_ref, lvl_ref, gy_ref, bx_ref, y0_ref, y1_ref, x0_ref, x1_ref,
    w0y_ref, w1y_ref, w0x_ref, w1x_ref,
    g_ref, a0_ref, a1_ref, a2_ref, a3_ref,
    o0_ref, o1_ref, o2_ref, o3_ref,
    dwin_ref, rmw_ref, t1_ref, s_ref, sem_r, sem_w,
    *, P: int, S: int, C: int, WY: int, WX: int,
):
    del a0_ref, a1_ref, a2_ref, a3_ref  # aliased to o*_ref
    r = pl.program_id(0)
    PS = P * S
    member = mem_ref[r] != 0

    @pl.when(member)
    def _():
        lvl = lvl_ref[r]
        gy = gy_ref[r]
        bx = pl.multiple_of(bx_ref[r], 8)
        base = r * PS
        outs = (o0_ref, o1_ref, o2_ref, o3_ref)

        # Fetch the current accumulator window early; overlaps with the
        # transposed interpolation below. Safe vs the previous program's
        # write-back: the grid is sequential and that DMA was waited on.
        for li, a_ref in enumerate(outs):
            @pl.when(lvl == li)
            def _():
                pltpu.make_async_copy(
                    a_ref.at[pl.ds(gy, WY), pl.ds(bx, WX), :], rmw_ref, sem_r
                ).start()

        # d(bin average): spread g into the S*S sample quadrants.
        # Forward emitted out[q, p, c] from acc rows q (x bin) and lane blocks
        # p (y bin); the caller feeds g already transposed to (q, p, C).
        gk = g_ref[0].reshape(P, P * C) * (1.0 / (S * S))
        HALF = P * C
        for a in range(S):
            for b in range(S):
                s_ref[a * P : (a + 1) * P, 0, b * HALF : (b + 1) * HALF] = gk

        # d(x-interp): dt1[x0_q] += w0x_q ds[q]; dt1[x1_q] += w1x_q ds[q]
        t1_ref[:, :, :] = jnp.zeros((WX, 1, PS * C), jnp.float32)

        def xloop(q, _):
            row = s_ref[q, 0, :]
            x0 = x0_ref[base + q]
            x1 = x1_ref[base + q]
            t1_ref[x0, 0, :] = t1_ref[x0, 0, :] + row * w0x_ref[base + q]
            t1_ref[x1, 0, :] = t1_ref[x1, 0, :] + row * w1x_ref[base + q]
            return 0

        jax.lax.fori_loop(0, PS, xloop, 0)

        # d(y-interp): dwin[y0_p, x, :] += w0y_p dt1[x, p]; same for y1_p
        dwin_ref[:, :, :] = jnp.zeros((WY, WX, C), jnp.float32)

        def yloop(p, _):
            off = pl.multiple_of(p * C, 128)
            row = t1_ref[:, 0, pl.ds(off, C)]  # (WX, C)
            y0 = y0_ref[base + p]
            y1 = y1_ref[base + p]
            dwin_ref[y0, :, :] = dwin_ref[y0, :, :] + row * w0y_ref[base + p]
            dwin_ref[y1, :, :] = dwin_ref[y1, :, :] + row * w1y_ref[base + p]
            return 0

        jax.lax.fori_loop(0, PS, yloop, 0)

        # Read-modify-write the window into the level accumulator.
        for li, a_ref in enumerate(outs):
            @pl.when(lvl == li)
            def _():
                pltpu.make_async_copy(
                    a_ref.at[pl.ds(gy, WY), pl.ds(bx, WX), :], rmw_ref, sem_r
                ).wait()
                rmw_ref[:, :, :] = rmw_ref[:, :, :] + dwin_ref[:, :, :]
                wr = pltpu.make_async_copy(
                    rmw_ref, a_ref.at[pl.ds(gy, WY), pl.ds(bx, WX), :], sem_w
                )
                wr.start()
                wr.wait()


def roi_align_pallas_v2_bwd(
    feats: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    g: jnp.ndarray,
    strides: Sequence[int],
    out_size: int = 7,
    sampling_ratio: int = 2,
    interpret: bool = False,
):
    """d(roi_align_pallas_v2)/d(feats). g: (B, R, P, P, C) cotangent.

    Returns per-level f32 gradients shaped (B, H_l, W_l, C). Boxes get no
    gradient (proposals are stop-gradient upstream)."""
    B, R = boxes.shape[:2]
    C = feats[0].shape[-1]
    P, S = out_size, sampling_ratio
    PS = P * S

    real_hw = [(f.shape[1], f.shape[2]) for f in feats]
    pad_hw = _pad_levels(real_hw)

    flat_boxes = boxes.reshape(B * R, 4)
    geos, members, gys = _window_members(
        real_hw, pad_hw, strides, flat_boxes, P, S, len(feats), B, R
    )

    # forward emitted (p, q, C) per RoI; kernel coords are (q, p, C)
    gk = g.transpose(0, 1, 3, 2, 4).reshape(B * R, P, P, C).astype(jnp.float32)

    accs = [jnp.zeros((B * hp, wp, C), jnp.float32) for hp, wp in pad_hw]
    N = B * R
    for start in range(0, N, CHUNK):
        end = min(start + CHUNK, N)
        sl = slice(start, end)
        n = end - start
        # chain the accumulators through one call per window class
        for (wy, wx), geo, member, gy in zip(WINDOWS, geos, members, gys):
            accs = list(
                pl.pallas_call(
                    functools.partial(_bwd_kernel, P=P, S=S, C=C, WY=wy, WX=wx),
                    interpret=interpret,
                    out_shape=[
                        jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in accs
                    ],
                    grid_spec=pltpu.PrefetchScalarGridSpec(
                        num_scalar_prefetch=12,
                        grid=(n,),
                        in_specs=[pl.BlockSpec((1, P, P, C), lambda r, *_: (r, 0, 0, 0))]
                        + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
                        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
                        scratch_shapes=[
                            pltpu.VMEM((wy, wx, C), jnp.float32),
                            pltpu.VMEM((wy, wx, C), jnp.float32),
                            pltpu.VMEM((wx, 1, PS * C), jnp.float32),
                            pltpu.VMEM((PS, 1, PS * C), jnp.float32),
                            pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA,
                        ],
                    ),
                    # aliases count flattened scalar-prefetch operands too:
                    # 12 scalars + g -> the 4 accumulators sit at 13..16
                    input_output_aliases={13 + i: i for i in range(4)},
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("arbitrary",)
                    ),
                )(
                    member[sl].astype(jnp.int32),
                    geo["lvl"][sl], gy[sl], geo["base_x"][sl],
                    geo["y0r"][sl].reshape(-1), geo["y1r"][sl].reshape(-1),
                    geo["x0r"][sl].reshape(-1), geo["x1r"][sl].reshape(-1),
                    geo["w0y"][sl].reshape(-1), geo["w1y"][sl].reshape(-1),
                    geo["w0x"][sl].reshape(-1), geo["w1x"][sl].reshape(-1),
                    gk[sl], *accs,
                )
            )

    grads = []
    for acc, (hp, wp), (h, w) in zip(accs, pad_hw, real_hw):
        grads.append(acc.reshape(B, hp, wp, C)[:, :h, :w, :])
    return grads
