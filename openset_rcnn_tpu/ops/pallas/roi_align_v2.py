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

Window classes: both directions are HBM-bound on the per-RoI window
traffic, and the worst-case window (56x64, sized for MAX_EXTENT) wastes
~3x traffic on typical RoIs whose bilinear footprint fits 24x32. Each RoI
is assigned the SMALLEST window class that contains its samples; the class
id ships as a per-RoI scalar and the kernel branches to a statically-shaped
DMA per class — ONE pallas_call covers all classes (earlier revisions ran
one call per class, which tripled the grid and streamed a full zero-padded
output per class). Semantics are identical to a single-window kernel — only
the fetched rectangle shrinks.

Scalar-prefetch packing: per sample only THREE arrays ship to SMEM —
`pack` = y0r | x0r<<6 | y_ok<<12 | x_ok<<13 (s32) plus the fractional
offsets ly, lx (f32). The kernel derives y1 = min(y0+1, ymax), the
bilinear weights w0 = (1-l)*ok, w1 = l*ok in f32 (bit-identical to the
host-side formulas the XLA paths use), halving SMEM so CHUNK=4096 RoIs fit
one call.

Forward pipelining: the window fetch for RoI r+1 is started while RoI r
interpolates (2-slot VMEM buffer). Safe because the TPU core executes one
in-order instruction stream per sequential grid — the prefetch into slot
(r+1)%2 issues only after program r-1's reads of that slot have executed.

Backward: `roi_align_pallas_v2_bwd` mirrors the forward — per RoI it
computes the (win_y, win_x, C) window gradient by running the two
interpolation steps transposed (dout -> dt1 -> dwin), then read-modify-
writes the class-sized window into a per-level f32 HBM accumulator. The
RMW is race-free because the TPU grid runs sequentially on the core
(dimension_semantics "arbitrary"); replaces XLA's row scatter-add, the
single largest device cost of the train step (PERFORMANCE.md).

CI BLIND SPOT (DMA ordering): pytest exercises these kernels only in
interpret mode, where every async copy completes synchronously — the
forward 2-slot prefetch ordering and the backward distance-2 deferred
write drain are NOT validated by the test suite. Any change to the DMA
pipeline (slot rotation, semaphore indexing, wait placement) MUST re-run
the on-chip exact-vs-gather check (scripts/exp_shardmap_tpu.py; see
PERFORMANCE.md "Pallas kernels under shard_map") before shipping.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align_kernel import WIN_X, WIN_Y, _geometry

CHUNK = 4096  # 3 flattened (CHUNK*14,) SMEM arrays + 6 (CHUNK,) stay <1 MB

# (win_y, win_x) classes, smallest first; the last must cover MAX_EXTENT
# (+1 bilinear neighbor, +1 span, +7 x-alignment slack) — it is the
# catch-all. win_x carries an extra 8 columns because base_x is aligned
# DOWN to the sublane tile. RoIs at their canonical FPN level span ~10-20
# feature cells (+1 neighbor), so the bulk of sampled proposals take the
# (24, 32) class; the (40, 48) rung keeps high-aspect RoIs out of the
# catch-all (on proposal-like boxes classes split ~51/28/14/7%, total
# window traffic 35% of an all-catch-all kernel; measured bwd 50.7 ->
# 45.5 ms at 16x512 RoIs, forward is prefetch-hidden and unchanged).
WINDOWS = ((24, 32), (32, 40), (40, 48), (WIN_Y, WIN_X))

# The scalar `pack` gives y0r and x0r 6 bits each (y0r | x0r<<6 | ok<<12/13):
# every in-window coordinate must stay < 64 or x0r would alias into the y_ok
# bit and silently corrupt the bilinear weights. Guard the invariant at
# import so growing WINDOWS/MAX_EXTENT fails loudly instead.
assert all(wy <= 64 and wx <= 64 for wy, wx in WINDOWS), (
    f"window extents {WINDOWS} must fit the 6-bit pack fields (<= 64)"
)


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


def _class_geometry(real_hw, pad_hw, strides, flat_boxes, P, S, n_levels, B, R):
    """Per-RoI geometry with the smallest fitting window class.

    Returns per-RoI scalars (cls, lvl, gy=global padded row, bx, ymax, xmax)
    and per-sample arrays (pack, ly, lx) — see the module docstring for the
    pack layout. ymax/xmax are the REAL-boundary clip bounds relative to the
    window base, so the kernel can derive y1 = min(y0+1, ymax).
    """
    geos, fits = [], []
    for wy, wx in WINDOWS:
        geo = _geometry(
            real_hw, pad_hw, strides, flat_boxes, P, S, n_levels, win_y=wy, win_x=wx
        )
        fits.append((jnp.max(geo["y1r"], axis=1) < wy) & (jnp.max(geo["x1r"], axis=1) < wx))
        geos.append(geo)
    K = len(WINDOWS)
    cls = jnp.full(flat_boxes.shape[:1], K - 1, jnp.int32)
    for k in range(K - 2, -1, -1):
        cls = jnp.where(fits[k], k, cls)

    def sel(field):
        v = geos[K - 1][field]
        for k in range(K - 2, -1, -1):
            m = cls == k
            v = jnp.where(m if v.ndim == 1 else m[:, None], geos[k][field], v)
        return v

    lvl = geos[0]["lvl"]  # level assignment is window-independent
    base_y = sel("base_y")
    base_x = sel("base_x")
    y0r = sel("y0r")
    x0r = sel("x0r")
    y1r = sel("y1r")
    x1r = sel("x1r")
    # w1y = ly * y_ok and w0y = (1-ly) * y_ok (roi_align_kernel._geometry);
    # recover ly and the ok bit exactly: ok = (w0y + w1y) > 0, ly = w1y.
    w0y, w1y = geos[0]["w0y"], geos[0]["w1y"]  # weights are base-independent
    w0x, w1x = geos[0]["w0x"], geos[0]["w1x"]
    y_ok = ((w0y + w1y) > 0).astype(jnp.int32)
    x_ok = ((w0x + w1x) > 0).astype(jnp.int32)
    ly = w1y  # == ly * y_ok; multiplied by the ok bit again in-kernel (no-op)
    lx = w1x

    pack = y0r | (x0r << 6) | (y_ok << 12) | (x_ok << 13)

    hs = jnp.asarray([h for h, _ in real_hw], jnp.int32)
    ws = jnp.asarray([w for _, w in real_hw], jnp.int32)
    hps = jnp.asarray([h for h, _ in pad_hw], jnp.int32)
    img = jnp.repeat(jnp.arange(B, dtype=jnp.int32), R)
    gy = img * hps[lvl] + base_y
    ymax = (hs[lvl] - 1) - base_y
    xmax = (ws[lvl] - 1) - base_x

    # y1r/x1r must round-trip (the kernel derives them): guaranteed by
    # construction (y1 = min(y0+1, H-1)); keep the arrays out of the kernel.
    del y1r, x1r
    return dict(
        cls=cls, lvl=lvl, gy=gy, bx=base_x, ymax=ymax, xmax=xmax,
        pack=pack, ly=ly, lx=lx,
    )


def _kernel(
    cls_ref, lvl_ref, gy_ref, bx_ref, ymax_ref, xmax_ref,
    pack_ref, ly_ref, lx_ref,
    f0_ref, f1_ref, f2_ref, f3_ref,
    out_ref,
    win_ref, t1_ref, s_ref, sem,
    *, P: int, S: int, C: int, windows,
):
    r = pl.program_id(0)
    n = pl.num_programs(0)
    PS = P * S
    slot = jax.lax.rem(r, 2)
    frefs = (f0_ref, f1_ref, f2_ref, f3_ref)

    def fetch(idx, sl, op):
        """Class/level-branched window DMA for RoI `idx` into slot `sl`."""
        lvl_i = lvl_ref[idx]
        gy_i = gy_ref[idx]
        bx_i = pl.multiple_of(bx_ref[idx], 8)
        for k, (wy, wx) in enumerate(windows):
            @pl.when(cls_ref[idx] == k)
            def _(wy=wy, wx=wx):
                for li, f_ref in enumerate(frefs):
                    @pl.when(lvl_i == li)
                    def _(f_ref=f_ref):
                        op(pltpu.make_async_copy(
                            f_ref.at[pl.ds(gy_i, wy), pl.ds(bx_i, wx), :],
                            win_ref.at[sl, :wy, :wx],
                            sem.at[sl],
                        ))

    # Double-buffered window pipeline: program r waits the fetch issued at
    # r-1 (or its own warm-up at r=0) and prefetches r+1 into the other
    # slot, so the HBM fetch latency hides under the previous RoI's
    # interpolation.
    @pl.when(r == 0)
    def _():
        fetch(0, 0, lambda dma: dma.start())

    @pl.when(r + 1 < n)
    def _():
        fetch(r + 1, 1 - slot, lambda dma: dma.start())

    fetch(r, slot, lambda dma: dma.wait())

    ymax = ymax_ref[r]
    xmax = xmax_ref[r]
    base = r * PS

    # Interpolation, class-branched so each RoI's row ops run at its class
    # width (the (24,32) class moves ~40% of the catch-all's VMEM bytes).
    def interp(wy, wx):
        win = win_ref.at[slot, :wy, :wx]

        # step 1: t1[x, 0, p*C:(p+1)*C] = w0y_p win[y0_p, x, :] + w1y_p win[y1_p, x, :]
        # (window may be bf16 to halve DMA traffic; interpolation math is f32)
        def yloop(p, _):
            pk = pack_ref[base + p]
            y0 = pk & 63
            y1 = jnp.minimum(y0 + 1, ymax)
            okf = ((pk >> 12) & 1).astype(jnp.float32)
            ly = ly_ref[base + p]
            w0 = (1.0 - ly) * okf
            w1 = ly * okf
            r0 = win[y0, :, :].astype(jnp.float32)
            r1 = win[y1, :, :].astype(jnp.float32)
            row = r0 * w0 + r1 * w1  # (wx, C)
            off = pl.multiple_of(p * C, 128)
            t1_ref[:wx, 0, pl.ds(off, C)] = row
            return 0

        jax.lax.fori_loop(0, PS, yloop, 0)

        # step 2: s[q, 0, :] = w0x_q t1[x0_q] + w1x_q t1[x1_q]  (rows (1, PS*C))
        def xloop(q, _):
            pk = pack_ref[base + q]
            x0 = (pk >> 6) & 63
            x1 = jnp.minimum(x0 + 1, xmax)
            okf = ((pk >> 13) & 1).astype(jnp.float32)
            lx = lx_ref[base + q]
            w0 = (1.0 - lx) * okf
            w1 = lx * okf
            c0 = t1_ref[x0, 0, :]
            c1 = t1_ref[x1, 0, :]
            s_ref[q, 0, :] = c0 * w0 + c1 * w1
            return 0

        jax.lax.fori_loop(0, PS, xloop, 0)

    for k, (wy, wx) in enumerate(windows):
        @pl.when(cls_ref[r] == k)
        def _(wy=wy, wx=wx):
            interp(wy, wx)

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
    WYM, WXM = WINDOWS[-1]

    real_hw = [(f.shape[1], f.shape[2]) for f in feats]
    pad_hw = _pad_levels(real_hw)
    buf = []
    for f, (Hp, Wp) in zip(feats, pad_hw):
        fp = jnp.pad(f, ((0, 0), (0, Hp - f.shape[1]), (0, Wp - f.shape[2]), (0, 0)))
        buf.append(fp.reshape(B * Hp, Wp, C))

    flat_boxes = boxes.reshape(B * R, 4)
    geo = _class_geometry(
        real_hw, pad_hw, strides, flat_boxes, P, S, len(feats), B, R
    )

    N = B * R
    outs = []
    for start in range(0, N, CHUNK):
        end = min(start + CHUNK, N)
        sl = slice(start, end)
        n = end - start
        o = pl.pallas_call(
            functools.partial(_kernel, P=P, S=S, C=C, windows=WINDOWS),
            interpret=interpret,
            out_shape=jax.ShapeDtypeStruct((n, P, P, C), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=9,
                grid=(n,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
                out_specs=pl.BlockSpec((1, P, P, C), lambda r, *_: (r, 0, 0, 0)),
                scratch_shapes=[
                    pltpu.VMEM((2, WYM, WXM, C), feats[0].dtype),  # 2-slot pipeline
                    pltpu.VMEM((WXM, 1, PS * C), jnp.float32),
                    pltpu.VMEM((PS, 1, PS * C), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
            # the 2-slot window pipeline needs in-order grid execution
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)
            ),
        )(
            geo["cls"][sl], geo["lvl"][sl], geo["gy"][sl], geo["bx"][sl],
            geo["ymax"][sl], geo["xmax"][sl],
            geo["pack"][sl].reshape(-1),
            geo["ly"][sl].reshape(-1), geo["lx"][sl].reshape(-1),
            *buf,
        )
        outs.append(o)
    out = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    # kernel emits (x_bin, y_bin, C); swap to RoIAlign's (y_bin, x_bin, C)
    return out.reshape(B, R, P, P, C).transpose(0, 1, 3, 2, 4)


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(
    cls_ref, lvl_ref, gy_ref, bx_ref, ymax_ref, xmax_ref,
    pack_ref, ly_ref, lx_ref,
    g_ref, a0_ref, a1_ref, a2_ref, a3_ref,
    o0_ref, o1_ref, o2_ref, o3_ref,
    dwin_ref, rmw_ref, t1_ref, s_ref, sem_r, sem_w,
    *, P: int, S: int, C: int, windows, pipelined: bool,
    acc_dtype=jnp.float32,
):
    """Per-RoI window-gradient RMW.

    pipelined=True defers each program's write-back WAIT by two grid steps,
    so the write overlaps the next RoI's interpolation. Correct ONLY under
    the caller's image-interleaved RoI order (consecutive programs come
    from different images, so their accumulator windows are disjoint; the
    nearest possible RMW conflict is B>=2 programs away and the write is
    drained at distance 2 before the conflicting read starts). rmw slots
    and write semaphores alternate r%2; slot reuse at r+2 is guarded by the
    same distance-2 drain.
    """
    del a0_ref, a1_ref, a2_ref, a3_ref  # aliased to o*_ref
    r = pl.program_id(0)
    n = pl.num_programs(0)
    PS = P * S
    ymax = ymax_ref[r]
    xmax = xmax_ref[r]
    base = r * PS
    wslot = jax.lax.rem(r, 2)
    outs = (o0_ref, o1_ref, o2_ref, o3_ref)

    def rmw_dma(idx, slot, direction, op):
        """Class/level-branched accumulator-window DMA for RoI `idx`."""
        lvl_i = lvl_ref[idx]
        gy_i = gy_ref[idx]
        bx_i = pl.multiple_of(bx_ref[idx], 8)
        for k, (wy, wx) in enumerate(windows):
            @pl.when(cls_ref[idx] == k)
            def _(wy=wy, wx=wx):
                for li, a_ref in enumerate(outs):
                    @pl.when(lvl_i == li)
                    def _():
                        hbm = a_ref.at[pl.ds(gy_i, wy), pl.ds(bx_i, wx), :]
                        vmem = rmw_ref.at[slot, :wy, :wx]
                        if direction == "read":
                            op(pltpu.make_async_copy(hbm, vmem, sem_r))
                        else:
                            op(pltpu.make_async_copy(vmem, hbm, sem_w.at[slot]))

    if pipelined:
        # Drain the write issued two programs ago (same slot/semaphore)
        # BEFORE reading this program's window: orders any true RMW
        # conflict (nearest at distance B>=2) and frees the rmw slot.
        @pl.when(r >= 2)
        def _():
            rmw_dma(r - 2, wslot, "write", lambda dma: dma.wait())

    # Fetch the current accumulator window early; overlaps with the
    # transposed interpolation below.
    rmw_dma(r, wslot, "read", lambda dma: dma.start())

    # d(bin average): spread g into the S*S sample quadrants.
    # Forward emitted out[q, p, c] from acc rows q (x bin) and lane blocks
    # p (y bin); the caller feeds g already transposed to (q, p, C).
    gk = g_ref[0].reshape(P, P * C) * (1.0 / (S * S))
    HALF = P * C
    for a in range(S):
        for b in range(S):
            s_ref[a * P : (a + 1) * P, 0, b * HALF : (b + 1) * HALF] = gk

    def body(wy, wx):
        """Class-sized interpolation transpose: VMEM touches run at (wy, wx)."""

        # d(x-interp): dt1[x0_q] += w0x_q ds[q]; dt1[x1_q] += w1x_q ds[q]
        t1_ref[:wx, :, :] = jnp.zeros((wx, 1, PS * C), jnp.float32)

        def xloop(q, _):
            pk = pack_ref[base + q]
            x0 = (pk >> 6) & 63
            x1 = jnp.minimum(x0 + 1, xmax)
            okf = ((pk >> 13) & 1).astype(jnp.float32)
            lx = lx_ref[base + q]
            row = s_ref[q, 0, :]
            t1_ref[x0, 0, :] = t1_ref[x0, 0, :] + row * ((1.0 - lx) * okf)
            t1_ref[x1, 0, :] = t1_ref[x1, 0, :] + row * (lx * okf)
            return 0

        jax.lax.fori_loop(0, PS, xloop, 0)

        # d(y-interp): dwin[y0_p, x, :] += w0y_p dt1[x, p]; same for y1_p
        dwin_ref[:wy, :wx, :] = jnp.zeros((wy, wx, C), jnp.float32)

        def yloop(p, _):
            pk = pack_ref[base + p]
            y0 = pk & 63
            y1 = jnp.minimum(y0 + 1, ymax)
            okf = ((pk >> 12) & 1).astype(jnp.float32)
            ly = ly_ref[base + p]
            off = pl.multiple_of(p * C, 128)
            row = t1_ref[:wx, 0, pl.ds(off, C)]  # (wx, C)
            dwin_ref[y0, :wx, :] = dwin_ref[y0, :wx, :] + row * ((1.0 - ly) * okf)
            dwin_ref[y1, :wx, :] = dwin_ref[y1, :wx, :] + row * (ly * okf)
            return 0

        jax.lax.fori_loop(0, PS, yloop, 0)

        # Add into the fetched accumulator window (f32 math; the store
        # rounds to acc_dtype — a no-op for the f32 default).
        def accumulate(dma):
            dma.wait()
            rmw_ref[wslot, :wy, :wx] = (
                rmw_ref[wslot, :wy, :wx].astype(jnp.float32)
                + dwin_ref[:wy, :wx]
            ).astype(acc_dtype)

        for li, a_ref in enumerate(outs):
            @pl.when(lvl_ref[r] == li)
            def _():
                accumulate(pltpu.make_async_copy(
                    a_ref.at[pl.ds(gy_ref[r], wy), pl.ds(pl.multiple_of(bx_ref[r], 8), wx), :],
                    rmw_ref.at[wslot, :wy, :wx],
                    sem_r,
                ))

    for k, (wy, wx) in enumerate(windows):
        @pl.when(cls_ref[r] == k)
        def _(wy=wy, wx=wx):
            body(wy, wx)

    # Write the updated window back.
    if pipelined:
        rmw_dma(r, wslot, "write", lambda dma: dma.start())

        # Last program(s): drain every write still in flight before the
        # kernel returns (the next chunk's call reads these accumulators).
        @pl.when(r == n - 1)
        def _():
            @pl.when(n >= 2)
            def _():
                rmw_dma(r - 1, 1 - wslot, "write", lambda dma: dma.wait())
            rmw_dma(r, wslot, "write", lambda dma: dma.wait())
    else:
        def run_write(wr):
            wr.start()
            wr.wait()

        rmw_dma(r, wslot, "write", run_write)


def roi_align_pallas_v2_bwd(
    feats: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    g: jnp.ndarray,
    strides: Sequence[int],
    out_size: int = 7,
    sampling_ratio: int = 2,
    interpret: bool = False,
    acc_dtype=jnp.float32,
):
    """d(roi_align_pallas_v2)/d(feats). g: (B, R, P, P, C) cotangent.

    Returns per-level f32 gradients shaped (B, H_l, W_l, C). Boxes get no
    gradient (proposals are stop-gradient upstream).

    ``acc_dtype=bfloat16`` halves the window RMW's HBM traffic — the train
    step's single largest kernel cost (PERFORMANCE.md round-4 ceiling
    math) — by keeping the per-level gradient accumulators bf16 in HBM.
    The per-RoI window gradient is still COMPUTED in f32; only the
    accumulator read+add+write rounds to bf16, so each accumulator cell
    loses precision once per contributing RoI (~tens of adds). Opt-in via
    TPU.ROI_ALIGN_BWD=pallas_bf16; the f32 default is bit-aligned with
    the XLA scatter-add."""
    B, R = boxes.shape[:2]
    C = feats[0].shape[-1]
    P, S = out_size, sampling_ratio
    PS = P * S
    WYM, WXM = WINDOWS[-1]

    real_hw = [(f.shape[1], f.shape[2]) for f in feats]
    pad_hw = _pad_levels(real_hw)

    flat_boxes = boxes.reshape(B * R, 4)
    geo = _class_geometry(
        real_hw, pad_hw, strides, flat_boxes, P, S, len(feats), B, R
    )

    # forward emitted (p, q, C) per RoI; kernel coords are (q, p, C)
    gk = g.transpose(0, 1, 3, 2, 4).reshape(B * R, P, P, C).astype(jnp.float32)

    # Image-interleaved RoI order (proposal-major): consecutive grid
    # programs then come from DIFFERENT images, whose accumulator windows
    # are disjoint, so the kernel may defer each write-back wait by two
    # programs (see _bwd_kernel). The accumulators are order-invariant.
    pipelined = B >= 2
    if pipelined:
        def interleave(v):
            return jnp.swapaxes(v.reshape((B, R) + v.shape[1:]), 0, 1).reshape(
                (B * R,) + v.shape[1:]
            )

        geo = {key: interleave(v) for key, v in geo.items()}
        gk = interleave(gk)

    accs = [jnp.zeros((B * hp, wp, C), acc_dtype) for hp, wp in pad_hw]
    N = B * R
    for start in range(0, N, CHUNK):
        end = min(start + CHUNK, N)
        sl = slice(start, end)
        n = end - start
        accs = list(
            pl.pallas_call(
                functools.partial(
                    _bwd_kernel, P=P, S=S, C=C, windows=WINDOWS,
                    pipelined=pipelined, acc_dtype=acc_dtype,
                ),
                interpret=interpret,
                out_shape=[
                    jax.ShapeDtypeStruct(a.shape, acc_dtype) for a in accs
                ],
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=9,
                    grid=(n,),
                    in_specs=[pl.BlockSpec((1, P, P, C), lambda r, *_: (r, 0, 0, 0))]
                    + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
                    out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
                    scratch_shapes=[
                        pltpu.VMEM((WYM, WXM, C), jnp.float32),
                        pltpu.VMEM((2, WYM, WXM, C), acc_dtype),  # RMW staging
                        pltpu.VMEM((WXM, 1, PS * C), jnp.float32),
                        pltpu.VMEM((PS, 1, PS * C), jnp.float32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA((2,)),
                    ],
                ),
                # aliases count flattened scalar-prefetch operands too:
                # 9 scalars + g -> the 4 accumulators sit at 10..13
                input_output_aliases={10 + i: i for i in range(4)},
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)
                ),
            )(
                geo["cls"][sl], geo["lvl"][sl], geo["gy"][sl], geo["bx"][sl],
                geo["ymax"][sl], geo["xmax"][sl],
                geo["pack"][sl].reshape(-1),
                geo["ly"][sl].reshape(-1), geo["lx"][sl].reshape(-1),
                gk[sl], *accs,
            )
        )

    grads = []
    for acc, (hp, wp), (h, w) in zip(accs, pad_hw, real_hw):
        grads.append(acc.reshape(B, hp, wp, C)[:, :h, :w, :])
    return grads
