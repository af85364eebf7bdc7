"""RoIAlign V2 vs a scalar numpy oracle implementing the published algorithm
(bilinear sampling, aligned=True half-pixel offset, average pooling)."""
import jax.numpy as jnp
import numpy as np

from openset_rcnn_tpu.ops import assign_levels, multilevel_roi_align


def oracle_roi_align(feat, boxes, scale, out=7, ratio=2):
    """Scalar reimplementation of RoIAlign aligned=True. feat: (H, W, C)."""
    H, W, C = feat.shape
    R = len(boxes)
    res = np.zeros((R, out, out, C), np.float32)
    for r, (bx1, by1, bx2, by2) in enumerate(boxes):
        x1, y1 = bx1 * scale - 0.5, by1 * scale - 0.5
        x2, y2 = bx2 * scale - 0.5, by2 * scale - 0.5
        bh, bw = (y2 - y1) / out, (x2 - x1) / out
        for i in range(out):
            for j in range(out):
                acc = np.zeros(C, np.float32)
                for a in range(ratio):
                    for b in range(ratio):
                        y = y1 + (i + (a + 0.5) / ratio) * bh
                        x = x1 + (j + (b + 0.5) / ratio) * bw
                        if y <= -1.0 or y >= H or x <= -1.0 or x >= W:
                            continue
                        y = min(max(y, 0.0), H - 1)
                        x = min(max(x, 0.0), W - 1)
                        y0, x0 = int(np.floor(y)), int(np.floor(x))
                        y1i, x1i = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
                        ly, lx = y - y0, x - x0
                        acc += (
                            feat[y0, x0] * (1 - ly) * (1 - lx)
                            + feat[y0, x1i] * (1 - ly) * lx
                            + feat[y1i, x0] * ly * (1 - lx)
                            + feat[y1i, x1i] * ly * lx
                        )
                res[r, i, j] = acc / (ratio * ratio)
    return res


def test_single_level_matches_oracle(rng):
    H, W, C = 32, 48, 8
    feat = rng.randn(H, W, C).astype(np.float32)
    boxes = np.asarray(
        [
            [4.0, 4.0, 60.0, 60.0],
            [0.0, 0.0, 128.0, 100.0],
            [10.5, 3.25, 77.75, 50.0],
            [100.0, 80.0, 260.0, 200.0],  # extends past the feature map
        ],
        np.float32,
    )
    got = multilevel_roi_align(
        [jnp.asarray(feat)], jnp.asarray(boxes), strides=[4], out_size=7, sampling_ratio=2
    )
    want = oracle_roi_align(feat, boxes, 0.25)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_level_assignment():
    # FPN paper formula: sqrt(area)=224 -> level 4 (index 2 for P2..P5)
    boxes = jnp.asarray(
        [
            [0, 0, 224, 224],     # level 4
            [0, 0, 112, 112],     # level 3
            [0, 0, 56, 56],       # level 2
            [0, 0, 448, 448],     # level 5
            [0, 0, 8, 8],         # clamps to 2
            [0, 0, 4000, 4000],   # clamps to 5
        ],
        jnp.float32,
    )
    lv = np.asarray(assign_levels(boxes))
    np.testing.assert_array_equal(lv, [2, 1, 0, 3, 0, 3])


def test_multilevel_routing(rng):
    # Two levels with distinct constant values: a small box must read level 0,
    # a large box level 1.
    C = 4
    f0 = np.full((64, 64, C), 1.0, np.float32)
    f1 = np.full((32, 32, C), 2.0, np.float32)
    boxes = jnp.asarray([[8, 8, 40, 40], [0, 0, 250, 250]], jnp.float32)
    out = multilevel_roi_align(
        [jnp.asarray(f0), jnp.asarray(f1)], boxes, strides=[4, 8], out_size=7
    )
    lv = np.asarray(assign_levels(boxes, min_level=2, max_level=3))
    np.testing.assert_array_equal(lv, [0, 1])
    np.testing.assert_allclose(np.asarray(out[0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), 2.0, atol=1e-6)


def test_gradients_flow(rng):
    import jax

    feat = jnp.asarray(rng.randn(16, 16, 4).astype(np.float32))
    boxes = jnp.asarray([[2.0, 2.0, 30.0, 30.0]])

    def f(x):
        return multilevel_roi_align([x], boxes, strides=[4]).sum()

    g = jax.grad(f)(feat)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def oracle_roi_align_adaptive(feat, boxes, scale, out=7):
    """d2 ROIAlignV2 sampling_ratio=0 semantics: ceil(roi/out) samples per
    bin axis, sum / (grid_h * grid_w)."""
    H, W, C = feat.shape
    res = np.zeros((len(boxes), out, out, C), np.float32)
    for r, (bx1, by1, bx2, by2) in enumerate(boxes):
        x1, y1 = bx1 * scale - 0.5, by1 * scale - 0.5
        x2, y2 = bx2 * scale - 0.5, by2 * scale - 0.5
        bh, bw = (y2 - y1) / out, (x2 - x1) / out
        gh = max(1, int(np.ceil((y2 - y1) / out)))
        gw = max(1, int(np.ceil((x2 - x1) / out)))
        for i in range(out):
            for j in range(out):
                acc = np.zeros(C, np.float32)
                for a in range(gh):
                    for b in range(gw):
                        y = y1 + (i + (a + 0.5) / gh) * bh
                        x = x1 + (j + (b + 0.5) / gw) * bw
                        if y <= -1.0 or y >= H or x <= -1.0 or x >= W:
                            continue
                        y = min(max(y, 0.0), H - 1)
                        x = min(max(x, 0.0), W - 1)
                        y0, x0 = int(np.floor(y)), int(np.floor(x))
                        y1i, x1i = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
                        ly, lx = y - y0, x - x0
                        acc += (
                            feat[y0, x0] * (1 - ly) * (1 - lx)
                            + feat[y0, x1i] * (1 - ly) * lx
                            + feat[y1i, x0] * ly * (1 - lx)
                            + feat[y1i, x1i] * ly * lx
                        )
                res[r, i, j] = acc / (gh * gw)
    return res


def test_adaptive_sampling_ratio_matches_d2_oracle(rng):
    """sampling_ratio=-1 reproduces d2's adaptive ceil(roi/7) grid
    (ROIAlignV2 built with sampling_ratio=0 at osrcnn_roi_heads.py:108-113)
    for per-axis counts from 1 up to the static cap."""
    H, W, C = 48, 64, 4
    feat = rng.randn(H, W, C).astype(np.float32)
    boxes = np.asarray(
        [
            [4.0, 4.0, 24.0, 24.0],       # feature extent 5   -> n=1
            [4.0, 4.0, 60.0, 100.0],      # 14 x 24            -> n=2 x 4
            [0.0, 0.0, 180.0, 120.0],     # 45 x 30            -> n=7 x 5
            [2.0, 10.0, 220.0, 40.0],     # wide: 54.5 x 7.5   -> n=8 x 2
            [100.0, 80.0, 260.0, 200.0],  # extends past the feature map
        ],
        np.float32,
    )
    got = multilevel_roi_align(
        [jnp.asarray(feat)], jnp.asarray(boxes), strides=[4], out_size=7, sampling_ratio=-1
    )
    want = oracle_roi_align_adaptive(feat, boxes, 0.25)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_gather_chunking_is_exact(rng):
    """Eval-scale RoI counts route the gather impl through lax.map chunks
    (GATHER_CHUNK) to bound peak memory; the numbers must be IDENTICAL to
    the single-shot gather (pure scheduling, round 4 — unblocks the parity
    eval config at production proposal counts)."""
    import jax

    from openset_rcnn_tpu.ops.roi_align import (
        _multilevel_roi_align_gather,
        multilevel_roi_align_batched,
    )

    sizes = [(64, 96), (32, 48), (16, 24), (8, 12)]
    C, B = 8, 2
    R = 512 + 137  # > the static-2 chunk (512): 2 chunks + ragged tail
    strides = [4, 8, 16, 32]
    feats = [jnp.asarray(rng.randn(B, h, w, C).astype(np.float32)) for h, w in sizes]
    xy = rng.uniform(0, 250, (B, R, 2))
    wh = rng.uniform(5, 120, (B, R, 2))
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))

    for sr in (2, -1):  # static grid and the adaptive parity grid
        got = multilevel_roi_align_batched(
            feats, boxes, strides, sampling_ratio=sr, impl="gather"
        )
        want = jax.vmap(
            lambda fl, bb: _multilevel_roi_align_gather(
                list(fl), bb, strides, 7, sr
            )
        )(tuple(feats), boxes)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=2e-5, err_msg=f"sr={sr}"
        )
