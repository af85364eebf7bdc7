"""Pallas RoIAlign kernel vs the exact gather path (interpret mode on CPU;
the same kernel was verified bit-for-bit on a real v5e chip)."""
import jax
import jax.numpy as jnp
import numpy as np

from openset_rcnn_tpu.ops.pallas.roi_align_kernel import roi_align_pallas_fwd
from openset_rcnn_tpu.ops.roi_align import _multilevel_roi_align_gather


def test_pallas_matches_gather(rng):
    sizes = [(64, 96), (32, 48), (16, 24), (8, 12)]
    C, B, R = 32, 2, 16
    feats = [jnp.asarray(rng.randn(B, h, w, C).astype(np.float32)) for h, w in sizes]
    ar = rng.uniform(0.6, 1.8, (B, R))
    area = rng.uniform(10**2, 150**2, (B, R))
    w = np.sqrt(area * ar)
    h = np.sqrt(area / ar)
    cx = rng.uniform(0, 384, (B, R))
    cy = rng.uniform(0, 256, (B, R))
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1).astype(np.float32)
    boxes = np.clip(boxes, 0, np.asarray([384, 256, 384, 256], np.float32))
    bj = jnp.asarray(boxes)

    got = roi_align_pallas_fwd(feats, bj, [4, 8, 16, 32], interpret=True)
    want = jax.vmap(lambda fl, bb: _multilevel_roi_align_gather(fl, bb, [4, 8, 16, 32]))(
        feats, bj
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def _mixed_window_boxes(rng, B, R):
    """Boxes spanning ALL FOUR v2 window classes (24x32 / 32x40 / 40x48 /
    56x64), all below the level-bump bound so pallas == gather still holds.

    Class selection is driven by the *y*-extent at level 0 (stride 4): the
    y axis has no base-alignment slack, so a feature-cell extent of E rows
    yields max y1r ~ E+1 deterministically. The tall groups pin their
    centers inside the image so boundary clipping can't shrink them into a
    smaller class; aspect stays < 3.6 (no level bump) and sqrt(area) < 112
    (stays at level 0)."""
    q = R // 4
    n0 = R - 3 * q  # ordinary RoIs (smallest class) absorb the remainder
    ar = rng.uniform(0.6, 1.8, (B, n0))
    area = rng.uniform(10**2, 80**2, (B, n0))
    w0 = np.sqrt(area * ar)
    h0 = np.sqrt(area / ar)
    cx0 = rng.uniform(0, 384, (B, n0))
    cy0 = rng.uniform(0, 256, (B, n0))
    # y-extent 26..29 cells: fails (24,32), fits (32,40)
    h1 = rng.uniform(106, 114, (B, q)); w1 = rng.uniform(40, 70, (B, q))
    # y-extent 34..37 cells: fails (32,40), fits (40,48)
    h2 = rng.uniform(138, 146, (B, q)); w2 = rng.uniform(50, 80, (B, q))
    # y-extent 42..47 cells: fails (40,48), fits the (56,64) catch-all
    h3 = rng.uniform(170, 188, (B, q)); w3 = rng.uniform(56, 62, (B, q))
    w = np.concatenate([w0, w1, w2, w3], 1)
    h = np.concatenate([h0, h1, h2, h3], 1)
    cx_in = [rng.uniform(wk / 2, 384 - wk / 2) for wk in (w1, w2, w3)]
    cy_in = [rng.uniform(hk / 2, 256 - hk / 2) for hk in (h1, h2, h3)]
    cx = np.concatenate([cx0] + cx_in, 1)
    cy = np.concatenate([cy0] + cy_in, 1)
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1).astype(np.float32)
    return np.clip(boxes, 0, np.asarray([384, 256, 384, 256], np.float32))


def test_pallas_v2_forward_matches_gather(rng):
    """The fori-loop v2 forward (window classes + membership masks) equals
    the exact gather path on boxes below the level-bump bound."""
    from openset_rcnn_tpu.ops.pallas.roi_align_v2 import roi_align_pallas_v2

    sizes = [(64, 96), (32, 48), (16, 24), (8, 12)]
    C, B, R = 32, 2, 16
    strides = [4, 8, 16, 32]
    feats = [jnp.asarray(rng.randn(B, h, w, C).astype(np.float32)) for h, w in sizes]
    bj = jnp.asarray(_mixed_window_boxes(rng, B, R))

    got = roi_align_pallas_v2(feats, bj, strides, interpret=True)
    want = jax.vmap(lambda fl, bb: _multilevel_roi_align_gather(fl, bb, strides))(
        feats, bj
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    # the box distribution must exercise EVERY window class (each RoI is
    # assigned exactly one class id)
    from openset_rcnn_tpu.ops.pallas.roi_align_v2 import (
        WINDOWS,
        _class_geometry,
        _pad_levels,
    )

    real_hw = [(h, w) for h, w in sizes]
    geo = _class_geometry(
        real_hw, _pad_levels(real_hw), strides, bj.reshape(-1, 4), 7, 2, 4, B, R
    )
    counts = [int((geo["cls"] == k).sum()) for k in range(len(WINDOWS))]
    assert all(c > 0 for c in counts), counts
    assert sum(counts) == B * R, counts


def test_pallas_backward_matches_gather_vjp(rng):
    """The window-RMW backward kernel equals the gather formulation's
    scatter-add gradient (boxes chosen below the level-bump aspect bound,
    where forward pallas == forward gather)."""
    from openset_rcnn_tpu.ops.pallas.roi_align_v2 import roi_align_pallas_v2_bwd

    sizes = [(64, 96), (32, 48), (16, 24), (8, 12)]
    C, B, R = 32, 2, 12
    strides = [4, 8, 16, 32]
    feats = [jnp.asarray(rng.randn(B, h, w, C).astype(np.float32)) for h, w in sizes]
    bj = jnp.asarray(_mixed_window_boxes(rng, B, R))
    g = jnp.asarray(rng.randn(B, R, 7, 7, C).astype(np.float32))

    got = roi_align_pallas_v2_bwd(feats, bj, g, strides, interpret=True)

    def f(fs):
        return jax.vmap(
            lambda fl, bb: _multilevel_roi_align_gather(list(fl), bb, strides)
        )(fs, bj)

    _, vjp = jax.vjp(f, tuple(feats))
    (want,) = vjp(g)
    for lvl, (a, b) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, err_msg=f"level {lvl}"
        )


def test_pallas_backward_bf16_accumulators(rng):
    """acc_dtype=bfloat16 (TPU.ROI_ALIGN_BWD=pallas_bf16) approximates the
    f32 gradient within bf16 rounding accumulated over per-cell RoI
    contributions — the opt-in traffic-halving mode."""
    from openset_rcnn_tpu.ops.pallas.roi_align_v2 import roi_align_pallas_v2_bwd

    sizes = [(64, 96), (32, 48), (16, 24), (8, 12)]
    C, B, R = 32, 2, 12
    strides = [4, 8, 16, 32]
    feats = [jnp.asarray(rng.randn(B, h, w, C).astype(np.float32)) for h, w in sizes]
    bj = jnp.asarray(_mixed_window_boxes(rng, B, R))
    g = jnp.asarray(rng.randn(B, R, 7, 7, C).astype(np.float32))

    ref = roi_align_pallas_v2_bwd(feats, bj, g, strides, interpret=True)
    got = roi_align_pallas_v2_bwd(
        feats, bj, g, strides, interpret=True, acc_dtype=jnp.bfloat16
    )
    for lvl, (a, b) in enumerate(zip(got, ref)):
        assert a.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b), rtol=3e-2, atol=5e-2,
            err_msg=f"level {lvl}",
        )


def test_pallas_backward_single_image(rng):
    """B=1 takes the serialized (non-pipelined) RMW path — the deferred
    write-back requires consecutive programs from different images."""
    from openset_rcnn_tpu.ops.pallas.roi_align_v2 import roi_align_pallas_v2_bwd

    sizes = [(64, 96), (32, 48), (16, 24), (8, 12)]
    C, B, R = 32, 1, 9
    strides = [4, 8, 16, 32]
    feats = [jnp.asarray(rng.randn(B, h, w, C).astype(np.float32)) for h, w in sizes]
    bj = jnp.asarray(_mixed_window_boxes(rng, B, R))
    g = jnp.asarray(rng.randn(B, R, 7, 7, C).astype(np.float32))

    got = roi_align_pallas_v2_bwd(feats, bj, g, strides, interpret=True)

    def f(fs):
        return jax.vmap(
            lambda fl, bb: _multilevel_roi_align_gather(list(fl), bb, strides)
        )(fs, bj)

    _, vjp = jax.vjp(f, tuple(feats))
    (want,) = vjp(g)
    for lvl, (a, b) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, err_msg=f"level {lvl}"
        )
