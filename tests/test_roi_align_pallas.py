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
    """Boxes spanning BOTH v2 window classes: the first half are ordinary
    aspect-0.6..1.8 RoIs (32x40 class); the second half sit at level 0 with
    x-extent ~33..47 cells — above the small window, below the level-bump
    bound (MAX_EXTENT=50), so pallas == gather still holds."""
    n_small = R // 2
    ar = rng.uniform(0.6, 1.8, (B, n_small))
    area = rng.uniform(10**2, 150**2, (B, n_small))
    w = np.sqrt(area * ar)
    h = np.sqrt(area / ar)
    n_wide = R - n_small
    w2 = rng.uniform(135, 190, (B, n_wide))  # stride 4 -> extent 33..47
    h2 = rng.uniform(40, 70, (B, n_wide))    # keeps sqrt(area) < 112 (level 0)
    w = np.concatenate([w, w2], 1)
    h = np.concatenate([h, h2], 1)
    cx = rng.uniform(0, 384, (B, R))
    cy = rng.uniform(0, 256, (B, R))
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

    # the box distribution must exercise the smallest AND largest window
    # classes (each RoI is assigned exactly one class id)
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
    assert counts[0] > 0 and counts[-1] > 0, counts
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
