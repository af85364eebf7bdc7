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


def test_pallas_backward_matches_gather_vjp(rng):
    """The window-RMW backward kernel equals the gather formulation's
    scatter-add gradient (boxes chosen below the level-bump aspect bound,
    where forward pallas == forward gather)."""
    from openset_rcnn_tpu.ops.pallas.roi_align_v2 import roi_align_pallas_v2_bwd

    sizes = [(64, 96), (32, 48), (16, 24), (8, 12)]
    C, B, R = 32, 2, 12
    strides = [4, 8, 16, 32]
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
