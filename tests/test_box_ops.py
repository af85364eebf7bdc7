"""Oracle tests for box ops against plain numpy implementations."""
import numpy as np
import jax.numpy as jnp
import pytest

from openset_rcnn_tpu.ops import (
    Box2BoxTransform,
    Box2BoxTransformLinear,
    box_area,
    clip_boxes,
    elementwise_iou,
    nonempty,
    pairwise_iou,
)


def random_boxes(rng, n, size=200.0):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 2, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def numpy_iou(b1, b2):
    out = np.zeros((len(b1), len(b2)), np.float32)
    for i, a in enumerate(b1):
        for j, b in enumerate(b2):
            ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
            iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
            inter = ix * iy
            union = (
                (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
            )
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def test_pairwise_iou_matches_numpy(rng):
    b1 = random_boxes(rng, 13)
    b2 = random_boxes(rng, 17)
    got = np.asarray(pairwise_iou(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, numpy_iou(b1, b2), atol=1e-5)


def test_elementwise_iou_diag(rng):
    b1 = random_boxes(rng, 9)
    b2 = random_boxes(rng, 9)
    got = np.asarray(elementwise_iou(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, np.diag(numpy_iou(b1, b2)), atol=1e-5)


def test_iou_identity(rng):
    b = random_boxes(rng, 5)
    np.testing.assert_allclose(
        np.asarray(elementwise_iou(jnp.asarray(b), jnp.asarray(b))), 1.0, atol=1e-6
    )


def test_clip_and_nonempty():
    boxes = jnp.asarray([[-10.0, -5.0, 50.0, 60.0], [90.0, 90.0, 120.0, 130.0], [5, 5, 5, 9]])
    clipped = clip_boxes(boxes, (100, 100))
    np.testing.assert_allclose(
        np.asarray(clipped), [[0, 0, 50, 60], [90, 90, 100, 100], [5, 5, 5, 9]]
    )
    np.testing.assert_array_equal(np.asarray(nonempty(clipped)), [True, True, False])


def test_box_area():
    assert float(box_area(jnp.asarray([0.0, 0.0, 4.0, 5.0]))) == 20.0


def test_xywh_delta_roundtrip(rng):
    t = Box2BoxTransform((10.0, 10.0, 5.0, 5.0))
    src = random_boxes(rng, 20)
    dst = random_boxes(rng, 20)
    deltas = t.get_deltas(jnp.asarray(src), jnp.asarray(dst))
    rec = t.apply_deltas(deltas, jnp.asarray(src))
    np.testing.assert_allclose(np.asarray(rec), dst, rtol=1e-4, atol=1e-3)


def test_linear_delta_roundtrip(rng):
    t = Box2BoxTransformLinear(normalize_by_size=True)
    src = random_boxes(rng, 20)
    dst = src.copy()
    # Targets must contain the source center for l,t,r,b >= 0: grow each box.
    dst[:, :2] -= rng.uniform(0, 10, (20, 2)).astype(np.float32)
    dst[:, 2:] += rng.uniform(0, 10, (20, 2)).astype(np.float32)
    deltas = t.get_deltas(jnp.asarray(src), jnp.asarray(dst))
    rec = t.apply_deltas(deltas, jnp.asarray(src))
    np.testing.assert_allclose(np.asarray(rec), dst, rtol=1e-4, atol=1e-3)


def test_linear_delta_known_values():
    # anchor centered at (50, 50), size 20x20; target box [30, 40, 70, 80]
    t = Box2BoxTransformLinear(normalize_by_size=True)
    src = jnp.asarray([[40.0, 40.0, 60.0, 60.0]])
    dst = jnp.asarray([[30.0, 40.0, 70.0, 80.0]])
    d = np.asarray(t.get_deltas(src, dst))[0]
    # (l, t, r, b) / (w, h, w, h) = (20, 10, 20, 30) / 20
    np.testing.assert_allclose(d, [1.0, 0.5, 1.0, 1.5], atol=1e-6)
