"""Masked NMS vs a numpy greedy oracle."""
import jax.numpy as jnp
import numpy as np

from openset_rcnn_tpu.ops import batched_nms_mask, nms_mask, nms_select


def numpy_nms(boxes, scores, thresh):
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            ix = max(0.0, min(boxes[i, 2], boxes[j, 2]) - max(boxes[i, 0], boxes[j, 0]))
            iy = max(0.0, min(boxes[i, 3], boxes[j, 3]) - max(boxes[i, 1], boxes[j, 1]))
            inter = ix * iy
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            union = a + b - inter
            iou = inter / union if union > 0 else 0.0
            if iou > thresh:
                suppressed[j] = True
    return sorted(keep)


def random_boxes(rng, n):
    xy = rng.uniform(0, 80, (n, 2))
    wh = rng.uniform(5, 40, (n, 2))
    return np.concatenate([xy, xy + wh], 1).astype(np.float32)


def kept_original_indices(res):
    order = np.asarray(res.order)
    keep = np.asarray(res.keep)
    return sorted(order[keep].tolist())


def test_nms_matches_oracle(rng):
    for trial in range(5):
        boxes = random_boxes(rng, 64)
        scores = rng.uniform(0, 1, 64).astype(np.float32)
        res = nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(64, bool), 0.5)
        assert kept_original_indices(res) == numpy_nms(boxes, scores, 0.5)


def test_nms_threshold_one_is_noop(rng):
    # NMS_THRESH_TEST = 1.0 must keep everything (osrcnn_fast_rcnn.py:135).
    boxes = random_boxes(rng, 32)
    scores = rng.uniform(0, 1, 32).astype(np.float32)
    res = nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(32, bool), 1.0)
    assert np.asarray(res.keep).sum() == 32


def test_nms_invalid_never_kept(rng):
    boxes = random_boxes(rng, 16)
    scores = rng.uniform(0, 1, 16).astype(np.float32)
    valid = np.ones(16, bool)
    valid[::2] = False
    res = nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5)
    kept = np.asarray(res.order)[np.asarray(res.keep)]
    assert np.all(valid[kept])


def test_batched_nms_isolates_classes():
    boxes = np.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    scores = np.asarray([0.9, 0.8], np.float32)
    # Same box, different class: both kept.
    res = batched_nms_mask(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray([0, 1]), jnp.ones(2, bool), 0.5
    )
    assert np.asarray(res.keep).sum() == 2
    # Same class: one suppressed.
    res = batched_nms_mask(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray([3, 3]), jnp.ones(2, bool), 0.5
    )
    assert np.asarray(res.keep).sum() == 1


def test_nms_select_topk(rng):
    boxes = random_boxes(rng, 40)
    scores = rng.uniform(0, 1, 40).astype(np.float32)
    b, s, v = nms_select(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(40, bool), 0.5, 5)
    oracle = numpy_nms(boxes, scores, 0.5)
    n_expect = min(5, len(oracle))
    assert np.asarray(v).sum() == n_expect
    # survivors are in descending score order
    sv = np.asarray(s)[np.asarray(v)]
    assert np.all(np.diff(sv) <= 1e-6)
