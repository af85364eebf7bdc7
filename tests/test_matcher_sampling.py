"""Matcher dual-threshold semantics + balanced sampling invariants."""
import jax
import jax.numpy as jnp
import numpy as np

from openset_rcnn_tpu.ops import match, sample_balanced_indices, subsample_labels


def test_matcher_thresholds():
    # 2 GT x 5 anchors
    iou = jnp.asarray(
        [
            [0.80, 0.25, 0.05, 0.65, 0.0],
            [0.10, 0.35, 0.02, 0.33, 0.0],
        ]
    )
    gt_valid = jnp.asarray([True, True])
    res = match(iou, gt_valid, [0.3, 0.7], [0, -1, 1], allow_low_quality_matches=False)
    # anchor0: best 0.8 -> 1; anchor1: best 0.35 -> -1 (ignore band);
    # anchor2: best 0.05 -> 0; anchor3: best 0.65 -> -1; anchor4: 0 -> 0
    np.testing.assert_array_equal(np.asarray(res.labels), [1, -1, 0, -1, 0])
    np.testing.assert_array_equal(np.asarray(res.matched_idx), [0, 1, 0, 0, 0])


def test_matcher_low_quality_rescue():
    iou = jnp.asarray(
        [
            [0.80, 0.25, 0.05, 0.65, 0.0],
            [0.10, 0.20, 0.02, 0.15, 0.0],
        ]
    )
    gt_valid = jnp.asarray([True, True])
    res = match(iou, gt_valid, [0.3, 0.7], [0, -1, 1], allow_low_quality_matches=True)
    # GT1's best anchor is anchor1 (0.20): rescued to positive.
    np.testing.assert_array_equal(np.asarray(res.labels), [1, 1, 0, -1, 0])


def test_matcher_objectness_band():
    iou = jnp.asarray([[0.05, 0.15, 0.35, 0.95]])
    res = match(iou, jnp.asarray([True]), [0.1, 0.3], [0, -1, 1], False)
    np.testing.assert_array_equal(np.asarray(res.labels), [0, -1, 1, 1])


def test_matcher_empty_gt():
    iou = jnp.zeros((3, 6))
    res = match(iou, jnp.zeros((3,), bool), [0.3, 0.7], [0, -1, 1], True)
    np.testing.assert_array_equal(np.asarray(res.labels), np.zeros(6))


def test_matcher_padded_gt_cannot_win():
    iou = jnp.asarray([[0.1, 0.1], [0.9, 0.9]])
    res = match(iou, jnp.asarray([True, False]), [0.3, 0.7], [0, -1, 1], False)
    # Padded row 1 has IoU 0.9 but is invalid; labels from row 0 only.
    np.testing.assert_array_equal(np.asarray(res.labels), [0, 0])
    np.testing.assert_array_equal(np.asarray(res.matched_idx), [0, 0])


def test_subsample_counts():
    key = jax.random.PRNGKey(0)
    labels = jnp.asarray([1] * 300 + [0] * 500 + [-1] * 100)
    out = np.asarray(subsample_labels(labels, 256, 0.5, key))
    assert (out == 1).sum() == 128
    assert (out == 0).sum() == 128
    # sampled positives must come from original positives
    assert np.all(np.where(out == 1)[0] < 300)


def test_subsample_scarce_positives():
    key = jax.random.PRNGKey(1)
    labels = jnp.asarray([1] * 10 + [0] * 500)
    out = np.asarray(subsample_labels(labels, 256, 0.5, key))
    assert (out == 1).sum() == 10
    assert (out == 0).sum() == 246


def test_subsample_full_positive_fraction():
    # objectness sampler uses positive_fraction=1.0 (config.py:16)
    key = jax.random.PRNGKey(2)
    labels = jnp.asarray([1] * 100 + [0] * 500)
    out = np.asarray(subsample_labels(labels, 256, 1.0, key))
    assert (out == 1).sum() == 100
    assert (out == 0).sum() == 156


def test_sample_balanced_indices():
    key = jax.random.PRNGKey(3)
    pos = jnp.asarray([True] * 50 + [False] * 950)
    neg = jnp.asarray([False] * 50 + [True] * 900 + [False] * 50)
    s = sample_balanced_indices(pos, neg, 512, 0.25, key)
    idx = np.asarray(s.indices)
    assert idx.shape == (512,)
    assert np.asarray(s.valid).all()
    assert np.asarray(s.is_pos).sum() == 50  # min(50, 128)
    assert np.all(idx[np.asarray(s.is_pos)] < 50)
    assert len(np.unique(idx)) == 512  # no repeats


def test_sample_balanced_underfull():
    key = jax.random.PRNGKey(4)
    pos = jnp.asarray([True] * 3 + [False] * 97)
    neg = jnp.asarray([False] * 3 + [True] * 20 + [False] * 77)
    s = sample_balanced_indices(pos, neg, 512, 0.25, key)
    assert np.asarray(s.valid).sum() == 23


def test_pln_denominator_matches_numel():
    """The PLN loss denominator (sum of valid sampled slots,
    roi_heads.py pln_loss) must equal the reference's gt_classes.numel()
    — the number of proposals d2's subsample_labels actually returns
    (prototype_learning_network.py:187) — on GT-sparse images where both
    fall short of the 512-slot budget."""
    from openset_rcnn_tpu.models.roi_heads import label_and_sample_proposals
    from openset_rcnn_tpu.structures import GroundTruth, Proposals

    key = jax.random.PRNGKey(7)
    B, P, G, S = 2, 40, 4, 32
    rng = np.random.RandomState(0)
    xy = rng.uniform(0, 200, (B, P, 2)).astype(np.float32)
    wh = rng.uniform(10, 60, (B, P, 2)).astype(np.float32)
    pboxes = np.concatenate([xy, xy + wh], -1)
    pvalid = np.zeros((B, P), bool)
    pvalid[0, :10] = True   # GT-sparse image: only 10 usable proposals
    pvalid[1, :] = True
    gboxes = np.zeros((B, G, 4), np.float32)
    gboxes[:, 0] = [20, 20, 80, 80]
    gvalid = np.zeros((B, G), bool)
    gvalid[:, 0] = True

    rois = label_and_sample_proposals(
        Proposals(jnp.asarray(pboxes), jnp.ones((B, P)), jnp.asarray(pvalid)),
        GroundTruth(jnp.asarray(gboxes), jnp.zeros((B, G), jnp.int32), jnp.asarray(gvalid)),
        key, num_samples=S, positive_fraction=0.25, iou_threshold=0.5, num_classes=3,
    )
    valid = np.asarray(rois.valid)
    # reference numel per image = num_pos + num_neg where each pool is the
    # candidate count (proposals + appended valid GT), capped like d2
    for b in range(B):
        n_cand = int(pvalid[b].sum()) + int(gvalid[b].sum())
        assert valid[b].sum() == min(S, n_cand), (b, valid[b].sum(), n_cand)
