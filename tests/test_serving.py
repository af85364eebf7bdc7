"""Fused on-device cascade vs the host-side reference cascade."""
import jax.numpy as jnp
import numpy as np

from openset_rcnn_tpu.evaluation.postprocess import PostprocessConfig, postprocess_image
from openset_rcnn_tpu.models.serving import fused_cascade
from openset_rcnn_tpu.structures import RawDetections


def make_raw(rng, B=2, P=64, K=3):
    xy = rng.uniform(0, 300, (B, P, 2))
    wh = rng.uniform(20, 120, (B, P, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    obj = rng.uniform(0, 1, (B, P)).astype(np.float32)
    md = rng.uniform(0, 1, (B, P)).astype(np.float32)
    logits = rng.randn(B, P, K + 1).astype(np.float32) * 2
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    valid = rng.rand(B, P) > 0.1
    return RawDetections(
        boxes=jnp.asarray(boxes),
        objectness=jnp.asarray(obj),
        pred_iou=jnp.asarray(obj),
        centerness=jnp.asarray(obj),
        min_dist=jnp.asarray(md),
        pln_class=jnp.zeros((B, P), jnp.int32),
        known_probs=jnp.asarray(probs),
        valid=jnp.asarray(valid),
    )


def as_set(boxes, scores, classes):
    return {
        (round(float(b[0]), 2), round(float(b[1]), 2), int(c), round(float(s), 4))
        for b, s, c in zip(boxes, scores, classes)
    }


def test_fused_finalize_matches_host_full_path(rng):
    """The do_test fused route (device cascade + host finalize_serve_image)
    must equal the exact host cascade including the rescale to original
    coordinates and the GraspNet known-idx -> contiguous-id remap."""
    from openset_rcnn_tpu.evaluation.postprocess import finalize_serve_image

    raw = make_raw(rng)
    table = np.asarray([5, 9, 17])  # 3 known classes -> contiguous dataset ids
    kw = dict(
        unk_thr=0.5, known_score_thresh=0.05, known_nms_thresh=0.5,
        known_topk=50, unknown_score_thresh=0.0, unknown_nms_thresh=0.5,
        unknown_topk=50, unknown_id=1000,
    )
    cfg = PostprocessConfig(
        obj_score_thresh=0.05, detections_per_image=1000,
        class_id_table=table, **kw,
    )
    fused = fused_cascade(
        raw, obj_thresh=0.05, stage1_topk=64, max_known_candidates=192, **kw
    )
    input_hw, output_hw = (400, 400), (250, 330)
    for i in range(raw.boxes.shape[0]):
        host = postprocess_image(
            np.asarray(raw.boxes[i]), np.asarray(raw.objectness[i]),
            np.asarray(raw.min_dist[i]), np.asarray(raw.pln_class[i]),
            np.asarray(raw.known_probs[i]), np.asarray(raw.valid[i]),
            input_hw, output_hw, cfg,
        )
        fin = finalize_serve_image(
            np.asarray(fused.boxes[i]), np.asarray(fused.scores[i]),
            np.asarray(fused.classes[i]), np.asarray(fused.valid[i]),
            input_hw, output_hw, cfg,
        )
        got = as_set(fin.boxes, fin.scores, fin.classes)
        want = as_set(host.boxes, host.scores, host.classes)
        assert got == want, f"image {i}\nonly-fused: {got - want}\nonly-host: {want - got}"


def test_fused_matches_host_cascade(rng):
    raw = make_raw(rng)
    cfg = PostprocessConfig(
        obj_score_thresh=0.05, unk_thr=0.5, known_score_thresh=0.05,
        known_nms_thresh=0.5, known_topk=50, unknown_score_thresh=0.0,
        unknown_nms_thresh=0.5, unknown_topk=50, unknown_id=80,
        detections_per_image=1000,
    )
    fused = fused_cascade(
        raw, obj_thresh=0.05, unk_thr=0.5, known_score_thresh=0.05,
        known_nms_thresh=0.5, known_topk=50, unknown_score_thresh=0.0,
        unknown_nms_thresh=0.5, unknown_topk=50, unknown_id=80,
        stage1_topk=64, max_known_candidates=192,
    )
    B = raw.boxes.shape[0]
    for i in range(B):
        host = postprocess_image(
            np.asarray(raw.boxes[i]), np.asarray(raw.objectness[i]),
            np.asarray(raw.min_dist[i]), np.asarray(raw.pln_class[i]),
            np.asarray(raw.known_probs[i]), np.asarray(raw.valid[i]),
            (400, 400), (400, 400), cfg,
        )
        v = np.asarray(fused.valid[i])
        got = as_set(np.asarray(fused.boxes[i])[v], np.asarray(fused.scores[i])[v],
                     np.asarray(fused.classes[i])[v])
        want = as_set(host.boxes, host.scores, host.classes)
        assert got == want, f"image {i}: fused != host\nonly-fused: {got - want}\nonly-host: {want - got}"


def test_fused_overflow_counted_and_parity_at_boundary(rng):
    """The fused cascade's static candidate slot is a deviation from the
    reference, which keeps ALL (box, class) pairs above the score threshold
    (softmax_classifier.py:47-104). When candidates exceed the cap the
    truncation must be VISIBLE (known_overflow > 0), and with a sufficient
    cap the fused path must still equal the host cascade exactly."""
    B, P, K = 2, 64, 20
    xy = rng.uniform(0, 300, (B, P, 2))
    wh = rng.uniform(20, 120, (B, P, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    obj = rng.uniform(0.2, 1, (B, P)).astype(np.float32)
    probs = np.full((B, P, K + 1), 1.0 / (K + 1), np.float32)  # every pair passes 0.01
    raw = RawDetections(
        boxes=jnp.asarray(boxes), objectness=jnp.asarray(obj),
        pred_iou=jnp.asarray(obj), centerness=jnp.asarray(obj),
        min_dist=jnp.zeros((B, P), jnp.float32),     # nothing unknown
        pln_class=jnp.zeros((B, P), jnp.int32),
        known_probs=jnp.asarray(probs),
        valid=jnp.ones((B, P), bool),
    )
    kw = dict(
        obj_thresh=0.05, unk_thr=0.5, known_score_thresh=0.01,
        known_nms_thresh=0.5, known_topk=50, unknown_score_thresh=0.0,
        unknown_nms_thresh=0.5, unknown_topk=50, unknown_id=80,
        stage1_topk=64,
    )
    n_cand = P * K  # 1280 pairs above threshold per image

    # cap below the candidate count: overflow must be counted exactly
    capped = fused_cascade(raw, max_known_candidates=256, **kw)
    assert np.asarray(capped.known_overflow).tolist() == [n_cand - 256] * B

    # cap at/above the candidate count: zero overflow AND host parity
    full = fused_cascade(raw, max_known_candidates=n_cand, **kw)
    assert np.asarray(full.known_overflow).tolist() == [0] * B
    cfg = PostprocessConfig(
        obj_score_thresh=0.05, unk_thr=0.5, known_score_thresh=0.01,
        known_nms_thresh=0.5, known_topk=50, unknown_score_thresh=0.0,
        unknown_nms_thresh=0.5, unknown_topk=50, unknown_id=80,
        detections_per_image=1000,
    )
    for i in range(B):
        host = postprocess_image(
            boxes[i], obj[i], np.zeros(P, np.float32), np.zeros(P, np.int64),
            probs[i], np.ones(P, bool), (400, 400), (400, 400), cfg,
        )
        v = np.asarray(full.valid[i])
        got = as_set(np.asarray(full.boxes[i])[v], np.asarray(full.scores[i])[v],
                     np.asarray(full.classes[i])[v])
        want = as_set(host.boxes, host.scores, host.classes)
        assert got == want, f"image {i}\nonly-fused: {got - want}\nonly-host: {want - got}"
