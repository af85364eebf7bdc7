"""Host cascade tests: 3-stage filtering mirrors the reference exactly."""
import numpy as np

from openset_rcnn_tpu.evaluation.postprocess import (
    PostprocessConfig,
    batched_numpy_nms,
    numpy_nms,
    postprocess_image,
)


def test_numpy_nms_basic():
    boxes = np.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float64)
    scores = np.asarray([0.9, 0.8, 0.7])
    keep = numpy_nms(boxes, scores, 0.5)
    assert keep.tolist() == [0, 2]


def test_numpy_nms_thresh_one_noop():
    boxes = np.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], np.float64)
    keep = numpy_nms(boxes, np.asarray([0.9, 0.8]), 1.0)
    assert len(keep) == 2  # IoU == 1.0 is NOT > 1.0


def make_raw(P=8, K=3):
    boxes = np.tile(np.asarray([[10.0, 10.0, 50.0, 50.0]]), (P, 1))
    boxes += np.arange(P)[:, None] * 30.0  # spread apart -> no NMS overlap
    objectness = np.linspace(0.9, 0.2, P)
    min_dist = np.full(P, 0.1)
    pln_class = np.zeros(P, np.int64)
    probs = np.zeros((P, K + 1))
    probs[:, 0] = 0.8  # all confidently class 0
    probs[:, K] = 0.2
    valid = np.ones(P, bool)
    return boxes, objectness, min_dist, pln_class, probs, valid


def test_cascade_known_only():
    boxes, obj, md, pc, probs, valid = make_raw()
    cfg = PostprocessConfig(unk_thr=0.5, known_topk=50, detections_per_image=1000, unknown_id=80)
    out = postprocess_image(boxes, obj, md, pc, probs, valid, (400, 400), (400, 400), cfg)
    assert len(out.boxes) == 8
    assert (out.classes == 0).all()
    np.testing.assert_allclose(out.scores, 0.8)


def test_cascade_unknown_split():
    boxes, obj, md, pc, probs, valid = make_raw()
    md[:4] = 0.9  # first 4 are far from every prototype -> unknown
    cfg = PostprocessConfig(unk_thr=0.5, unknown_id=80)
    out = postprocess_image(boxes, obj, md, pc, probs, valid, (400, 400), (400, 400), cfg)
    assert (out.classes == 80).sum() == 4
    assert (out.classes == 0).sum() == 4
    # unknown detections carry the objectness score
    unk_scores = out.scores[out.classes == 80]
    np.testing.assert_allclose(sorted(unk_scores, reverse=True), obj[:4], atol=1e-6)


def test_objectness_threshold_drops():
    boxes, obj, md, pc, probs, valid = make_raw()
    obj[:] = 0.01  # below 0.05
    cfg = PostprocessConfig()
    out = postprocess_image(boxes, obj, md, pc, probs, valid, (400, 400), (400, 400), cfg)
    assert len(out.boxes) == 0


def test_invalid_rows_dropped():
    boxes, obj, md, pc, probs, valid = make_raw()
    valid[:] = False
    out = postprocess_image(boxes, obj, md, pc, probs, valid, (400, 400), (400, 400), PostprocessConfig())
    assert len(out.boxes) == 0


def test_rescale_to_original():
    boxes, obj, md, pc, probs, valid = make_raw(P=1)
    cfg = PostprocessConfig(unk_thr=0.5)
    out = postprocess_image(boxes, obj, md, pc, probs, valid, (400, 400), (800, 200), cfg)
    # height x2, width /2
    np.testing.assert_allclose(out.boxes[0], [5.0, 20.0, 25.0, 100.0])


def test_class_id_table_applied():
    boxes, obj, md, pc, probs, valid = make_raw()
    table = np.asarray([7, 9, 11])
    cfg = PostprocessConfig(unk_thr=0.5, class_id_table=table, unknown_id=1000)
    out = postprocess_image(boxes, obj, md, pc, probs, valid, (400, 400), (400, 400), cfg)
    assert (out.classes == 7).all()  # known index 0 -> contiguous id 7


def test_from_cfg_unknown_id_tracks_num_classes():
    """OpenDet unknown id = NUM_CLASSES-1 (the reference hardcodes 80 only
    because it always runs 81 classes, prototype_learning_network.py:219-223);
    a smaller class set (e.g. synthetic validation) must map its last class."""
    from openset_rcnn_tpu.config import get_default_cfg

    cfg = get_default_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    assert PostprocessConfig.from_cfg(cfg, True).unknown_id == 3
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 81
    assert PostprocessConfig.from_cfg(cfg, True).unknown_id == 80
    assert PostprocessConfig.from_cfg(cfg, False).unknown_id == 1000
