"""Golden-value tests for the open-set COCO evaluation core."""
import numpy as np

from openset_rcnn_tpu.evaluation.os_cocoeval import (
    OpenSetCocoEval,
    bbox_iou_xywh,
    greedy_match,
)


def test_bbox_iou_xywh():
    dt = np.asarray([[0, 0, 10, 10]])
    gt = np.asarray([[0, 0, 10, 10], [5, 5, 10, 10], [20, 20, 5, 5]])
    iou = bbox_iou_xywh(dt, gt, np.zeros(3))
    np.testing.assert_allclose(iou[0], [1.0, 25.0 / 175.0, 0.0], atol=1e-9)


def test_bbox_iou_crowd():
    dt = np.asarray([[0, 0, 10, 10]])
    gt = np.asarray([[0, 0, 100, 100]])
    iou = bbox_iou_xywh(dt, gt, np.asarray([1]))
    # crowd: union is the detection area -> fully inside = 1.0
    np.testing.assert_allclose(iou[0], [1.0])


def test_greedy_match_prefers_best_gt():
    # det overlaps two GT; must take the higher-IoU one
    ious = np.asarray([[0.6, 0.9]])
    dtm, dtig = greedy_match(ious, np.zeros(2, int), np.zeros(2), np.asarray([0.5]))
    assert dtm[0, 0]
    # second det can still take the other gt
    ious = np.asarray([[0.6, 0.9], [0.7, 0.8]])
    dtm, _ = greedy_match(ious, np.zeros(2, int), np.zeros(2), np.asarray([0.5]))
    assert dtm.all()  # det0 -> gt1, det1 -> gt0


def test_greedy_match_threshold():
    ious = np.asarray([[0.4]])
    dtm, _ = greedy_match(ious, np.zeros(1, int), np.zeros(1), np.asarray([0.5]))
    assert not dtm[0, 0]
    dtm, _ = greedy_match(ious, np.zeros(1, int), np.zeros(1), np.asarray([0.3]))
    assert dtm[0, 0]


def test_greedy_match_ignore_gt_flagged():
    # single ignored GT: match happens but detection inherits ignore
    ious = np.asarray([[0.9]])
    dtm, dtig = greedy_match(ious, np.ones(1, int), np.zeros(1), np.asarray([0.5]))
    assert dtm[0, 0] and dtig[0, 0]


def _anns():
    gt = [
        {"id": 1, "image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10], "area": 100},
        {"id": 2, "image_id": 1, "category_id": 1000, "bbox": [50, 50, 10, 10], "area": 100},
        {"id": 3, "image_id": 2, "category_id": 2, "bbox": [0, 0, 20, 20], "area": 400},
    ]
    dt = [
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10], "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [50, 50, 10, 10], "score": 0.8},
        {"image_id": 2, "category_id": 2, "bbox": [0, 0, 20, 20], "score": 0.7},
        {"image_id": 1, "category_id": 1000, "bbox": [50, 50, 10, 10], "score": 0.6},
    ]
    return gt, dt


def test_open_set_coco_golden():
    gt, dt = _anns()
    ev = OpenSetCocoEval(
        gt_anns=gt, dt_anns=dt, image_ids=[1, 2], known_cat_ids=[1, 2], unknown_id=1000
    )
    acc = ev.run()
    stats = ev.summarize(acc)
    assert abs(stats[0] - 1.0) < 1e-9   # known AP = 1
    assert abs(stats[1] - 1.0) < 1e-9   # AP50
    assert abs(stats[16] - 1.0) < 1e-9  # unknown AP = 1
    assert stats[15] == 1.0             # AOSE: one known det on unknown GT
    assert stats[14] == 0.0             # WI at recall .8 (fp_os at idx 0 is 0)
    # small-area AP valid, large-area AP absent (-1)
    assert abs(stats[3] - 1.0) < 1e-9
    assert stats[5] == -1.0


def test_open_set_coco_misclassified_unknown():
    """A known det covering unknown GT raises AOSE and WI."""
    gt = [
        {"id": 1, "image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10], "area": 100},
        {"id": 2, "image_id": 1, "category_id": 1000, "bbox": [50, 50, 10, 10], "area": 100},
    ]
    dt = [
        # only detection is a known det on the unknown GT -> FP + open-set FP
        {"image_id": 1, "category_id": 1, "bbox": [50, 50, 10, 10], "score": 0.9},
    ]
    ev = OpenSetCocoEval(
        gt_anns=gt, dt_anns=dt, image_ids=[1], known_cat_ids=[1], unknown_id=1000
    )
    stats = ev.summarize()
    assert stats[15] == 1.0  # AOSE
    assert stats[0] == 0.0   # known AP = 0
    # recall never reached 0.8 -> index clamps to the only det: fp_os=1, tp_fp=1
    assert abs(stats[14] - 1.0) < 1e-9


def test_unknown_recall_counts():
    gt = [
        {"id": 1, "image_id": 1, "category_id": 1000, "bbox": [0, 0, 10, 10], "area": 100},
        {"id": 2, "image_id": 1, "category_id": 1000, "bbox": [50, 50, 10, 10], "area": 100},
    ]
    dt = [{"image_id": 1, "category_id": 1000, "bbox": [0, 0, 10, 10], "score": 0.9}]
    ev = OpenSetCocoEval(
        gt_anns=gt, dt_anns=dt, image_ids=[1], known_cat_ids=[1], unknown_id=1000
    )
    stats = ev.summarize()
    assert abs(stats[26] - 0.5) < 1e-9  # unknown AR@100 = 0.5
