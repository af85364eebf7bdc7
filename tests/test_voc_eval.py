"""Golden-value tests for the open-set VOC evaluator (SURVEY.md §4 item 2)."""
import numpy as np

from openset_rcnn_tpu.evaluation.voc_eval import OpensetVocEvaluator, voc_ap, voc_overlaps


def shift(b):
    """Detections enter the evaluator in loader coordinates (x1-1, y1-1, x2, y2);
    the evaluator adds the +1 back (reference process(), :64-67)."""
    b = np.asarray(b, np.float64).copy()
    b[:, 0] -= 1.0
    b[:, 1] -= 1.0
    return b


def make_evaluator():
    ev = OpensetVocEvaluator(["cat", "dog", "unknown"], num_known_classes=2)
    ev.add_ground_truth(
        "img1",
        boxes=[[0, 0, 10, 10], [20, 20, 30, 30], [50, 50, 60, 60]],
        class_names=["cat", "dog", "zebra"],  # zebra -> unknown
        difficult=[False, False, False],
    )
    ev.add_ground_truth(
        "img2",
        boxes=[[0, 0, 10, 10], [30, 30, 40, 40]],
        class_names=["cat", "bird"],  # bird -> unknown
        difficult=[True, False],
    )
    return ev


def test_voc_ap_all_points():
    rec = np.asarray([0.5, 1.0])
    prec = np.asarray([1.0, 0.5])
    # envelope: p=1 up to r=0.5, then 0.5 to r=1
    assert abs(voc_ap(rec, prec) - 0.75) < 1e-9


def test_overlap_plus_one_convention():
    ov = voc_overlaps(np.asarray([[0.0, 0.0, 10.0, 10.0]]), np.asarray([0.0, 0.0, 10.0, 10.0]))
    assert abs(ov[0] - 1.0) < 1e-9
    # [0,0,4,4] vs [0,0,9,9] with +1 extents: 25/100
    ov = voc_overlaps(np.asarray([[0.0, 0.0, 9.0, 9.0]]), np.asarray([0.0, 0.0, 4.0, 4.0]))
    assert abs(ov[0] - 0.25) < 1e-9


def test_open_set_metrics_golden():
    ev = make_evaluator()
    # cat: TP on img1, difficult-match on img2 (ignored), unknown-overlap FP on img1
    ev.process("img1", shift([[0, 0, 10, 10]]), np.asarray([0.9]), np.asarray([0]))
    ev.process("img2", shift([[0, 0, 10, 10]]), np.asarray([0.8]), np.asarray([0]))
    ev.process("img1", shift([[50, 50, 60, 60]]), np.asarray([0.7]), np.asarray([0]))
    # dog: TP on img1
    ev.process("img1", shift([[20, 20, 30, 30]]), np.asarray([0.6]), np.asarray([1]))
    # unknown (class id 2): TP on img1; misses img2's unknown
    ev.process("img1", shift([[50, 50, 60, 60]]), np.asarray([0.5]), np.asarray([2]))

    res = ev.evaluate()
    assert res["AP@K"] == 100.0
    assert res["AOSE"] == 1.0
    assert res["AP@U"] == 50.0
    assert res["R@U"] == 50.0
    assert res["WI"] == 0.0
    # R@K: cat recall 1.0, dog recall 1.0
    assert res["R@K"] == 100.0


def test_duplicate_detection_is_fp():
    ev = make_evaluator()
    ev.process("img1", shift([[0, 0, 10, 10]]), np.asarray([0.9]), np.asarray([0]))
    ev.process("img1", shift([[0, 0, 10, 10]]), np.asarray([0.8]), np.asarray([0]))
    res = ev.evaluate()
    # second det of same GT is FP -> precision falls to 0.5 at rank 2, AP still 1
    assert res["AP@K"] == 50.0  # cat AP 1.0, dog AP 0 (no dets) -> mean 50


def test_wi_counts_unknown_overlap():
    ev = make_evaluator()
    # Single cat det that lands on the unknown GT -> FP + is_unk
    ev.process("img1", shift([[50, 50, 60, 60]]), np.asarray([0.9]), np.asarray([0]))
    res = ev.evaluate()
    assert res["AOSE"] == 1.0
    # recall stays 0 -> closest index is the only det: WI = (1/1) * 100... but
    # mean over classes with dets: only cat -> fp=1, tp_fp=1
    assert res["WI"] == 100.0


def test_unknown_detections_by_last_class_id_are_scored():
    """Detections arriving with class id == num_classes-1 (the OpenDet
    unknown id, PostprocessConfig.from_cfg) must score as the 'unknown'
    class — a det id outside the class-name table is silently unscored,
    which is exactly the failure mode of hardcoding 80 on small class sets."""
    ev = make_evaluator()
    # perfect hits on both unknown GT boxes, delivered via process() with
    # the contiguous unknown id (2 for this 3-name table)
    ev.process("img1", shift([[50, 50, 60, 60]]), np.asarray([0.9]), np.asarray([2]))
    ev.process("img2", shift([[30, 30, 40, 40]]), np.asarray([0.8]), np.asarray([2]))
    res = ev.evaluate()
    assert res["R@U"] == 100.0
    assert res["AP@U"] == 100.0
    # a det with an out-of-table id must not crash and must not score
    ev2 = make_evaluator()
    ev2.process("img1", shift([[50, 50, 60, 60]]), np.asarray([0.9]), np.asarray([80]))
    res2 = ev2.evaluate()
    assert res2["AP@U"] == 0.0


def test_resume_rescoring_matches_original(tmp_path):
    """--resume_test on the VOC path: a fresh evaluator with the same GT
    reloads the per-class detection files and reproduces the metrics
    exactly (the reference only supports this on the COCO path,
    os_coco_evaluation.py:177-184; its train.py:283-284 asserts the VOC
    combination away — we support it)."""

    def with_gt():
        ev = OpensetVocEvaluator(
            ["cat", "dog", "unknown"], num_known_classes=2, output_dir=str(tmp_path)
        )
        ev.add_ground_truth(
            "img1",
            boxes=[[0, 0, 10, 10], [20, 20, 30, 30], [50, 50, 60, 60]],
            class_names=["cat", "dog", "zebra"],
            difficult=[False, False, False],
        )
        return ev

    ev = with_gt()
    ev.process("img1", shift([[0, 0, 10, 10]]), np.asarray([0.9]), np.asarray([0]))
    ev.process("img1", shift([[20, 20, 30, 30]]), np.asarray([0.6]), np.asarray([1]))
    ev.process("img1", shift([[50, 50, 60, 60]]), np.asarray([0.5]), np.asarray([2]))
    first = ev.evaluate()

    resumed = with_gt().evaluate(resume=True)
    assert resumed == first

    # missing artifacts -> clear error, not a silent zero score
    import pytest

    empty = OpensetVocEvaluator(["cat", "unknown"], 1, output_dir=str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError):
        empty.evaluate(resume=True)
