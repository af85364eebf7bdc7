"""Proposal-AR evaluator golden tests."""
import numpy as np

from openset_rcnn_tpu.evaluation.proposals import evaluate_box_proposals


def test_perfect_recall():
    gt = {1: np.asarray([[0, 0, 50, 50], [100, 100, 200, 200]], float)}
    props = [{"image_id": 1,
              "boxes": np.asarray([[0, 0, 50, 50], [100, 100, 200, 200]], float),
              "scores": np.asarray([0.9, 0.8])}]
    res = evaluate_box_proposals(props, gt, limits=(100,), areas=("all",))
    assert res["AR@100"] == 100.0


def test_partial_recall():
    gt = {1: np.asarray([[0, 0, 100, 100], [300, 300, 400, 400]], float)}
    props = [{"image_id": 1,
              "boxes": np.asarray([[0, 0, 100, 100]], float),
              "scores": np.asarray([0.9])}]
    res = evaluate_box_proposals(props, gt, limits=(100,), areas=("all",))
    assert res["AR@100"] == 50.0


def test_limit_truncates():
    # best proposal ranked below the limit -> not counted
    gt = {1: np.asarray([[0, 0, 100, 100]], float)}
    props = [{"image_id": 1,
              "boxes": np.asarray([[500, 500, 600, 600], [0, 0, 100, 100]], float),
              "scores": np.asarray([0.9, 0.8])}]
    res = evaluate_box_proposals(props, gt, limits=(1, 100), areas=("all",))
    assert res["AR@1"] == 0.0
    assert res["AR@100"] == 100.0


def test_iou_threshold_sweep():
    # proposal with IoU 0.7 vs gt: counts for thresholds 0.5..0.7 (5 of 10)
    gt = {1: np.asarray([[0.0, 0.0, 100.0, 100.0]])}
    props = [{"image_id": 1,
              "boxes": np.asarray([[0.0, 0.0, 100.0, 70.0 / 0.7 * 0.7]]),  # iou .7 via height 70
              "scores": np.asarray([0.9])}]
    props[0]["boxes"] = np.asarray([[0.0, 0.0, 100.0, 70.0]])
    res = evaluate_box_proposals(props, gt, limits=(100,), areas=("all",))
    assert res["AR@100"] == 50.0  # thresholds .5,.55,...,.7 -> 5/10
