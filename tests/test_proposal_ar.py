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


def test_proposal_ar_reachable_from_do_test(tmp_path):
    """--eval_type proposals drives the full engine path: CompiledProposals
    (backbone + CF-RPN only) -> rescale -> AR scoring; output carries the
    reference's AR@limit x area keys (os_coco_evaluation.py:297-334)."""
    from tests.test_e2e import make_cfg, register_synth
    from openset_rcnn_tpu.engine.train_loop import (
        build_model_spec,
        build_module_and_params,
        do_test,
    )

    register_synth(tmp_path)
    cfg = make_cfg(tmp_path)
    cfg.freeze()
    spec = build_model_spec(cfg)
    module, params = build_module_and_params(cfg, spec)
    res = do_test(cfg, module, params, spec, eval_type="proposals")["synth_test"]

    for limit in (100, 1000):
        assert f"AR@{limit}" in res
        for area in ("small", "medium", "large"):
            assert f"AR@{limit}-{area}" in res
    for v in res.values():
        # nan = no GT in that area range (COCO convention)
        assert np.isnan(v) or 0.0 <= v <= 100.0
    # the synthetic set has GT everywhere at the 'all' range: finite AR
    assert np.isfinite(res["AR@100"]) and np.isfinite(res["AR@1000"])
