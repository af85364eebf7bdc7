"""Multi-process eval sharding: round-robin record slicing (engine) plus the
evaluators' cross-process detection gather (reference d2 InferenceSampler +
comm.gather, os_coco_evaluation.py:163-169, pascal_voc_evaluation.py:106)."""
import numpy as np

import openset_rcnn_tpu.parallel as parallel
from openset_rcnn_tpu.engine.train_loop import shard_eval_records
from openset_rcnn_tpu.evaluation.voc_eval import OpensetVocEvaluator


def test_shard_eval_records_disjoint_cover():
    records = [{"i": i} for i in range(11)]
    shards = [shard_eval_records(records, s, 4) for s in range(4)]
    seen = [r["i"] for sh in shards for r in sh]
    assert sorted(seen) == list(range(11))
    assert shard_eval_records(records, 0, 1) is records


def _fresh(gt_pairs):
    ev = OpensetVocEvaluator(["cat", "dog", "unknown"], num_known_classes=2)
    for img, (boxes, names, diff) in gt_pairs.items():
        ev.add_ground_truth(img, boxes, names, diff)
    return ev


def test_sharded_voc_eval_matches_unsharded(monkeypatch):
    gt = {
        "img1": ([[0, 0, 10, 10], [20, 20, 30, 30], [50, 50, 60, 60]],
                 ["cat", "dog", "zebra"], [False, False, False]),
        "img2": ([[0, 0, 10, 10], [30, 30, 40, 40]],
                 ["cat", "bird"], [True, False]),
    }
    dets = [
        ("img1", [[0, 0, 10, 10]], [0.9], [0]),
        ("img2", [[0, 0, 10, 10]], [0.8], [0]),
        ("img1", [[50, 50, 60, 60]], [0.7], [0]),
        ("img1", [[20, 20, 30, 30]], [0.6], [1]),
        ("img1", [[50, 50, 60, 60]], [0.5], [2]),
    ]

    def feed(ev, items):
        for img, b, s, c in items:
            ev.process(img, np.asarray(b, np.float64), np.asarray(s), np.asarray(c))

    full = _fresh(gt)
    feed(full, dets)
    want = full.evaluate()

    # two "processes", round-robin over detections' images
    ev0, ev1 = _fresh(gt), _fresh(gt)
    feed(ev0, dets[0::2])
    feed(ev1, dets[1::2])
    parts = [dict(ev0._dets), dict(ev1._dets)]
    monkeypatch.setattr(parallel, "num_processes", lambda: 2)
    monkeypatch.setattr(parallel, "gather_object", lambda obj: parts)
    got = ev0.evaluate()
    assert got == want


def test_mesh_sharded_eval_matches_single_device(tmp_path):
    """Single-process multi-chip eval (do_test with TPU.EVAL_MESH) shards
    the batch over the virtual 8-device mesh; metrics must equal the
    unsharded single-device evaluation (VERDICT r2 item 8)."""
    from tests.test_e2e import make_cfg, register_synth
    from openset_rcnn_tpu.engine.train_loop import (
        build_model_spec,
        build_module_and_params,
        do_test,
    )

    register_synth(tmp_path)
    base = make_cfg(tmp_path)
    base.TPU.EVAL_BATCH_SIZE = 4  # gcd(4, 8 devices) -> 4-way sharded eval

    def run(eval_mesh):
        cfg = base.clone()
        cfg.TPU.EVAL_MESH = eval_mesh
        cfg.freeze()
        spec = build_model_spec(cfg)
        module, params = build_module_and_params(cfg, spec)
        return do_test(cfg, module, params, spec)["synth_test"]

    assert run(True) == run(False)
