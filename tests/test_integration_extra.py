"""Extra integration coverage: mixed-orientation buckets and the COCO
evaluator wrapper end-to-end."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openset_rcnn_tpu.data import DetectionTransform, EvalLoader
from openset_rcnn_tpu.data.catalog import MetadataCatalog


def make_mixed_records(tmp_path, rng):
    import cv2

    records = []
    for i, (h, w) in enumerate([(200, 300), (300, 200), (220, 320), (320, 220)]):
        img = np.full((h, w, 3), 40, np.uint8)
        cv2.rectangle(img, (20, 20), (90, 90), (0, 200, 0), -1)
        path = str(tmp_path / f"m{i}.png")
        cv2.imwrite(path, img)
        records.append(
            {
                "file_name": path,
                "image_id": i,
                "height": h,
                "width": w,
                "annotations": [
                    {"bbox": [20.0, 20.0, 90.0, 90.0], "category_id": 0, "difficult": 0}
                ],
            }
        )
    return records


def test_mixed_orientation_buckets(tmp_path, rng):
    records = make_mixed_records(tmp_path, rng)
    tr = DetectionTransform(
        min_sizes=(128,), max_size=256, bucket_hw=(160, 288), max_gt=4, flip=False
    )
    loader = EvalLoader(records, tr, batch_size=1)
    buckets = set()
    count = 0
    for batch, meta in loader:
        buckets.add(tuple(meta.bucket_hw))
        assert batch.images.shape[1:3] == meta.bucket_hw
        count += 1
    assert count == 4
    assert buckets == {(160, 288), (288, 160)}  # landscape + portrait


def test_coco_evaluator_wrapper_end_to_end(tmp_path):
    from openset_rcnn_tpu.evaluation.coco_eval import OpensetCocoEvaluator

    gt = {
        "images": [
            {"id": 1, "file_name": "a.png", "height": 100, "width": 100},
            {"id": 2, "file_name": "b.png", "height": 100, "width": 100},
        ],
        "categories": [
            {"id": 7, "name": "known_a"},
            {"id": 9, "name": "known_b"},
            {"id": 11, "name": "novel"},
        ],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 7, "bbox": [0, 0, 20, 20], "area": 400, "iscrowd": 0},
            {"id": 2, "image_id": 1, "category_id": 11, "bbox": [50, 50, 20, 20], "area": 400, "iscrowd": 0},
            {"id": 3, "image_id": 2, "category_id": 9, "bbox": [10, 10, 30, 30], "area": 900, "iscrowd": 0},
        ],
    }
    json_path = tmp_path / "gt.json"
    json_path.write_text(json.dumps(gt))

    name = "synthetic_coco_eval"
    MetadataCatalog.get(name).update(
        json_file=str(json_path),
        thing_classes=["known_a", "known_b", "novel"],
        thing_dataset_id_to_contiguous_id={7: 0, 9: 1, 11: 2},
    )
    ev = OpensetCocoEvaluator(
        name,
        known_ids=[7, 9],
        output_dir=str(tmp_path / "out"),
        unknown_id=1000,
    )
    ev.reset()
    # perfect known detections (contiguous ids) + one unknown detection on the novel GT
    ev.process(1, np.asarray([[0, 0, 20, 20.0]]), np.asarray([0.9]), np.asarray([0]))
    ev.process(1, np.asarray([[50, 50, 70, 70.0]]), np.asarray([0.8]), np.asarray([1000]))
    ev.process(2, np.asarray([[10, 10, 40, 40.0]]), np.asarray([0.85]), np.asarray([1]))
    res = ev.evaluate()
    assert res["AP"] == 100.0
    assert res["AP-unknown"] == 100.0
    assert res["AOSE"] == 0.0
    assert res["AP-known_a"] == 100.0

    # persisted + resumable
    ev2 = OpensetCocoEvaluator(
        name, known_ids=[7, 9], output_dir=str(tmp_path / "out"), unknown_id=1000
    )
    res2 = ev2.evaluate(resume=True)
    assert res2["AP"] == 100.0

    # a known det covering the novel GT -> AOSE
    ev.reset()
    ev.process(1, np.asarray([[50, 50, 70, 70.0]]), np.asarray([0.9]), np.asarray([0]))
    res3 = ev.evaluate()
    assert res3["AOSE"] == 1.0
    assert res3["AP"] == 0.0

    # eval_type output keys (reference _derive_coco_results branches,
    # os_coco_evaluation.py:349-460): cls_agn_unk is the recall-centric
    # subset; Closeset is rejected up front (the reference's scoring path
    # asserts eval_type == "openset" at os_coco_evaluation.py:602).
    for key in ("AP", "AP50", "WI", "AOSE", "AP-unknown", "AR@100-unknown"):
        assert key in res, key
    ev4 = OpensetCocoEvaluator(
        name, known_ids=[7, 9], output_dir=str(tmp_path / "out"),
        unknown_id=1000, eval_type="cls_agn_unk",
    )
    res4 = ev4.evaluate(resume=True)
    assert set(res4) == {"AR@10", "AR@20", "AR@30", "AR@50", "AR@100", "AP"}
    with pytest.raises(ValueError, match="Closeset"):
        OpensetCocoEvaluator(name, known_ids=[7, 9], eval_type="Closeset")
