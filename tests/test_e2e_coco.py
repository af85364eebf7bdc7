"""Engine-level e2e on the COCO / GraspNet evaluator path (VERDICT r2
item 4/5): synthetic COCO-json dataset with known dataset ids a strict,
non-prefix subset of the categories, OPENDET_BENCHMARK=False, driven
through do_train -> do_test -> OpensetCocoEvaluator. Exercises the fused
cascade with unknown_id=1000, the known-idx -> contiguous-id
``class_id_table`` remap (postprocess.py), the contiguous -> dataset-id
reverse map in the evaluator, prediction persistence, and --resume_test
re-scoring — the chain the round-2 postmortem showed can rot invisibly
behind unit tests.
"""
import json
import os

import numpy as np
import pytest

from openset_rcnn_tpu.data import generate_synthetic_dataset
from openset_rcnn_tpu.data.catalog import DatasetCatalog, MetadataCatalog

# dataset ids deliberately non-contiguous; known ids are NOT the first
# contiguous indices (known contiguous = [0, 2, 4]) so every remap is
# non-identity (GraspNet's split has the same property)
DATASET_IDS = [11, 12, 13, 24, 25]
KNOWN_IDS = [11, 13, 25]
THING_CLASSES = ["c0", "c1", "c2", "c3", "c4"]
CONTIG = {ds: i for i, ds in enumerate(DATASET_IDS)}
KNOWN_CONTIG = sorted(CONTIG[k] for k in KNOWN_IDS)  # [0, 2, 4]


def _write_coco_json(records, path):
    images, annotations = [], []
    aid = 1
    for r in records:
        images.append(
            {"id": int(r["image_id"]), "width": r["width"], "height": r["height"],
             "file_name": os.path.basename(r["file_name"])}
        )
        for a in r["annotations"]:
            x1, y1, x2, y2 = a["bbox"]
            annotations.append(
                {"id": aid, "image_id": int(r["image_id"]),
                 "category_id": DATASET_IDS[a["category_id"]],
                 "bbox": [x1, y1, x2 - x1, y2 - y1],
                 "area": (x2 - x1) * (y2 - y1), "iscrowd": 0}
            )
            aid += 1
    cats = [{"id": ds, "name": n} for ds, n in zip(DATASET_IDS, THING_CLASSES)]
    with open(path, "w") as f:
        json.dump({"images": images, "annotations": annotations, "categories": cats}, f)


def register_synth_coco(tmp_path):
    """Both splits drawn over all 5 classes with a pinned color map; the
    TRAIN split drops non-known annotations (the GraspNet train filter,
    ref data/graspnet.py:190-195)."""
    out = {}
    for name, n, seed in [("synthcoco_train", 16, 0), ("synthcoco_test", 4, 99)]:
        records = generate_synthetic_dataset(
            str(tmp_path / name), num_images=n, image_hw=(240, 320),
            num_classes=5, seed=seed, color_seed=7,
        )
        if "train" in name:
            for r in records:
                r["annotations"] = [
                    a for a in r["annotations"] if a["category_id"] in KNOWN_CONTIG
                ]
        json_file = str(tmp_path / f"{name}.json")
        _write_coco_json(records, json_file)
        DatasetCatalog.remove(name)
        DatasetCatalog.register(name, lambda r=records: r)
        MetadataCatalog.get(name).update(
            evaluator_type="coco",
            json_file=json_file,
            thing_classes=THING_CLASSES,
            thing_dataset_id_to_contiguous_id=dict(CONTIG),
            known_ids=list(KNOWN_IDS),
        )
        out[name] = records
    return out


def make_coco_cfg(tmp_path):
    from tests.test_e2e import make_cfg

    cfg = make_cfg(tmp_path)
    cfg.OPENDET_BENCHMARK = False
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 5
    cfg.MODEL.ROI_HEADS.NUM_KNOWN_CLASSES = 3
    cfg.DATASETS.TRAIN = ("synthcoco_train",)
    cfg.DATASETS.TEST = ("synthcoco_test",)
    return cfg


@pytest.mark.slow
def test_coco_path_end_to_end(tmp_path):
    from openset_rcnn_tpu.engine.train_loop import (
        build_model_spec,
        build_module_and_params,
        do_test,
        do_train,
        get_evaluator,
    )

    register_synth_coco(tmp_path)
    cfg = make_coco_cfg(tmp_path)
    cfg.freeze()

    # model spec derives the id_map from the dataset's known_ids metadata:
    # contiguous ids [0, 2, 4] -> known indices [0, 1, 2], bg 5 -> 3
    spec = build_model_spec(cfg)
    id_map = list(spec.id_map)
    assert id_map[0] == 0 and id_map[2] == 1 and id_map[4] == 2
    assert id_map[1] == -1 and id_map[3] == -1 and id_map[5] == 3

    state = do_train(cfg)
    module, _ = build_module_and_params(cfg, spec)
    results = do_test(cfg, module, state.params, spec)["synthcoco_test"]

    # full 30-stat surface: 16 known metrics + 14 unknown + per-category AP
    from openset_rcnn_tpu.evaluation.coco_eval import (
        KNOWN_METRIC_NAMES,
        UNKNOWN_METRIC_NAMES,
    )

    for k in KNOWN_METRIC_NAMES + UNKNOWN_METRIC_NAMES:
        assert k in results, k
    for name in ("c0", "c2", "c4"):
        assert f"AP-{name}" in results
    assert np.isfinite(results["AOSE"])

    # persisted predictions use DATASET ids (11/13/25) for known classes and
    # 1000 for unknown — the double remap worked end-to-end
    pred_path = os.path.join(
        cfg.OUTPUT_DIR, "inference", "synthcoco_test", "instances_predictions.json"
    )
    preds = json.load(open(pred_path))
    assert preds, "no detections persisted"
    cat_ids = {p["category_id"] for p in preds}
    assert cat_ids <= set(KNOWN_IDS) | {1000}, cat_ids

    # --resume_test re-scoring from the persisted file reproduces the result
    ev = get_evaluator(cfg, "synthcoco_test", "openset")
    resumed = ev.evaluate(resume=True)
    assert resumed.keys() == results.keys()
    for k in results:
        a, b = resumed[k], results[k]
        assert (np.isnan(a) and np.isnan(b)) or a == b, (k, a, b)

    # cls_agn_unk protocol variant returns its recall-centric subset
    res2 = do_test(cfg, module, state.params, spec, eval_type="cls_agn_unk")
    assert set(res2["synthcoco_test"]) == {"AR@10", "AR@20", "AR@30", "AR@50", "AR@100", "AP"}
