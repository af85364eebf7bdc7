"""End-to-end smoke: short training on a synthetic dataset, checkpoint
round-trip, and full open-set eval (SURVEY.md §4 item 5)."""
import json
import os

import jax
import numpy as np
import pytest

from openset_rcnn_tpu.config import get_default_cfg
from openset_rcnn_tpu.data import generate_synthetic_dataset
from openset_rcnn_tpu.data.catalog import DatasetCatalog, MetadataCatalog

CLASSES = ["c0", "c1", "c2", "unknown"]


def make_cfg(tmp_path):
    cfg = get_default_cfg()
    cfg.SEED = 0  # deterministic smoke run (SEED<0 now draws a random seed)
    cfg.OUTPUT_DIR = str(tmp_path / "output")
    cfg.OPENDET_BENCHMARK = True
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.ROI_HEADS.NUM_KNOWN_CLASSES = 3
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 64
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 64
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 200
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 100
    cfg.MODEL.RPN.BBOX_REG_LOSS_TYPE = "iou"
    cfg.MODEL.RPN.BBOX_REG_LOSS_WEIGHT = 0.5
    cfg.MODEL.RPN.CTR_REG_LOSS_WEIGHT = 0.5
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
    cfg.MODEL.PLN.UNK_THR = 0.5
    cfg.DATASETS.TRAIN = ("synth_train",)
    cfg.DATASETS.TEST = ("synth_test",)
    # From-scratch (no ImageNet init) stability: normalized pixel scale and
    # global-norm gradient clipping; the reference always starts from
    # pretrained weights and needs neither.
    cfg.MODEL.PIXEL_STD = [57.375, 57.12, 58.395]
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.BASE_LR = 0.002
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = True
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "norm"
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 1.0
    cfg.SOLVER.MAX_ITER = 40
    cfg.SOLVER.CHECKPOINT_PERIOD = 40
    cfg.SOLVER.WARMUP_ITERS = 10
    cfg.SOLVER.STEPS = (10000,)
    cfg.INPUT.MIN_SIZE_TRAIN = (128,)
    cfg.INPUT.MAX_SIZE_TRAIN = 256
    cfg.INPUT.MIN_SIZE_TEST = 128
    cfg.INPUT.MAX_SIZE_TEST = 256
    cfg.TPU.TRAIN_BUCKET = (160, 288)
    cfg.TPU.TEST_BUCKET = (160, 288)
    cfg.TPU.MAX_GT_PER_IMAGE = 8
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.TEST.EVAL_PERIOD = 0
    return cfg


def register_synth(tmp_path):
    for name, n, seed in [("synth_train", 12, 0), ("synth_test", 4, 99)]:
        DatasetCatalog.remove(name)
        records = generate_synthetic_dataset(
            str(tmp_path / name), num_images=n, image_hw=(240, 320), num_classes=3, seed=seed
        )
        DatasetCatalog.register(name, lambda r=records: r)
        MetadataCatalog.get(name).update(
            evaluator_type="voc_records", thing_classes=CLASSES
        )


@pytest.mark.slow
def test_train_eval_checkpoint_roundtrip(tmp_path):
    from openset_rcnn_tpu.engine.checkpoint import Checkpointer
    from openset_rcnn_tpu.engine.optimizer import build_optimizer
    from openset_rcnn_tpu.engine.train_loop import (
        build_model_spec,
        build_module_and_params,
        do_test,
        do_train,
    )
    from openset_rcnn_tpu.engine.train_state import create_train_state

    register_synth(tmp_path)
    cfg = make_cfg(tmp_path)

    state = do_train(cfg)
    assert int(state.step) == 40

    # metrics were written and the loss went down
    lines = [json.loads(l) for l in open(os.path.join(cfg.OUTPUT_DIR, "metrics.json"))]
    totals = {l["iteration"]: l["total_loss"] for l in lines if "total_loss" in l}
    assert all(np.isfinite(v) for v in totals.values())
    # compare end vs start (the 20-vs-40 tail of a 40-iter smoke is noise:
    # e.g. 1.67 -> 0.669 -> 0.679 is clearly learning)
    assert totals[40] < 0.8 * totals[1], f"loss did not decrease: {totals}"

    # checkpoint round-trip
    spec = build_model_spec(cfg)
    module, params = build_module_and_params(cfg, spec)
    tx, _ = build_optimizer(cfg, params)
    fresh = create_train_state(params, tx)
    restored = Checkpointer(cfg.OUTPUT_DIR).restore(fresh)
    assert int(restored.step) == 40
    a = np.asarray(state.params["rpn_head"]["conv"]["kernel"])
    b = np.asarray(restored.params["rpn_head"]["conv"]["kernel"])
    np.testing.assert_allclose(a, b)

    # full eval produces the open-set metric dict
    results = do_test(cfg, module, restored.params, spec)
    res = results["synth_test"]
    for key in ("WI", "AOSE", "AP@K", "AP@U", "R@K", "mAP"):
        assert key in res
        assert np.isfinite(res[key])


@pytest.mark.slow
def test_swin_finetune_smoke(tmp_path):
    """Fine-tune smoke with the Swin-T trunk + stochastic depth active
    (VERDICT r2 stretch): the full engine train loop runs with the 'dropout'
    rng stream live, losses stay finite, and the loss decreases — i.e. the
    drop-path path is trainable end-to-end, not just plumbed."""
    from openset_rcnn_tpu.engine.train_loop import do_train

    register_synth(tmp_path)
    cfg = make_cfg(tmp_path)
    cfg.MODEL.BACKBONE.NAME = "build_swin_fpn_backbone"
    cfg.MODEL.SWIN.SIZE = "T"
    cfg.MODEL.SWIN.DROP_PATH_RATE = 0.1
    # smaller shapes than the R50 smoke: Swin attention is heavy on CPU
    cfg.SOLVER.MAX_ITER = 30
    cfg.SOLVER.CHECKPOINT_PERIOD = 30
    cfg.INPUT.MIN_SIZE_TRAIN = (96,)
    cfg.INPUT.MAX_SIZE_TRAIN = 160
    cfg.TPU.TRAIN_BUCKET = (128, 160)

    state = do_train(cfg)
    assert int(state.step) == 30

    lines = [json.loads(l) for l in open(os.path.join(cfg.OUTPUT_DIR, "metrics.json"))]
    totals = {l["iteration"]: l["total_loss"] for l in lines if "total_loss" in l}
    assert all(np.isfinite(v) for v in totals.values())
    first, last = min(totals), max(totals)
    assert first < last and totals[last] < totals[first], (
        f"loss did not decrease: {totals}"
    )
