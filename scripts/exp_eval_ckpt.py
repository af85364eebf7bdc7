"""Eval-only: load a checkpoint from an exp_bf16_learn run and score it with
configurable backend/eval path, to bisect train-side vs eval-side failures.

Usage: python scripts/exp_eval_ckpt.py <out_dir> [cpu|tpu] [fused|host] [unk_thr]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

backend = sys.argv[2] if len(sys.argv) > 2 else "cpu"
if backend == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

from openset_rcnn_tpu.config import get_default_cfg
from openset_rcnn_tpu.data import generate_synthetic_dataset
from openset_rcnn_tpu.data.catalog import DatasetCatalog, MetadataCatalog

CLASSES = ["c0", "c1", "c2", "unknown"]


def main():
    out_dir = sys.argv[1]
    fused = (sys.argv[3] if len(sys.argv) > 3 else "host") == "fused"
    unk_thr = float(sys.argv[4]) if len(sys.argv) > 4 else 0.3
    root = os.path.dirname(out_dir.rstrip("/"))

    for name, n, seed, ncls in [("synth_train", 40, 0, 3), ("synth_test", 10, 99, 4)]:
        records = generate_synthetic_dataset(
            os.path.join(root, name), num_images=n, image_hw=(240, 320),
            num_classes=ncls, seed=seed, color_seed=7,
        )
        DatasetCatalog.register(name, lambda r=records: r)
        MetadataCatalog.get(name).update(
            evaluator_type="voc_records", thing_classes=CLASSES
        )

    cfg = get_default_cfg()
    cfg.SEED = 0
    cfg.OUTPUT_DIR = os.path.join(root, "reeval")
    cfg.OPENDET_BENCHMARK = True
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.ROI_HEADS.NUM_KNOWN_CLASSES = 3
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 64
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 64
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 200
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 100
    cfg.MODEL.RPN.BBOX_REG_LOSS_TYPE = "iou"
    cfg.MODEL.RPN.DELTA_BIAS_INIT = 0.25
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
    cfg.MODEL.PLN.UNK_THR = unk_thr
    cfg.DATASETS.TRAIN = ("synth_train",)
    cfg.DATASETS.TEST = ("synth_test",)
    cfg.MODEL.PIXEL_STD = [57.375, 57.12, 58.395]
    # identical optimizer tree to the training run (opt_state must match the
    # checkpoint's pytree for restore)
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = True
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "norm"
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 1.0
    cfg.INPUT.MIN_SIZE_TEST = 128
    cfg.INPUT.MAX_SIZE_TEST = 256
    cfg.TPU.TRAIN_BUCKET = (160, 288)
    cfg.TPU.TEST_BUCKET = (160, 288)
    cfg.TPU.MAX_GT_PER_IMAGE = 8
    cfg.TPU.EVAL_FUSED = fused
    cfg.TEST.EVAL_PERIOD = 0

    from openset_rcnn_tpu.engine.checkpoint import Checkpointer
    from openset_rcnn_tpu.engine.optimizer import build_optimizer
    from openset_rcnn_tpu.engine.train_state import create_train_state
    from openset_rcnn_tpu.engine.train_loop import (
        build_model_spec,
        build_module_and_params,
        do_test,
    )

    spec = build_model_spec(cfg)
    module, params = build_module_and_params(cfg, spec)
    tx, _ = build_optimizer(cfg, params)
    state = create_train_state(params, tx)
    ckpt = Checkpointer(out_dir)
    state, _ = ckpt.resume_or_load(state, resume=True)
    print("loaded step:", int(state.step), file=sys.stderr)

    results = do_test(cfg, module, state.params, spec)
    print(json.dumps({"backend": backend, "fused": fused, "unk_thr": unk_thr,
                      "results": {k: {m: round(float(v), 2) for m, v in r.items()}
                                  for k, r in results.items()}}))


if __name__ == "__main__":
    main()
