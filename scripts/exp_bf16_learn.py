"""bf16 training-quality validation: from-scratch synthetic learning run
(the VALIDATION.md recipe) with TPU.DTYPE from argv, printing the loss
trajectory and open-set eval metrics so f32 vs bfloat16 can be compared.

Usage: python scripts/exp_bf16_learn.py {float32|bfloat16} [iters] [matcher] [rpn_loss] [roi_bwd]
Runs on whatever backend is registered (the real chip under axon).
LR decays 10x at 75% of the schedule when iters >= 5000.
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openset_rcnn_tpu.config import get_default_cfg
from openset_rcnn_tpu.data import generate_synthetic_dataset
from openset_rcnn_tpu.data.catalog import DatasetCatalog, MetadataCatalog

CLASSES = ["c0", "c1", "c2", "unknown"]


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
    matcher = sys.argv[3] if len(sys.argv) > 3 else "auto"
    rpn_loss = sys.argv[4] if len(sys.argv) > 4 else "iou"
    roi_bwd = sys.argv[5] if len(sys.argv) > 5 else "pallas"
    root = tempfile.mkdtemp(prefix=f"bf16learn_{dtype}_{rpn_loss}_")

    # train has 3 known classes; test adds a never-trained 4th (unknown).
    # color_seed pins the class->color map across splits.
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
    cfg.OUTPUT_DIR = os.path.join(root, "out")
    cfg.OPENDET_BENCHMARK = True
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.ROI_HEADS.NUM_KNOWN_CLASSES = 3
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 64
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 64
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 200
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 100
    cfg.MODEL.RPN.BBOX_REG_LOSS_TYPE = rpn_loss
    cfg.MODEL.RPN.BBOX_REG_LOSS_WEIGHT = 0.5
    cfg.MODEL.RPN.CTR_REG_LOSS_WEIGHT = 0.5
    if rpn_loss == "iou":
        cfg.MODEL.RPN.DELTA_BIAS_INIT = 0.25  # IoU-loss cold start (VALIDATION.md)
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
    cfg.MODEL.PLN.UNK_THR = 0.3
    cfg.DATASETS.TRAIN = ("synth_train",)
    cfg.DATASETS.TEST = ("synth_test",)
    cfg.MODEL.PIXEL_STD = [57.375, 57.12, 58.395]
    cfg.SOLVER.IMS_PER_BATCH = 4
    cfg.SOLVER.BASE_LR = 0.002
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = True
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "norm"
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 1.0
    cfg.SOLVER.MAX_ITER = iters
    cfg.SOLVER.CHECKPOINT_PERIOD = iters
    cfg.SOLVER.WARMUP_ITERS = 100
    cfg.SOLVER.STEPS = (int(iters * 0.75),) if iters >= 5000 else (100000,)
    cfg.INPUT.MIN_SIZE_TRAIN = (128,)
    cfg.INPUT.MAX_SIZE_TRAIN = 256
    cfg.INPUT.MIN_SIZE_TEST = 128
    cfg.INPUT.MAX_SIZE_TEST = 256
    cfg.TPU.TRAIN_BUCKET = (160, 288)
    cfg.TPU.TEST_BUCKET = (160, 288)
    cfg.TPU.MAX_GT_PER_IMAGE = 8
    cfg.TPU.DTYPE = dtype
    cfg.TPU.RPN_MATCHER = matcher
    cfg.TPU.ROI_ALIGN_BWD = roi_bwd
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.TEST.EVAL_PERIOD = 0

    from openset_rcnn_tpu.engine.train_loop import (
        build_model_spec,
        build_module_and_params,
        do_test,
        do_train,
    )

    state = do_train(cfg)
    spec = build_model_spec(cfg)
    module, _ = build_module_and_params(cfg, spec)
    results = do_test(cfg, module, state.params, spec)

    lines = [json.loads(l) for l in open(os.path.join(cfg.OUTPUT_DIR, "metrics.json"))]
    totals = {l["iteration"]: l["total_loss"] for l in lines if "total_loss" in l}
    ks = sorted(totals)
    traj = {str(k): round(totals[k], 4) for k in ks if k % max(1, iters // 10) == 0 or k == ks[-1]}
    print(json.dumps({"dtype": dtype, "iters": iters, "matcher": matcher, "roi_bwd": roi_bwd, "loss_traj": traj,
                      "results": {k: {m: round(float(v), 2) for m, v in r.items()}
                                  for k, r in results.items()}}))


if __name__ == "__main__":
    main()
