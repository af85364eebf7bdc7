"""Stage-by-stage diagnosis of a trained checkpoint on a TRAIN image (CPU).

Restores the checkpoint from an exp_bf16_learn run, runs the RPN forward on a
training image (which a learning run must have memorized), and prints:
  * top proposals by centerness and their IoU with GT,
  * best achievable IoU over ALL decoded anchors (is localization present
    anywhere, just ranked badly?),
  * the RPN training targets for that image (XLA matcher): matched boxes,
    positive-anchor counts, target-vs-GT sanity.

Usage: python scripts/exp_diag_ckpt.py <out_dir>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from openset_rcnn_tpu.config import get_default_cfg
from openset_rcnn_tpu.data import generate_synthetic_dataset
from openset_rcnn_tpu.data.transforms import DetectionTransform
from openset_rcnn_tpu.structures import GroundTruth, ImageBatch


def pairwise_iou_np(a, b):
    ix1 = np.maximum(a[:, None, 0], b[None, :, 0])
    iy1 = np.maximum(a[:, None, 1], b[None, :, 1])
    ix2 = np.minimum(a[:, None, 2], b[None, :, 2])
    iy2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    bb = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(aa[:, None] + bb[None, :] - inter, 1e-9)


def main():
    out_dir = sys.argv[1]
    root = os.path.dirname(out_dir.rstrip("/"))

    records = generate_synthetic_dataset(
        os.path.join(root, "synth_train"), num_images=40, image_hw=(240, 320),
        num_classes=3, seed=0, color_seed=7,
    )

    cfg = get_default_cfg()
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
    cfg.MODEL.PIXEL_STD = [57.375, 57.12, 58.395]
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = True
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "norm"
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 1.0
    cfg.INPUT.MIN_SIZE_TEST = 128
    cfg.INPUT.MAX_SIZE_TEST = 256
    cfg.TPU.TRAIN_BUCKET = (160, 288)
    cfg.TPU.TEST_BUCKET = (160, 288)
    cfg.TPU.MAX_GT_PER_IMAGE = 8

    from openset_rcnn_tpu.engine.checkpoint import Checkpointer
    from openset_rcnn_tpu.engine.optimizer import build_optimizer
    from openset_rcnn_tpu.engine.train_state import create_train_state
    from openset_rcnn_tpu.engine.train_loop import build_model_spec, build_module_and_params
    from openset_rcnn_tpu.models import compute_anchors
    from openset_rcnn_tpu.models.rpn import rpn_targets
    from openset_rcnn_tpu.ops import Box2BoxTransformLinear as LinearBoxTransform

    spec = build_model_spec(cfg)
    module, params = build_module_and_params(cfg, spec)
    tx, _ = build_optimizer(cfg, params)
    state = create_train_state(params, tx)
    state, _ = Checkpointer(out_dir).resume_or_load(state, resume=True)
    print("loaded step:", int(state.step))
    params = state.params

    transform = DetectionTransform(
        min_sizes=(128,), max_size=256, bucket_hw=(160, 288), max_gt=8,
        flip=False, fmt=cfg.INPUT.FORMAT,
    )
    H, W = 160, 288
    anchors_np, level_sizes = compute_anchors(spec, (H, W))
    anchors = jnp.asarray(anchors_np)

    for rec in records[:2]:
        ex = transform(rec, np.random.RandomState(0))
        img = jnp.asarray(ex.image[None])
        gtb = np.asarray(ex.boxes)
        gtv = np.asarray(ex.gt_valid)
        gt = gtb[gtv]
        print(f"\n=== image {rec['image_id']} scaled GT ({len(gt)}):")
        print(np.round(gt, 1))

        feats = module.apply({"params": params}, img, method=module.features)
        deltas, ctr, _ = module.apply({"params": params}, feats, method=module.rpn_predictions)
        d = np.asarray(deltas)[0]
        c = np.asarray(ctr)[0]
        tf = LinearBoxTransform(normalize_by_size=True)
        dec = np.array(tf.apply_deltas(jnp.asarray(d), anchors))
        dec[:, 0::2] = dec[:, 0::2].clip(0, W)
        dec[:, 1::2] = dec[:, 1::2].clip(0, H)
        iou_all = pairwise_iou_np(dec, gt)
        print(f"ctr: min={c.min():.3f} max={c.max():.3f} mean={c.mean():.3f} std={c.std():.4f}")
        print(f"best decoded-box IoU per GT over ALL {len(dec)} anchors:",
              np.round(iou_all.max(0), 3))
        top = np.argsort(-c)[:20]
        print("top-20 by ctr: ctr", np.round(c[top], 3))
        print("  max IoU with any GT:", np.round(iou_all[top].max(1), 3))
        # where are the high-ctr anchors vs GT centers?
        print("  anchor of top-1:", np.round(anchors_np[top[0]], 1),
              "decoded:", np.round(dec[top[0]], 1))

        # training targets via the XLA matcher
        gt_j = GroundTruth(
            jnp.asarray(gtb[None]), jnp.asarray(np.zeros((1, 8), np.int32)),
            jnp.asarray(gtv[None]),
        )
        tgt = rpn_targets(
            anchors, gt_j, jax.random.PRNGKey(0),
            batch_size_per_image=64, positive_fraction=0.5,
            objectness_positive_fraction=1.0,
            reg_thresholds=spec.rpn_reg_thresholds,
            obj_thresholds=spec.rpn_obj_thresholds,
            use_pallas=False,
        )
        pos = np.asarray(tgt.reg_labels[0] == 1)
        mb = np.asarray(tgt.matched_boxes[0])
        print(f"targets: n_pos={pos.sum()}")
        if pos.sum():
            mbp = mb[pos]
            # each matched box must be one of the GT boxes
            ious_mb = pairwise_iou_np(mbp, gt).max(1)
            print("  matched-box-==GT check (IoU of matched targets vs GT):",
                  np.round(ious_mb, 3))
            print("  sample matched boxes:", np.round(mbp[:3], 1))
            # anchor vs matched gt iou
            ioa = pairwise_iou_np(anchors_np[pos], gt).max(1)
            print("  anchor-vs-GT IoU of positives:", np.round(ioa, 2))


if __name__ == "__main__":
    main()
