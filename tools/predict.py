#!/usr/bin/env python
"""Single-image / folder open-set inference CLI.

The reference exposes inference only through ``train.py --eval-only`` (plus
a manual dataset visualizer, data/graspnet.py:221-251); this gives the
framework a direct predict surface:

    python tools/predict.py --config-file configs/VOC-COCO/openset_rcnn_R50_FPN_128k.yaml \
        --input img1.jpg img2.jpg --output out/ \
        MODEL.WEIGHTS path/to/checkpoint

Runs the fused on-device cascade (models/serving.py), writes one JSON per
image ({boxes, scores, classes, names}) and, with --viz, a BGR overlay
(unknowns in red).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--input", nargs="+", required=True, help="image files or a directory")
    p.add_argument("--output", default="predictions")
    p.add_argument("--viz", action="store_true", help="also write box overlays")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from openset_rcnn_tpu.config import get_default_cfg
    from openset_rcnn_tpu.data import MetadataCatalog, register_builtin_datasets
    from openset_rcnn_tpu.data.transforms import DetectionTransform
    from openset_rcnn_tpu.engine.checkpoint import Checkpointer
    from openset_rcnn_tpu.engine.optimizer import build_optimizer
    from openset_rcnn_tpu.engine.train_loop import (
        build_model_spec,
        build_module_and_params,
    )
    from openset_rcnn_tpu.engine.train_state import create_train_state
    from openset_rcnn_tpu.evaluation.postprocess import (
        PostprocessConfig,
        finalize_serve_image,
    )
    from openset_rcnn_tpu.evaluation.testing import CompiledInference

    cfg = get_default_cfg()
    cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()

    register_builtin_datasets()
    spec = build_model_spec(cfg)
    module, params = build_module_and_params(cfg, spec)
    tx, _ = build_optimizer(cfg, params)
    state = create_train_state(params, tx)
    state, _ = Checkpointer(cfg.OUTPUT_DIR).resume_or_load(state, cfg.MODEL.WEIGHTS, resume=False)

    class_id_table = None
    if cfg.OPENDET_BENCHMARK:
        names = MetadataCatalog.get(cfg.DATASETS.TEST[0]).thing_classes if cfg.DATASETS.TEST else None
        unknown_label = "unknown"
    else:
        from openset_rcnn_tpu.data.graspnet_meta import GRASPNET_KNOWN_IDS, graspnet_metadata

        meta = graspnet_metadata()
        names = meta["thing_classes"]
        contig = meta["thing_dataset_id_to_contiguous_id"]
        class_id_table = np.asarray(sorted(contig[i] for i in GRASPNET_KNOWN_IDS))
        unknown_label = "unknown"

    post_cfg = PostprocessConfig.from_cfg(cfg, cfg.OPENDET_BENCHMARK, class_id_table)
    infer = CompiledInference(module, state.params, spec, post_cfg=post_cfg)
    transform = DetectionTransform(
        min_sizes=(cfg.INPUT.MIN_SIZE_TEST,),
        max_size=cfg.INPUT.MAX_SIZE_TEST,
        bucket_hw=tuple(cfg.TPU.TEST_BUCKET),
        max_gt=1,
        flip=False,
        fmt=cfg.INPUT.FORMAT,
        interp=cfg.TPU.RESIZE_INTERP,
    )

    paths = []
    for item in args.input:
        if os.path.isdir(item):
            paths.extend(
                os.path.join(item, f)
                for f in sorted(os.listdir(item))
                if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp"))
            )
        else:
            paths.append(item)
    os.makedirs(args.output, exist_ok=True)

    rng = np.random.RandomState(0)
    for path in paths:
        ex = transform({"file_name": path, "image_id": path}, rng)
        if ex is None:
            print(f"skipping unreadable {path}")
            continue
        out = infer(jnp.asarray(ex.image[None]), jnp.asarray([ex.image_hw], jnp.float32))
        out = jax.tree.map(np.asarray, out)
        dets = finalize_serve_image(
            out.boxes[0], out.scores[0], out.classes[0], out.valid[0],
            ex.image_hw, ex.original_hw, post_cfg,
        )
        det_names = [
            unknown_label if int(c) == post_cfg.unknown_id else (names[int(c)] if names else str(int(c)))
            for c in dets.classes
        ]
        base = os.path.splitext(os.path.basename(path))[0]
        with open(os.path.join(args.output, base + ".json"), "w") as f:
            json.dump(
                {
                    "file_name": path,
                    "boxes_xyxy": np.asarray(dets.boxes).round(2).tolist(),
                    "scores": np.asarray(dets.scores).round(4).tolist(),
                    "classes": np.asarray(dets.classes).tolist(),
                    "names": det_names,
                },
                f,
                indent=1,
            )
        if args.viz:
            import cv2

            from openset_rcnn_tpu.utils.visualizer import draw_boxes

            img = cv2.imread(path, cv2.IMREAD_COLOR)
            overlay = draw_boxes(
                img, dets.boxes, labels=det_names, classes=np.asarray(dets.classes),
                scores=np.asarray(dets.scores), unknown_id=post_cfg.unknown_id,
            )
            cv2.imwrite(os.path.join(args.output, base + "_viz.jpg"), overlay)
        print(f"{path}: {len(det_names)} detections -> {args.output}/{base}.json")


if __name__ == "__main__":
    main()
