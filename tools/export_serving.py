#!/usr/bin/env python
"""Export the fused serving cascade as a portable StableHLO artifact.

TPU-native deployment path the reference has no analogue for (its serving
story is ``train.py --eval-only`` on a live torch process): ``jax.export``
serializes the jitted forward+cascade (weights baked in as constants) so a
serving binary can load and run it with no Python model code:

    python tools/export_serving.py --config-file configs/... \
        --batch 8 --out serving.bin [MODEL.WEIGHTS ckpt ...]

    # consumer side
    from jax import export
    fn = export.deserialize(open("serving.bin", "rb").read()).call
    dets = fn(images_f32, image_hw)   # padded ServeDetections pytree

The exported artifact targets the platform it is exported on (TPU under
axon; pass --platform cpu to cross-export a CPU-runnable artifact for
testing). Round-trip is covered by tests/test_export_serving.py.

``--split`` (the recommended deployment configuration) exports TWO chained
artifacts instead — ``<out>.fwd`` (images -> raw per-proposal tensors) and
``<out>.casc`` (raw tensors -> ServeDetections) — the same split the eval
harness runs (evaluation/testing.py), throughput-neutral vs the single
program (87.9 vs 88.1 img/s chained, BENCH_EVAL_r05.json) and crash-free
for every config. Round-5 bisection
(PERFORMANCE.md "root cause of the fused-eval worker crash") pinned the
round-4 single-program TPU worker crash to forward+cascade fused with a
SMALL ``TEST.DETECTIONS_PER_IMAGE`` (the yacs default 100); the single
program at the benchmark configs' value (1000) is execution-validated at
batch 16. Consumer:

    fwd = export.deserialize(open("serving.fwd", "rb").read()).call
    casc = export.deserialize(open("serving.casc", "rb").read()).call
    dets = casc(*fwd(images_f32, image_hw))   # padded ServeDetections

The single-program export (no --split) remains for small-batch serving
where one dispatch is preferable; it warns when cfg asks for a small
stage-1 top-k (the off-envelope configuration).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_serving_fn(cfg, params_override=None):
    """(cfg[, params]) -> (jitted fn(images, image_hw) -> ServeDetections,
    example args). Shared by the CLI and the round-trip test."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    from openset_rcnn_tpu.engine.checkpoint import Checkpointer
    from openset_rcnn_tpu.engine.optimizer import build_optimizer
    from openset_rcnn_tpu.engine.train_loop import build_model_spec, build_module_and_params
    from openset_rcnn_tpu.engine.train_state import create_train_state
    from openset_rcnn_tpu.evaluation.postprocess import PostprocessConfig
    from openset_rcnn_tpu.evaluation.testing import CompiledInference
    from openset_rcnn_tpu.models.serving import ServeDetections

    try:
        jexport.register_namedtuple_serialization(
            ServeDetections, serialized_name="openset_rcnn_tpu.ServeDetections"
        )
    except ValueError:
        pass  # already registered (repeat calls in one process)

    spec = build_model_spec(cfg)
    module, params = build_module_and_params(cfg, spec)
    if params_override is not None:
        params = params_override
    elif cfg.MODEL.WEIGHTS:
        tx, _ = build_optimizer(cfg, params)
        state = create_train_state(params, tx)
        state, _ = Checkpointer(cfg.OUTPUT_DIR).resume_or_load(
            state, cfg.MODEL.WEIGHTS, resume=False
        )
        params = state.params

    class_id_table = None
    if not cfg.OPENDET_BENCHMARK:
        from openset_rcnn_tpu.data.graspnet_meta import GRASPNET_KNOWN_IDS, graspnet_metadata

        contig = graspnet_metadata()["thing_dataset_id_to_contiguous_id"]
        class_id_table = np.asarray(sorted(contig[i] for i in GRASPNET_KNOWN_IDS))
    post_cfg = PostprocessConfig.from_cfg(cfg, cfg.OPENDET_BENCHMARK, class_id_table)
    infer = CompiledInference(module, params, spec, post_cfg=post_cfg)
    return infer, post_cfg


def build_split_serving_fns(infer, bucket):
    """The crash-free deployment configuration: two chained jitted fns
    mirroring evaluation/testing._TwoStageInference — ``fwd(images, hw)``
    returns the 8 RawDetections fields as a flat tuple (plain pytrees
    serialize without custom registration), ``casc(*raw)`` maps them to
    ServeDetections. ``casc(*fwd(images, hw))`` == the fused single
    program."""
    import jax

    two = infer._cache[bucket]
    raw_c, casc_c = two.raw_c, two.casc_c
    params = infer.params

    def fwd(im, ihw):
        r = raw_c(params, im, ihw)
        return (r.boxes, r.objectness, r.pred_iou, r.centerness,
                r.min_dist, r.pln_class, r.known_probs, r.valid)

    def casc(boxes, objectness, pred_iou, centerness, min_dist, pln_class,
             known_probs, valid):
        from openset_rcnn_tpu.structures import RawDetections

        return casc_c(RawDetections(
            boxes=boxes, objectness=objectness, pred_iou=pred_iou,
            centerness=centerness, min_dist=min_dist, pln_class=pln_class,
            known_probs=known_probs, valid=valid,
        ))

    return jax.jit(fwd), jax.jit(casc)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--out", required=True)
    p.add_argument("--platform", default="", help="export platform override (e.g. cpu)")
    p.add_argument(
        "--split", action="store_true",
        help="export the chained forward+cascade pair (<out>.fwd + <out>.casc)"
        " — the crash-free configuration the eval harness runs",
    )
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from openset_rcnn_tpu.config import get_default_cfg
    from openset_rcnn_tpu.data import register_builtin_datasets

    cfg = get_default_cfg()
    cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()
    register_builtin_datasets()

    infer, _ = build_serving_fn(cfg)
    bh, bw = cfg.TPU.TEST_BUCKET
    images = jnp.zeros((args.batch, bh, bw, 3), jnp.float32)
    hw = jnp.zeros((args.batch, 2), jnp.float32)

    # CompiledInference.__call__ closes over params; export the cached
    # jitted callable for the bucket shape.
    infer(images, hw)  # populate cache / compile
    platforms = [args.platform] if args.platform else None
    if args.split:
        fwd, casc = build_split_serving_fns(infer, (bh, bw))
        e_fwd = jexport.export(fwd, platforms=platforms)(images, hw)
        raw_shapes = jax.eval_shape(fwd, images, hw)
        e_casc = jexport.export(casc, platforms=platforms)(*raw_shapes)
        for suffix, exported in ((".fwd", e_fwd), (".casc", e_casc)):
            data = exported.serialize()
            with open(args.out + suffix, "wb") as f:
                f.write(data)
            print(
                f"wrote {args.out}{suffix} ({len(data) / 1e6:.1f} MB, "
                f"platforms={exported.platforms})"
            )
        print(f"chain: casc(*fwd(images ({args.batch}, {bh}, {bw}, 3), image_hw))")
    else:
        if cfg.TEST.DETECTIONS_PER_IMAGE < 1000:
            # round-5 bisection: forward+cascade fused into ONE program with
            # a small stage-1 top-k (the yacs default 100) deterministically
            # crashes the TPU worker; topk=1000 (the benchmark configs'
            # value) is execution-validated. PERFORMANCE.md "root cause of
            # the fused-eval worker crash".
            print(
                f"WARNING: single-program export with TEST.DETECTIONS_PER_IMAGE="
                f"{cfg.TEST.DETECTIONS_PER_IMAGE} < 1000 is OFF the validated"
                f" envelope (known TPU worker crash at 100); use --split or"
                f" DETECTIONS_PER_IMAGE 1000",
                file=sys.stderr,
            )
        fn = infer._cache[(bh, bw)]
        params = infer.params
        wrapped = jax.jit(lambda im, ihw: fn(params, im, ihw))
        exported = jexport.export(wrapped, platforms=platforms)(images, hw)
        data = exported.serialize()
        with open(args.out, "wb") as f:
            f.write(data)
        print(
            f"wrote {args.out} ({len(data) / 1e6:.1f} MB, platforms={exported.platforms}, "
            f"input ({args.batch}, {bh}, {bw}, 3))"
        )


if __name__ == "__main__":
    main()
