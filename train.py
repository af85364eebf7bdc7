#!/usr/bin/env python
"""Openset-RCNN TPU training/eval CLI.

Interface-compatible with the reference entry point (train.py:229-281):

  python train.py --config-file configs/VOC-COCO/openset_rcnn_R50_FPN_128k.yaml \
      [--eval-only] [--resume] [--resume_test] [--test_iter N] \
      [--opendet-benchmark] [--num-chips N] [KEY VALUE ...]

Multi-chip execution replaces the reference's --num-gpus/NCCL launch
(SURVEY.md §2.2): one process drives a ('data','model') jax.sharding.Mesh;
--num-chips sets the data axis size (default: config TPU.MESH_DATA = 1;
use TPU.MESH_DATA -1 for all visible chips).
"""
from __future__ import annotations

import argparse
import logging
import os
import sys

logger = logging.getLogger("openset_rcnn_tpu")


def setup(args) -> "CfgNode":
    from openset_rcnn_tpu.config import get_default_cfg

    cfg = get_default_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opendet_benchmark:
        cfg.OPENDET_BENCHMARK = True
    cfg.merge_from_list(args.opts)
    if args.num_chips > 0:
        # --num-chips N trains data-parallel over an N-chip mesh axis
        # (replaces the reference --num-gpus launch, train.py:287-294);
        # default -1 keeps the config's TPU.MESH_DATA.
        cfg.TPU.MESH_DATA = args.num_chips
    cfg.freeze()
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)

    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s %(name)s]: %(message)s",
        datefmt="%m/%d %H:%M:%S",
        handlers=[
            logging.StreamHandler(),
            logging.FileHandler(os.path.join(cfg.OUTPUT_DIR, "log.txt")),
        ],
    )
    with open(os.path.join(cfg.OUTPUT_DIR, "config.yaml"), "w") as f:
        f.write(cfg.dump())
    logger.info("Running with config:\n%s", cfg.dump())
    return cfg


def main(args):
    cfg = setup(args)

    if args.num_machines > 1 or args.dist_url:
        from openset_rcnn_tpu.parallel import initialize_distributed

        # manual-cluster topology mirrors the reference launcher flags
        # (--num-machines/--machine-rank/--dist-url, ref train.py:264-270)
        initialize_distributed(
            args.dist_url or None,
            num_processes=args.num_machines if args.num_machines > 1 else None,
            process_id=args.machine_rank if args.num_machines > 1 else None,
        )

    from openset_rcnn_tpu.data import register_builtin_datasets
    from openset_rcnn_tpu.engine.train_loop import (
        build_model_spec,
        build_module_and_params,
        do_test,
        do_train,
    )

    register_builtin_datasets()

    if args.resume_test:
        # Re-score persisted predictions without touching the model
        # (reference train.py:188-199, os_coco_evaluation.py:177-184).
        from openset_rcnn_tpu.engine.train_loop import get_evaluator

        results = {}
        for name in cfg.DATASETS.TEST:
            evaluator = get_evaluator(cfg, name, args.eval_type)
            results[name] = evaluator.evaluate(resume=True)
        print(results)
        return results

    if args.eval_only:
        from openset_rcnn_tpu.engine.checkpoint import Checkpointer
        from openset_rcnn_tpu.engine.optimizer import build_optimizer
        from openset_rcnn_tpu.engine.train_state import create_train_state

        spec = build_model_spec(cfg)
        module, params = build_module_and_params(cfg, spec)
        tx, _ = build_optimizer(cfg, params)
        state = create_train_state(params, tx)
        ckpt = Checkpointer(cfg.OUTPUT_DIR)
        if args.test_iter > 0:
            # evaluate a specific checkpoint iteration (reference
            # train.py:242-252)
            path = os.path.join(cfg.OUTPUT_DIR, f"model_{args.test_iter:07d}")
            state = ckpt.restore(state, path)
        else:
            state, _ = ckpt.resume_or_load(state, cfg.MODEL.WEIGHTS, resume=args.resume)
        results = do_test(cfg, module, state.params, spec, eval_type=args.eval_type)
        print(results)
        return results

    return do_train(cfg, resume=args.resume, profile_steps=args.profile_steps, debug_nans=args.debug_nans)


def get_parser():
    parser = argparse.ArgumentParser(description="Openset-RCNN TPU")
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--resume_test", action="store_true", help="re-score saved predictions")
    parser.add_argument("--test_iter", type=int, default=-1, help="checkpoint iteration to test")
    parser.add_argument(
        "--eval_type",
        default="openset",
        choices=["openset", "cls_agn_unk", "proposals"],
        help="evaluation protocol variant (the reference also lists "
        "'Closeset' but its scoring path asserts out; we reject it up "
        "front). 'proposals' runs the box-proposals AR task "
        "(os_coco_evaluation.py:297-334) on the CF-RPN outputs",
    )
    parser.add_argument("--opendet-benchmark", action="store_true")
    parser.add_argument("--num-chips", type=int, default=-1, help="data-parallel chips")
    # interface parity with the reference launcher (train.py:264-270);
    # multi-host JAX runs use --dist-url as the coordinator address
    parser.add_argument("--num-machines", type=int, default=1)
    parser.add_argument("--machine-rank", type=int, default=0)
    parser.add_argument("--dist-url", default="")
    parser.add_argument("--profile-steps", type=int, default=0, help="trace N train steps to OUTPUT_DIR/profile")
    parser.add_argument("--debug-nans", action="store_true", help="enable jax_debug_nans")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return parser


if __name__ == "__main__":
    main(get_parser().parse_args())
