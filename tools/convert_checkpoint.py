#!/usr/bin/env python
"""Convert a reference torch/d2 checkpoint (or caffe2 ImageNet pkl) into an
Orbax checkpoint loadable via MODEL.WEIGHTS.

    python tools/convert_checkpoint.py --config-file configs/VOC-COCO/openset_rcnn_R50_FPN_128k.yaml \
        --src model_final.pth --dst out/converted
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--src", required=True, help=".pth / .pkl checkpoint")
    p.add_argument("--dst", required=True, help="output orbax directory")
    p.add_argument(
        "--swin",
        action="store_true",
        help="src is an official Swin ImageNet checkpoint (backbone only)",
    )
    p.add_argument(
        "--vit",
        action="store_true",
        help="src is a timm/MAE ViT checkpoint (trunk only; pos_embed is "
        "bicubically resized into the static table)",
    )
    args = p.parse_args()

    import jax
    import flax.serialization
    import orbax.checkpoint as ocp

    from openset_rcnn_tpu.config import get_default_cfg
    from openset_rcnn_tpu.engine.train_loop import build_model_spec, build_module_and_params
    from openset_rcnn_tpu.utils.torch_weights import convert_torch_checkpoint

    cfg = get_default_cfg()
    cfg.merge_from_file(args.config_file)
    spec = build_model_spec(cfg)
    module, params = build_module_and_params(cfg, spec)
    if args.swin:
        from openset_rcnn_tpu.utils.torch_weights import convert_swin_torch

        converted = convert_swin_torch(args.src, params, size=cfg.MODEL.SWIN.SIZE)
    elif args.vit:
        from openset_rcnn_tpu.utils.torch_weights import convert_vit_torch

        converted = convert_vit_torch(args.src, params)
    else:
        converted = convert_torch_checkpoint(args.src, params)
    ocp.PyTreeCheckpointer().save(
        os.path.abspath(args.dst),
        {"params": flax.serialization.to_state_dict(converted)},
        force=True,
    )
    print(f"wrote {args.dst}; use MODEL.WEIGHTS {args.dst}")


if __name__ == "__main__":
    main()
