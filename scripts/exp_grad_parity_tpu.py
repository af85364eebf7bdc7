"""On-chip gradient parity: full train-step losses+grads with the Pallas
RoIAlign (fwd and/or bwd kernels) vs the exact gather/XLA path, same params
and batch. Fingerprints which compiled kernel (if any) corrupts training.

Usage: python scripts/exp_grad_parity_tpu.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from openset_rcnn_tpu.config import get_default_cfg
from openset_rcnn_tpu.models import (
    ModelSpec,
    OpensetRCNNModule,
    compute_anchors,
    opendet_id_map,
    training_losses,
)
from openset_rcnn_tpu.structures import GroundTruth, ImageBatch

H, W = 160, 288
B, G = 2, 8


def build(cfg):
    spec = ModelSpec.from_cfg(cfg, opendet_id_map(4, 3))
    module = OpensetRCNNModule(spec=spec)
    params = jax.jit(
        lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))["params"]
    )()
    anchors_np, level_sizes = compute_anchors(spec, (H, W))
    anchors = jnp.asarray(anchors_np)

    def loss_fn(p, batch, rng_):
        losses = training_losses(module, p, batch, rng_, spec, anchors, level_sizes)
        return sum(losses.values()), losses

    return params, jax.jit(jax.value_and_grad(loss_fn, has_aux=True))


def main():
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    boxes = np.zeros((B, G, 4), np.float32)
    classes = np.zeros((B, G), np.int32)
    valid = np.zeros((B, G), bool)
    for b in range(B):
        n = 4
        xy = rng.uniform(0, 100, (n, 2))
        wh = rng.uniform(30, 120, (n, 2))
        boxes[b, :n] = np.concatenate([xy, xy + wh], 1)
        classes[b, :n] = rng.randint(0, 3, n)
        valid[b, :n] = True
    batch = ImageBatch(
        images=images,
        image_hw=jnp.asarray([[H, W]] * B, jnp.float32),
        gt=GroundTruth(jnp.asarray(boxes), jnp.asarray(classes), jnp.asarray(valid)),
    )
    key = jax.random.PRNGKey(1)

    def cfg_for(impl, bwd, matcher):
        cfg = get_default_cfg()
        cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
        cfg.MODEL.ROI_HEADS.NUM_KNOWN_CLASSES = 3
        cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 64
        cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 64
        cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 200
        cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 100
        cfg.MODEL.RPN.BBOX_REG_LOSS_TYPE = "iou"
        cfg.MODEL.RPN.DELTA_BIAS_INIT = 0.25
        cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
        cfg.TPU.ROI_ALIGN_IMPL = impl
        cfg.TPU.ROI_ALIGN_BWD = bwd
        cfg.TPU.RPN_MATCHER = matcher
        return cfg

    variants = [
        ("all_xla", "gather", "xla", "xla"),
        ("pallas_fwd_xla_bwd", "pallas", "xla", "xla"),
        ("pallas_fwd_bwd", "pallas", "pallas", "xla"),
        ("pallas_all", "pallas", "pallas", "pallas"),
        # opt-in bf16 gradient accumulators (round 4): bounded rounding
        ("pallas_bf16_rmw", "pallas", "pallas_bf16", "pallas"),
    ]
    ref = None
    for name, impl, bwd, matcher in variants:
        params, step = build(cfg_for(impl, bwd, matcher))
        (tot, losses), grads = step(params, batch, key)
        flat, _ = jax.tree_util.tree_flatten(
            jax.tree_util.tree_map(lambda g: np.asarray(g, np.float64), grads)
        )
        gnorm = float(np.sqrt(sum((g**2).sum() for g in flat)))
        print(f"{name}: total={float(tot):.6f} gnorm={gnorm:.6f} "
              + " ".join(f"{k}={float(v):.4f}" for k, v in sorted(losses.items())))
        if ref is None:
            ref = (float(tot), gnorm, flat)
        else:
            dt = abs(float(tot) - ref[0])
            rel = max(
                float(np.abs(a - b).max() / (np.abs(a).max() + 1e-12))
                for a, b in zip(flat, ref[2])
            )
            print(f"  vs all_xla: |dtotal|={dt:.2e} max rel grad err={rel:.2e}")


if __name__ == "__main__":
    main()
