"""Static-shape discipline: the jitted train step and the per-bucket eval
function compile exactly once and are reused across steps with fresh data
(SURVEY.md §4 item 3 — everything under jit is traced once; recompilation
mid-training would silently destroy TPU throughput)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openset_rcnn_tpu.config import get_default_cfg
from openset_rcnn_tpu.engine import build_optimizer, create_train_state, make_train_step
from openset_rcnn_tpu.models import (
    ModelSpec,
    OpensetRCNNModule,
    compute_anchors,
    opendet_id_map,
)
from openset_rcnn_tpu.structures import GroundTruth, ImageBatch

H, W = 64, 96


def tiny_cfg():
    cfg = get_default_cfg()
    cfg.OPENDET_BENCHMARK = True
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.ROI_HEADS.NUM_KNOWN_CLASSES = 3
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 32
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 50
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 50
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
    return cfg


def make_batch(rng, seed_boxes):
    return ImageBatch(
        images=jnp.asarray(rng.rand(2, H, W, 3).astype(np.float32) * 255),
        image_hw=jnp.asarray([[H, W]] * 2, jnp.float32),
        gt=GroundTruth(
            boxes=jnp.asarray(seed_boxes, jnp.float32),
            classes=jnp.zeros((2, 1), jnp.int32),
            valid=jnp.ones((2, 1), bool),
        ),
    )


def test_train_step_compiles_once():
    cfg = tiny_cfg()
    spec = ModelSpec.from_cfg(cfg, opendet_id_map(4, 3))
    module = OpensetRCNNModule(spec=spec)
    params = jax.jit(
        lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))["params"]
    )()
    anchors, level_sizes = compute_anchors(spec, (H, W))
    tx, sched = build_optimizer(cfg, params)
    state = create_train_state(params, tx)
    step_fn = jax.jit(make_train_step(module, tx, spec, anchors, level_sizes, sched))

    rng = np.random.RandomState(0)
    for i in range(3):  # fresh data + fresh rng key, same shapes
        batch = make_batch(rng, [[[4 + i, 4, 40, 40 + i]]] * 2)
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
    assert np.isfinite(float(metrics["total_loss"]))
    assert step_fn._cache_size() == 1, (
        f"train step recompiled: jit cache has {step_fn._cache_size()} entries"
    )


def test_compiled_inference_one_compile_per_bucket():
    from openset_rcnn_tpu.evaluation.postprocess import PostprocessConfig
    from openset_rcnn_tpu.evaluation.testing import CompiledInference

    cfg = tiny_cfg()
    spec = ModelSpec.from_cfg(cfg, opendet_id_map(4, 3))
    module = OpensetRCNNModule(spec=spec)
    params = jax.jit(
        lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))["params"]
    )()
    post_cfg = PostprocessConfig.from_cfg(cfg, True, None)
    infer = CompiledInference(module, params, spec, post_cfg=post_cfg)

    rng = np.random.RandomState(0)
    hw = jnp.asarray([[H, W]], jnp.float32)
    for _ in range(3):
        images = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32) * 255)
        out = infer(images, hw)
    assert len(infer._cache) == 1  # one bucket -> one compiled fn
    fn = infer._cache[(H, W)]
    cache_size = getattr(fn, "_cache_size", lambda: 1)()
    assert cache_size == 1, f"eval fn recompiled: {cache_size} cache entries"
    # a second bucket compiles separately and does not evict the first
    images2 = jnp.asarray(rng.rand(1, H, W * 2, 3).astype(np.float32) * 255)
    infer(images2, jnp.asarray([[H, W * 2]], jnp.float32))
    assert len(infer._cache) == 2
