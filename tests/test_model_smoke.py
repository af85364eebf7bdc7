"""End-to-end model smoke tests on tiny shapes (CPU, jitted once)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openset_rcnn_tpu.config import get_default_cfg
from openset_rcnn_tpu.models import (
    ModelSpec,
    OpensetRCNNModule,
    compute_anchors,
    inference_forward,
    opendet_id_map,
    training_losses,
)
from openset_rcnn_tpu.structures import GroundTruth, ImageBatch

H, W = 64, 64
B, G = 1, 4
LOSS_KEYS = {"loss_rpn_loc", "loss_rpn_ctr", "loss_box_reg", "loss_iou", "loss_dml", "loss_cls"}


def tiny_cfg():
    cfg = get_default_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 81
    cfg.MODEL.ROI_HEADS.NUM_KNOWN_CLASSES = 20
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 32
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 100
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 50
    cfg.MODEL.RPN.BBOX_REG_LOSS_TYPE = "iou"
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
    return cfg


@pytest.fixture(scope="module")
def compiled():
    cfg = tiny_cfg()
    spec = ModelSpec.from_cfg(cfg, opendet_id_map(81, 20))
    module = OpensetRCNNModule(spec=spec)
    params = jax.jit(
        lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((B, H, W, 3)))["params"]
    )()
    anchors_np, level_sizes = compute_anchors(spec, (H, W))
    anchors = jnp.asarray(anchors_np)

    def loss_fn(p, batch, rng):
        losses = training_losses(module, p, batch, rng, spec, anchors, level_sizes)
        return sum(losses.values()), losses

    grad_step = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    infer = jax.jit(
        lambda p, im, hw: inference_forward(module, p, im, hw, spec, anchors, level_sizes)
    )
    return spec, module, params, grad_step, infer


def make_batch(rng, empty=False):
    images = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    boxes = np.zeros((B, G, 4), np.float32)
    classes = np.zeros((B, G), np.int32)
    valid = np.zeros((B, G), bool)
    if not empty:
        for b in range(B):
            n = 3
            xy = rng.uniform(0, 25, (n, 2))
            wh = rng.uniform(15, 35, (n, 2))
            boxes[b, :n] = np.concatenate([xy, xy + wh], 1)
            classes[b, :n] = rng.randint(0, 20, n)
            valid[b, :n] = True
    gt = GroundTruth(jnp.asarray(boxes), jnp.asarray(classes), jnp.asarray(valid))
    return ImageBatch(images=images, image_hw=jnp.asarray([[H, W]] * B, jnp.float32), gt=gt)


def test_losses_and_grads(compiled, rng):
    spec, module, params, grad_step, infer = compiled
    (total, losses), grads = grad_step(params, make_batch(rng), jax.random.PRNGKey(1))
    assert set(losses.keys()) == LOSS_KEYS
    for k, v in losses.items():
        v = float(v)
        assert np.isfinite(v) and v >= 0, f"{k}={v}"
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert float(jnp.abs(grads["rpn_head"]["conv"]["kernel"]).sum()) > 0
    assert float(jnp.abs(grads["pln"]["representatives"]).sum()) > 0
    assert float(jnp.abs(grads["backbone"]["res5_block0"]["conv1"]["kernel"]).sum()) > 0


def test_empty_gt_is_finite(compiled, rng):
    """Zero GT must yield finite losses/grads (SURVEY.md §7.3 item 7)."""
    spec, module, params, grad_step, infer = compiled
    (total, losses), grads = grad_step(params, make_batch(rng, empty=True), jax.random.PRNGKey(2))
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{k} not finite with empty GT"
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)


def test_inference_shapes(compiled, rng):
    spec, module, params, grad_step, infer = compiled
    batch = make_batch(rng)
    raw = infer(params, batch.images, batch.image_hw)
    P = raw.boxes.shape[1]
    assert raw.boxes.shape == (B, P, 4)
    assert raw.known_probs.shape == (B, P, 21)
    assert raw.min_dist.shape == (B, P)
    valid = np.asarray(raw.valid)
    obj = np.asarray(raw.objectness)[valid]
    assert np.isfinite(obj).all()
    assert (obj >= 0).all() and (obj <= 1.0 + 1e-6).all()
    # boxes are clipped to the input image
    bx = np.asarray(raw.boxes)[valid]
    assert (bx[:, 0] >= 0).all() and (bx[:, 2] <= W).all()
    assert (bx[:, 1] >= 0).all() and (bx[:, 3] <= H).all()


def test_bf16_compute_dtype(compiled, rng):
    """TPU.DTYPE=bfloat16 keeps params f32, yields finite losses/grads close
    to the f32 run, and actually lowers the trunk matmuls to bf16."""
    spec_f32, module_f32, params, grad_step_f32, _ = compiled
    cfg = tiny_cfg()
    cfg.TPU.DTYPE = "bfloat16"
    spec = ModelSpec.from_cfg(cfg, opendet_id_map(81, 20))
    module = OpensetRCNNModule(spec=spec)
    anchors_np, level_sizes = compute_anchors(spec, (H, W))
    anchors = jnp.asarray(anchors_np)

    # identical init: the bf16 spec must not change param shapes/dtypes
    p2 = jax.jit(
        lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((B, H, W, 3)))["params"]
    )()
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a.dtype == b.dtype == jnp.float32, params, p2)
    )
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a.shape == b.shape, params, p2)
    )

    def loss_fn(p, batch, rng_):
        losses = training_losses(module, p, batch, rng_, spec, anchors, level_sizes)
        return sum(losses.values()), losses

    grad_step = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    batch = make_batch(rng)
    (tot16, l16), g16 = grad_step(params, batch, jax.random.PRNGKey(1))
    (tot32, l32), _ = grad_step_f32(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(tot16))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree_util.tree_leaves(g16))
    # bf16 rounding moves losses a little, not a lot
    for k in l32:
        a, b = float(l16[k]), float(l32[k])
        assert abs(a - b) <= 0.15 * max(1.0, abs(b)), (k, a, b)
    # the backbone conv really runs in bf16 (dot dtype in the jaxpr)
    jaxpr = jax.make_jaxpr(lambda p, b_, r: loss_fn(p, b_, r)[0])(params, batch, jax.random.PRNGKey(1))
    assert "bf16" in str(jaxpr), "no bf16 op found in the traced train step"
