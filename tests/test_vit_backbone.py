"""ViT-B simple-FPN backbone swap under the same detector heads."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openset_rcnn_tpu.config import get_default_cfg
from openset_rcnn_tpu.models import ModelSpec, OpensetRCNNModule, opendet_id_map
from openset_rcnn_tpu.models.vit import ViTSimpleFPN, _window_partition, _window_unpartition


def test_window_roundtrip(rng):
    x = jnp.asarray(rng.randn(2, 10, 13, 8).astype(np.float32))
    win, hw_pad = _window_partition(x, 7)
    back = _window_unpartition(win, 7, hw_pad, (10, 13))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_vit_pyramid_shapes(rng):
    # tiny ViT for shape testing
    model = ViTSimpleFPN(embed_dim=32, depth=2, num_heads=2, window_size=2, max_grid=(8, 8))
    x = jnp.zeros((1, 64, 128, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["p2"].shape == (1, 16, 32, 256)
    assert out["p3"].shape == (1, 8, 16, 256)
    assert out["p4"].shape == (1, 4, 8, 256)
    assert out["p5"].shape == (1, 2, 4, 256)
    assert out["p6"].shape == (1, 1, 2, 256)


@pytest.mark.slow
def test_detector_with_vit_backbone(rng):
    cfg = get_default_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_vit_fpn_backbone"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 81
    cfg.MODEL.ROI_HEADS.NUM_KNOWN_CLASSES = 20
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 50
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
    spec = ModelSpec.from_cfg(cfg, opendet_id_map(81, 20))
    module = OpensetRCNNModule(spec=spec)
    H = W = 64
    params = jax.jit(
        lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))["params"]
    )()
    assert "patch_embed" in params["backbone"]

    from openset_rcnn_tpu.models import compute_anchors, training_losses
    from openset_rcnn_tpu.structures import GroundTruth, ImageBatch

    anchors, level_sizes = compute_anchors(spec, (H, W))
    gt = GroundTruth(
        boxes=jnp.asarray([[[5.0, 5.0, 30.0, 30.0]] + [[0.0] * 4] * 3]),
        classes=jnp.zeros((1, 4), jnp.int32),
        valid=jnp.asarray([[True, False, False, False]]),
    )
    batch = ImageBatch(
        images=jnp.ones((1, H, W, 3)),
        image_hw=jnp.asarray([[H, W]], jnp.float32),
        gt=gt,
    )
    losses = jax.jit(
        lambda p: training_losses(module, p, batch, jax.random.PRNGKey(1), spec,
                                  jnp.asarray(anchors), level_sizes)
    )(params)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
