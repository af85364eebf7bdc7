"""Data pipeline tests: transforms, buckets, loaders, registries."""
import os

import numpy as np
import pytest

from openset_rcnn_tpu.data import (
    DetectionTransform,
    EvalLoader,
    TrainLoader,
    generate_synthetic_dataset,
    resize_shortest_edge,
)
from openset_rcnn_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from openset_rcnn_tpu.data.coco import load_coco_instances
from openset_rcnn_tpu.data.graspnet_meta import (
    GRASPNET_CATEGORIES,
    GRASPNET_KNOWN_IDS,
    graspnet_metadata,
)


def test_resize_shortest_edge():
    assert resize_shortest_edge(480, 640, 800, 1333) == (800, 1067)
    # long side capped at 1333
    assert resize_shortest_edge(400, 1000, 800, 1333) == (533, 1333)
    assert resize_shortest_edge(640, 480, 800, 1333) == (1067, 800)


def test_graspnet_meta_tables():
    assert len(GRASPNET_CATEGORIES) == 88
    assert len(GRASPNET_KNOWN_IDS) == 28
    meta = graspnet_metadata()
    assert len(meta["thing_classes"]) == 88
    assert meta["thing_dataset_id_to_contiguous_id"][1] == 0


def test_transform_and_buckets(tmp_path, rng):
    records = generate_synthetic_dataset(str(tmp_path), num_images=4, image_hw=(200, 300))
    tr = DetectionTransform(
        min_sizes=(128,), max_size=256, bucket_hw=(160, 288), max_gt=10, flip=False
    )
    ex = tr(records[0], np.random.RandomState(0))
    assert ex.image.shape == (160, 288, 3)
    assert ex.image_hw == (128, 192)
    # padding region must be zero
    assert ex.image[:, 200:].sum() == 0.0
    # boxes scaled into resized coords and inside the image
    b = ex.boxes[ex.gt_valid]
    assert (b[:, 2] <= 192 + 1e-3).all() and (b[:, 3] <= 128 + 1e-3).all()


def test_flip_boxes(tmp_path):
    records = generate_synthetic_dataset(str(tmp_path), num_images=1, image_hw=(100, 100), seed=3)
    tr = DetectionTransform(
        min_sizes=(100,), max_size=200, bucket_hw=(128, 128), max_gt=10, flip=True
    )
    # force flip by trying seeds until one flips; verify box/image consistency
    for seed in range(20):
        r = np.random.RandomState(seed)
        ex = tr(records[0], r)
        b = ex.boxes[ex.gt_valid]
        assert (b[:, 2] > b[:, 0]).all()
        # box content check: each GT region is non-background
        img = ex.image
        for (x1, y1, x2, y2) in b.astype(int):
            patch = img[y1 + 1 : y2 - 1, x1 + 1 : x2 - 1]
            if patch.size:
                assert patch.max() > 40  # rectangle color, not background


def test_train_loader_batches(tmp_path):
    records = generate_synthetic_dataset(str(tmp_path), num_images=6, image_hw=(200, 300))
    tr = DetectionTransform(
        min_sizes=(128,), max_size=256, bucket_hw=(160, 288), max_gt=10, flip=True
    )
    loader = TrainLoader(records, tr, batch_size=2, num_workers=2)
    it = iter(loader)
    batch, meta = next(it)
    assert batch.images.shape == (2, 160, 288, 3)
    assert batch.gt.boxes.shape == (2, 10, 4)
    batch2, _ = next(it)
    assert batch2.images.shape == (2, 160, 288, 3)


def test_test_loader_covers_all(tmp_path):
    records = generate_synthetic_dataset(str(tmp_path), num_images=5, image_hw=(200, 300))
    tr = DetectionTransform(
        min_sizes=(128,), max_size=256, bucket_hw=(160, 288), max_gt=10, flip=False
    )
    loader = EvalLoader(records, tr, batch_size=1)
    ids = []
    for batch, meta in loader:
        ids.extend(meta.image_ids)
    assert sorted(ids) == [0, 1, 2, 3, 4]


def test_coco_loader_known_filter(tmp_path):
    data = {
        "images": [{"id": 1, "file_name": "a.png", "height": 10, "width": 10}],
        "categories": [{"id": 1, "name": "x"}, {"id": 2, "name": "y"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1, "bbox": [0, 0, 5, 5], "area": 25},
            {"id": 2, "image_id": 1, "category_id": 2, "bbox": [1, 1, 5, 5], "area": 25},
        ],
    }
    import json

    p = tmp_path / "ann.json"
    p.write_text(json.dumps(data))
    all_recs = load_coco_instances(str(p), str(tmp_path))
    assert len(all_recs[0]["annotations"]) == 2
    # training-style known filter keeps only category 1
    train_recs = load_coco_instances(str(p), str(tmp_path), keep_category_ids=[1])
    assert len(train_recs[0]["annotations"]) == 1
    assert train_recs[0]["annotations"][0]["dataset_category_id"] == 1
    # xywh -> xyxy
    assert train_recs[0]["annotations"][0]["bbox"] == [0, 0, 5, 5]


def test_builtin_registration():
    from openset_rcnn_tpu.data import register_builtin_datasets

    register_builtin_datasets("/nonexistent_root")
    names = DatasetCatalog.list()
    assert "graspnet_train" in names
    assert "voc_coco_20_40_test" in names
    assert "voc_2007_train" in names
    assert MetadataCatalog.get("graspnet_train").evaluator_type == "coco"
    assert MetadataCatalog.get("voc_coco_20_40_test").evaluator_type == "pascal_voc"


def test_uint8_transport_is_lossless(tmp_path, rng):
    """Images travel host->device as uint8 (4x less transfer); the device-
    side f32 widening in preprocess must make the model output bit-identical
    to feeding f32 directly."""
    import jax
    import jax.numpy as jnp

    from openset_rcnn_tpu.config import get_default_cfg
    from openset_rcnn_tpu.models import ModelSpec, OpensetRCNNModule, opendet_id_map

    records = generate_synthetic_dataset(str(tmp_path), num_images=1, image_hw=(80, 120))
    tr = DetectionTransform(
        min_sizes=(64,), max_size=96, bucket_hw=(64, 96), max_gt=4, flip=False
    )
    ex = tr(records[0], np.random.RandomState(0))
    assert ex.image.dtype == np.uint8

    cfg = get_default_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.ROI_HEADS.NUM_KNOWN_CLASSES = 3
    spec = ModelSpec.from_cfg(cfg, opendet_id_map(4, 3))
    module = OpensetRCNNModule(spec=spec)
    params = jax.jit(
        lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))["params"]
    )()

    feats_u8 = jax.jit(
        lambda im: module.apply({"params": params}, im, method=OpensetRCNNModule.features)
    )(jnp.asarray(ex.image[None]))
    feats_f32 = jax.jit(
        lambda im: module.apply({"params": params}, im, method=OpensetRCNNModule.features)
    )(jnp.asarray(ex.image[None].astype(np.float32)))
    for k in feats_u8:
        np.testing.assert_array_equal(np.asarray(feats_u8[k]), np.asarray(feats_f32[k]))
