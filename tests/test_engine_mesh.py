"""Engine-integrated multi-chip training (SURVEY.md §2.2).

Drives ``do_train`` itself (not make_train_step) over an 8-virtual-device
('data','model') mesh and checks the result against the single-device run:
GSPMD shards the SAME step program, so with the deterministic loader the
two trainings must agree up to float reassociation. This is the TPU-native
equivalent of the reference's DDP launch (ref train.py:201-205,287-294).
"""
import json
import os

import jax
import numpy as np
import pytest

from tests.test_e2e import make_cfg, register_synth


def _train(tmp_path, subdir, mesh_data, mesh_model, max_iter=10):
    from openset_rcnn_tpu.engine.train_loop import do_train

    cfg = make_cfg(tmp_path)
    cfg.OUTPUT_DIR = str(tmp_path / subdir)
    cfg.SOLVER.IMS_PER_BATCH = 4
    cfg.SOLVER.MAX_ITER = max_iter
    cfg.SOLVER.CHECKPOINT_PERIOD = 0
    cfg.TPU.MESH_DATA = mesh_data
    cfg.TPU.MESH_MODEL = mesh_model
    state = do_train(cfg)
    losses = {}
    with open(os.path.join(cfg.OUTPUT_DIR, "metrics.json")) as f:
        for line in f:
            rec = json.loads(line)
            if "total_loss" in rec:
                losses[rec["iteration"]] = rec["total_loss"]
    return state, losses


@pytest.mark.slow
def test_do_train_on_mesh_matches_single_device(tmp_path):
    register_synth(tmp_path)
    state1, losses1 = _train(tmp_path, "out_1dev", 1, 1)
    state8, losses8 = _train(tmp_path, "out_8dev", 4, 2)

    assert int(state1.step) == int(state8.step) == 10
    # the sharded params live on the mesh; pull to host for comparison
    p1 = jax.tree.map(np.asarray, state1.params)
    p8 = jax.tree.map(np.asarray, state8.params)
    leaves1, treedef1 = jax.tree.flatten(p1)
    leaves8, treedef8 = jax.tree.flatten(p8)
    assert treedef1 == treedef8
    for a, b in zip(leaves1, leaves8):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4)
    # loss at max_iter is evaluated on slightly-diverged params (float
    # reassociation compounds over the 10 SGD steps) — 1% tolerance
    for it, v in losses1.items():
        assert np.isclose(v, losses8[it], rtol=1e-2, atol=1e-2), (it, v, losses8[it])


def test_train_loader_deterministic(tmp_path):
    """Two loaders with the same seed yield identical first-k batches
    (order, composition, and augmentations), regardless of worker count."""
    from openset_rcnn_tpu.data import generate_synthetic_dataset
    from openset_rcnn_tpu.data.loader import TrainLoader
    from openset_rcnn_tpu.data.transforms import DetectionTransform

    records = generate_synthetic_dataset(
        str(tmp_path / "synth"), num_images=10, image_hw=(240, 320), num_classes=3, seed=0
    )
    tr = DetectionTransform(
        min_sizes=(128, 160),
        max_size=256,
        bucket_hw=(160, 288),
        max_gt=8,
        flip=True,
    )

    def first_k(num_workers, k=5):
        loader = TrainLoader(records, tr, batch_size=2, seed=3, num_workers=num_workers)
        out = []
        for (batch, meta), _ in zip(iter(loader), range(k)):
            out.append((np.asarray(batch.images), np.asarray(batch.gt.boxes), meta.image_ids))
        return out

    a = first_k(num_workers=1)
    b = first_k(num_workers=4)
    for (ia, ba, ids_a), (ib, bb, ids_b) in zip(a, b):
        assert ids_a == ids_b
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ba, bb)


def test_initialize_distributed_call_order(monkeypatch):
    """jax.distributed.initialize must run before any backend query
    (VERDICT r1 item 3): a real pod init is impossible here, so assert the
    call order with mocks."""
    from openset_rcnn_tpu.parallel import multihost

    calls = []
    monkeypatch.setattr(multihost, "_distributed_initialized", False)
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: calls.append(("init", kw))
    )
    real_pc = jax.process_count
    monkeypatch.setattr(
        jax, "process_count", lambda: calls.append(("process_count",)) or real_pc()
    )

    multihost.initialize_distributed("host:1234")
    assert calls and calls[0] == ("init", {"coordinator_address": "host:1234"}), calls
    assert ("process_count",) not in calls[: 1]

    # second call is a guarded no-op
    multihost.initialize_distributed("host:1234")
    assert sum(1 for c in calls if c[0] == "init") == 1


def test_train_loader_shards_compose_global_batch(tmp_path):
    """Block sharding: concatenating the per-shard batches reproduces the
    single-loader global batch exactly (ids, pixels, GT) — the property the
    2-process parity test (test_multiprocess.py) relies on."""
    from openset_rcnn_tpu.data import generate_synthetic_dataset
    from openset_rcnn_tpu.data.loader import TrainLoader
    from openset_rcnn_tpu.data.transforms import DetectionTransform

    records = generate_synthetic_dataset(
        str(tmp_path / "synth"), num_images=10, image_hw=(240, 320), num_classes=3, seed=0
    )
    tr = DetectionTransform(
        min_sizes=(128, 160), max_size=256, bucket_hw=(160, 288), max_gt=8, flip=True
    )

    def first_k(loader, k=4):
        out = []
        for (batch, meta), _ in zip(iter(loader), range(k)):
            out.append((np.asarray(batch.images), np.asarray(batch.gt.boxes), meta.image_ids))
        return out

    g = first_k(TrainLoader(records, tr, batch_size=4, seed=3))
    s0 = first_k(TrainLoader(records, tr, batch_size=2, seed=3, shard_id=0, num_shards=2))
    s1 = first_k(TrainLoader(records, tr, batch_size=2, seed=3, shard_id=1, num_shards=2))

    for (gi, gb, gids), (i0, b0, ids0), (i1, b1, ids1) in zip(g, s0, s1):
        assert ids0 + ids1 == gids
        np.testing.assert_array_equal(np.concatenate([i0, i1]), gi)
        np.testing.assert_array_equal(np.concatenate([b0, b1]), gb)


def test_train_loader_mixed_aspect_blocks_are_homogeneous(tmp_path):
    """Aspect grouping runs on record metadata: every emitted batch is
    bucket-homogeneous, both orientations flow, and the grouping decision
    is identical on every shard (no per-process divergence)."""
    from openset_rcnn_tpu.data import generate_synthetic_dataset
    from openset_rcnn_tpu.data.loader import TrainLoader
    from openset_rcnn_tpu.data.transforms import DetectionTransform

    land = generate_synthetic_dataset(
        str(tmp_path / "l"), num_images=6, image_hw=(240, 320), num_classes=3, seed=0
    )
    port = generate_synthetic_dataset(
        str(tmp_path / "p"), num_images=6, image_hw=(320, 240), num_classes=3, seed=1
    )
    for i, r in enumerate(port):  # unique ids across the merged set
        r["image_id"] = 100 + i
    records = land + port
    tr = DetectionTransform(
        min_sizes=(128,), max_size=256, bucket_hw=(160, 288), max_gt=8, flip=False
    )

    loader = TrainLoader(records, tr, batch_size=2, seed=5)
    seen = set()
    for (batch, meta), _ in zip(iter(loader), range(8)):
        assert meta.bucket_hw in ((160, 288), (288, 160))
        assert batch.images.shape[1:3] == meta.bucket_hw
        seen.add(meta.bucket_hw)
    assert seen == {(160, 288), (288, 160)}

    # shard composition matches the global stream for mixed aspects too
    g = [m.image_ids for (_, m), _ in zip(iter(TrainLoader(records, tr, 4, seed=5)), range(4))]
    s0 = [m.image_ids for (_, m), _ in zip(iter(TrainLoader(records, tr, 2, seed=5, shard_id=0, num_shards=2)), range(4))]
    s1 = [m.image_ids for (_, m), _ in zip(iter(TrainLoader(records, tr, 2, seed=5, shard_id=1, num_shards=2)), range(4))]
    for gb, a, b in zip(g, s0, s1):
        assert a + b == gb
