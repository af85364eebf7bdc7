"""Pallas kernels under a multi-device mesh (VERDICT r2 item 3).

The engine registers its mesh (parallel.mesh.set_active_mesh) and the
kernel call-sites wrap their pallas_call in jax.shard_map over the 'data'
axis, so multi-chip training keeps the fused matcher + RoIAlign kernels
instead of silently falling back to XLA. These tests run the REAL wrapping
logic on the 8-virtual-device CPU mesh with the kernels in interpret mode
and assert the sharded kernel path equals the (GSPMD-sharded) XLA path —
per-shard semantic agreement, exactly what multi-chip TPU executes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openset_rcnn_tpu.parallel import make_mesh
from openset_rcnn_tpu.parallel.mesh import (
    active_mesh_ctx,
    data_shard_map,
    in_manual_mesh,
    pallas_device_local,
)
from openset_rcnn_tpu.structures import GroundTruth


def _gt_batch(rng, B=4, G=6, extent=200.0):
    xy = rng.uniform(0, extent, (B, G, 2)).astype(np.float32)
    wh = rng.uniform(10, 80, (B, G, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], -1)
    valid = rng.rand(B, G) < 0.8
    valid[:, 0] = True
    return GroundTruth(
        boxes=jnp.asarray(boxes),
        classes=jnp.zeros((B, G), jnp.int32),
        valid=jnp.asarray(valid),
    )


def test_manual_mesh_detection():
    mesh = make_mesh(data=4, model=2)
    assert not in_manual_mesh()
    seen = {}

    def inner(x):
        seen["manual"] = in_manual_mesh()
        seen["local"] = pallas_device_local()
        return x

    from jax.sharding import PartitionSpec as P

    jax.shard_map(inner, mesh=mesh, in_specs=P("data"), out_specs=P("data"))(
        jnp.zeros((8, 2))
    )
    assert seen == {"manual": True, "local": True}
    assert not pallas_device_local()  # 8 devices, outside shard_map


def test_rpn_targets_pallas_sharded_matches_xla(rng):
    """rpn_targets with the fused kernel shard_mapped over ('data','model')
    == the XLA matcher path on identical inputs (same RNG key => identical
    sampling given identical matcher outputs)."""
    from openset_rcnn_tpu.models.rpn import rpn_targets
    from openset_rcnn_tpu.ops.anchors import fpn_anchors

    anchors = jnp.asarray(
        np.concatenate(
            fpn_anchors((64, 96), (4, 8, 16, 32, 64), [[32], [64], [128], [256], [512]], [1.0]),
            0,
        )
    )
    gt = _gt_batch(rng, B=4)
    key = jax.random.PRNGKey(0)

    ref = rpn_targets(anchors, gt, key, use_pallas=False)
    mesh = make_mesh(data=4, model=2)
    with active_mesh_ctx(mesh):
        got = rpn_targets(anchors, gt, key, use_pallas=True)  # interpret on CPU

    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pool_features_pallas_sharded_matches_gather(rng):
    """pool_features(impl='pallas') self-wrapped in shard_map over the mesh
    == the GSPMD-sharded gather path (fwd and bwd), for boxes within the
    kernel's exact-parity envelope (aspect < 3.6)."""
    from openset_rcnn_tpu.models.roi_heads import pool_features

    B, C, S = 4, 8, 6
    feats = {
        f"p{i+2}": jnp.asarray(rng.randn(B, 64 // 2**i, 96 // 2**i, C).astype(np.float32))
        for i in range(4)
    }
    xy = rng.uniform(0, 120, (B, S, 2)).astype(np.float32)
    wh = rng.uniform(16, 60, (B, S, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))

    def run(impl, mesh):
        def fwd(fs, bx):
            return pool_features(fs, bx, resolution=7, sampling_ratio=2,
                                 impl=impl, bwd_impl="xla", pool_dtype=jnp.float32)

        with active_mesh_ctx(mesh):
            out, vjp = jax.vjp(lambda fs: fwd(fs, boxes), feats)
            (grads,) = vjp(jnp.ones_like(out))
        return out, grads

    mesh = make_mesh(data=4, model=2)
    ref_out, ref_gr = run("gather", None)
    got_out, got_gr = run("pallas", mesh)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out), rtol=1e-5, atol=1e-5)
    for k in feats:
        np.testing.assert_allclose(
            np.asarray(got_gr[k]), np.asarray(ref_gr[k]), rtol=1e-5, atol=1e-5
        )


def test_fused_cascade_sharded_matches_unsharded(rng):
    """The eval cascade shard_maps itself over the active mesh; results must
    equal the unsharded cascade bit-for-bit (same XLA NMS per image)."""
    from openset_rcnn_tpu.models.serving import fused_cascade
    from openset_rcnn_tpu.structures import RawDetections

    B, P, K = 8, 64, 3
    xy = rng.uniform(0, 100, (B, P, 2)).astype(np.float32)
    wh = rng.uniform(8, 40, (B, P, 2)).astype(np.float32)
    obj = jnp.asarray(rng.rand(B, P).astype(np.float32))
    raw = RawDetections(
        boxes=jnp.asarray(np.concatenate([xy, xy + wh], -1)),
        objectness=obj,
        pred_iou=obj,
        centerness=obj,
        min_dist=jnp.asarray(rng.rand(B, P).astype(np.float32)),
        pln_class=jnp.zeros((B, P), jnp.int32),
        known_probs=jnp.asarray(rng.rand(B, P, K).astype(np.float32)),
        valid=jnp.asarray(rng.rand(B, P) < 0.9),
    )
    kwargs = dict(unk_thr=0.4, known_topk=10, unknown_topk=10, unknown_id=K,
                  stage1_topk=32, max_known_candidates=64)

    ref = fused_cascade(raw, **kwargs)
    with active_mesh_ctx(make_mesh(data=4, model=2)):
        got = fused_cascade(raw, **kwargs)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
