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


def test_full_train_step_on_mesh_with_pallas_kernels(rng):
    """One GSPMD-jitted train step over the (4,2) virtual mesh with BOTH
    Pallas kernels forced on (fused matcher + RoIAlign fwd/bwd, interpret
    mode on CPU, shard_map'd inside grad) == the same step on the XLA
    paths — exactly the composition a multi-chip TPU training run executes."""
    from openset_rcnn_tpu.config import get_default_cfg
    from openset_rcnn_tpu.engine.optimizer import build_optimizer
    from openset_rcnn_tpu.engine.train_state import create_train_state, make_train_step
    from openset_rcnn_tpu.models import ModelSpec, OpensetRCNNModule, compute_anchors, opendet_id_map
    from openset_rcnn_tpu.parallel import batch_sharding, param_sharding, replicated
    from openset_rcnn_tpu.parallel.mesh import active_mesh_ctx
    from openset_rcnn_tpu.structures import GroundTruth, ImageBatch

    H, W, B = 96, 128, 4

    def cfg_for(matcher, align):
        cfg = get_default_cfg()
        cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
        cfg.MODEL.ROI_HEADS.NUM_KNOWN_CLASSES = 3
        cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
        cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 32
        cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 50
        cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
        cfg.TPU.RPN_MATCHER = matcher
        cfg.TPU.ROI_ALIGN_IMPL = align
        cfg.TPU.ROI_ALIGN_BWD = "pallas" if align == "pallas" else "xla"
        return cfg

    boxes = np.zeros((B, 4, 4), np.float32)
    classes = np.zeros((B, 4), np.int32)
    valid = np.zeros((B, 4), bool)
    for b in range(B):
        xy = rng.uniform(0, 60, (3, 2))
        wh = rng.uniform(12, 40, (3, 2))
        boxes[b, :3] = np.concatenate([xy, xy + wh], 1)
        classes[b, :3] = rng.randint(0, 3, 3)
        valid[b, :3] = True
    batch = ImageBatch(
        images=jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255),
        image_hw=jnp.asarray([[H, W]] * B, jnp.float32),
        gt=GroundTruth(jnp.asarray(boxes), jnp.asarray(classes), jnp.asarray(valid)),
    )
    key = jax.random.PRNGKey(0)

    def run(matcher, align, mesh):
        cfg = cfg_for(matcher, align)
        spec = ModelSpec.from_cfg(cfg, opendet_id_map(4, 3))
        module = OpensetRCNNModule(spec=spec)
        params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))["params"]
        anchors, level_sizes = compute_anchors(spec, (H, W))
        tx, sched = build_optimizer(cfg, params)
        state = create_train_state(params, tx)
        step = make_train_step(module, tx, spec, anchors, level_sizes, sched)
        with active_mesh_ctx(mesh):
            if mesh is not None:
                p_sh = param_sharding(state.params, mesh)
                st_sh = jax.tree.map(lambda _: replicated(mesh), state)
                st_sh = st_sh.replace(
                    params=p_sh,
                    opt_state=jax.tree.map(lambda _: replicated(mesh), state.opt_state),
                )
                state = jax.device_put(state, st_sh)
                fn = jax.jit(step, in_shardings=(st_sh, batch_sharding(mesh), replicated(mesh)))
            else:
                fn = jax.jit(step)
            new_state, metrics = fn(state, batch, key)
            return (
                {k: float(v) for k, v in metrics.items()},
                jax.tree.map(np.asarray, new_state.params),
            )

    mesh = make_mesh(data=4, model=2)
    ref_m, ref_p = run("xla", "gather", mesh)
    got_m, got_p = run("pallas", "pallas", mesh)

    # losses agree (RoIAlign pallas == gather for these tame boxes; the
    # fused matcher is exact) and the updated params match
    for k in ref_m:
        assert np.isclose(ref_m[k], got_m[k], rtol=1e-4, atol=1e-5), (k, ref_m[k], got_m[k])
    key_of = lambda kv: str(kv[0])
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(ref_p), key=key_of),
        sorted(jax.tree_util.tree_leaves_with_path(got_p), key=key_of),
    ):
        assert str(ka) == str(kb)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5, err_msg=str(ka))
