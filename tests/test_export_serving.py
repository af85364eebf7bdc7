"""jax.export round-trip of the fused serving cascade: serialize with baked
weights, deserialize in-process, and check outputs match the live jit."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_export_serving_roundtrip(tmp_path):
    from jax import export as jexport

    from export_serving import build_serving_fn
    from openset_rcnn_tpu.config import get_default_cfg

    cfg = get_default_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 81
    cfg.MODEL.ROI_HEADS.NUM_KNOWN_CLASSES = 20
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
    cfg.OPENDET_BENCHMARK = True
    cfg.TPU.TEST_BUCKET = (128, 160)
    cfg.freeze()

    infer, _ = build_serving_fn(cfg)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.uniform(0, 255, (2, 128, 160, 3)).astype(np.float32))
    hw = jnp.asarray([[120.0, 160.0], [128.0, 144.0]], jnp.float32)

    live = infer(images, hw)
    fn = infer._cache[(128, 160)]
    params = infer.params
    wrapped = jax.jit(lambda im, ihw: fn(params, im, ihw))
    blob = jexport.export(wrapped)(images, hw).serialize()
    assert len(blob) > 1000

    reloaded = jexport.deserialize(blob)
    out = reloaded.call(images, hw)
    # The deserialized artifact recompiles from StableHLO, so fusion order
    # (and thus float rounding) can differ at the last ulp — compare with a
    # small tolerance; int/bool outputs must survive exactly.
    # deserialized StableHLO goes through a fresh (AOT) compile whose
    # fusion/re-association differs slightly from the live jit; box coords
    # at ~1e2 px scale need the rel term to absorb that
    np.testing.assert_allclose(
        np.asarray(out.boxes), np.asarray(live.boxes), rtol=1e-3, atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(out.scores), np.asarray(live.scores), rtol=1e-4, atol=2e-3
    )
    np.testing.assert_array_equal(np.asarray(out.classes), np.asarray(live.classes))
    np.testing.assert_array_equal(np.asarray(out.valid), np.asarray(live.valid))


def test_export_serving_split_roundtrip(tmp_path):
    """The --split deployment artifacts (VERDICT r4 item 3): forward and
    cascade exported as TWO chained StableHLO programs — the crash-free
    configuration the eval harness runs — must reproduce the live fused
    output when chained."""
    from jax import export as jexport

    from export_serving import build_serving_fn, build_split_serving_fns
    from openset_rcnn_tpu.config import get_default_cfg

    cfg = get_default_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 81
    cfg.MODEL.ROI_HEADS.NUM_KNOWN_CLASSES = 20
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
    cfg.OPENDET_BENCHMARK = True
    cfg.TPU.TEST_BUCKET = (128, 160)
    cfg.freeze()

    infer, _ = build_serving_fn(cfg)
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.uniform(0, 255, (2, 128, 160, 3)).astype(np.float32))
    hw = jnp.asarray([[120.0, 160.0], [128.0, 144.0]], jnp.float32)

    live = infer(images, hw)
    fwd, casc = build_split_serving_fns(infer, (128, 160))

    blob_fwd = jexport.export(fwd)(images, hw).serialize()
    raw_shapes = jax.eval_shape(fwd, images, hw)
    blob_casc = jexport.export(casc)(*raw_shapes).serialize()
    assert len(blob_fwd) > 1000 and len(blob_casc) > 1000

    r_fwd = jexport.deserialize(blob_fwd)
    r_casc = jexport.deserialize(blob_casc)
    out = r_casc.call(*r_fwd.call(images, hw))
    # same tolerance rationale as the single-program round-trip above
    np.testing.assert_allclose(
        np.asarray(out.boxes), np.asarray(live.boxes), rtol=1e-3, atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(out.scores), np.asarray(live.scores), rtol=1e-4, atol=2e-3
    )
    np.testing.assert_array_equal(np.asarray(out.classes), np.asarray(live.classes))
    np.testing.assert_array_equal(np.asarray(out.valid), np.asarray(live.valid))
    np.testing.assert_array_equal(
        np.asarray(out.known_overflow), np.asarray(live.known_overflow)
    )
