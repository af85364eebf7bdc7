"""Optimizer semantics + schedule + freeze masks."""
import jax
import jax.numpy as jnp
import numpy as np

from openset_rcnn_tpu.config import get_default_cfg
from openset_rcnn_tpu.engine import (
    build_optimizer,
    trainable_mask,
    warmup_multistep_schedule,
)


def test_warmup_multistep_schedule():
    s = warmup_multistep_schedule(0.005, (84000, 116000), 0.1, 400, 1e-3)
    assert np.isclose(float(s(jnp.asarray(0))), 0.005 * 1e-3)
    assert np.isclose(float(s(jnp.asarray(200))), 0.005 * (1e-3 + (1 - 1e-3) * 0.5))
    assert np.isclose(float(s(jnp.asarray(400))), 0.005)
    assert np.isclose(float(s(jnp.asarray(84000))), 0.0005)
    assert np.isclose(float(s(jnp.asarray(116000))), 0.00005)


def test_sgd_matches_torch_semantics():
    """One masked-SGD step == torch SGD(momentum, wd) by hand."""
    cfg = get_default_cfg()
    cfg.SOLVER.BASE_LR = 0.1
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.STEPS = (1000,)
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    params = {"w": jnp.asarray([1.0, -2.0])}
    tx, _ = build_optimizer(cfg, params)
    state = tx.init(params)
    g = {"w": jnp.asarray([0.5, 0.5])}

    # step 1: buf = g + wd*p ; p -= lr*buf
    upd, state = tx.update(g, state, params)
    import optax

    p1 = optax.apply_updates(params, upd)
    wd, lr, mu = 1e-4, 0.1, 0.9
    buf = np.asarray([0.5, 0.5]) + wd * np.asarray([1.0, -2.0])
    want = np.asarray([1.0, -2.0]) - lr * buf
    np.testing.assert_allclose(np.asarray(p1["w"]), want, rtol=1e-6)

    # step 2 with same grad: buf = mu*buf + (g + wd*p1)
    upd, state = tx.update(g, state, p1)
    p2 = optax.apply_updates(p1, upd)
    buf = mu * buf + (np.asarray([0.5, 0.5]) + wd * want)
    want2 = want - lr * buf
    np.testing.assert_allclose(np.asarray(p2["w"]), want2, rtol=1e-6)


def test_trainable_mask_freezes_bn_and_stages():
    params = {
        "backbone": {
            "stem_conv": {"kernel": 0},
            "stem_bn": {"scale": 0, "bias": 0, "mean": 0, "var": 0},
            "res2_block0": {"conv1": {"kernel": 0}, "bn1": {"scale": 0, "mean": 0, "var": 0, "bias": 0}},
            "res3_block0": {"conv1": {"kernel": 0}, "bn1": {"scale": 0, "mean": 0, "var": 0, "bias": 0}},
        },
        "rpn_head": {"conv": {"kernel": 0, "bias": 0}},
    }
    m = trainable_mask(params, freeze_at=2)
    assert m["backbone"]["stem_conv"]["kernel"] is False
    assert m["backbone"]["res2_block0"]["conv1"]["kernel"] is False
    assert m["backbone"]["res3_block0"]["conv1"]["kernel"] is True
    # FrozenBN params never train, regardless of stage
    assert m["backbone"]["res3_block0"]["bn1"]["scale"] is False
    assert m["rpn_head"]["conv"]["kernel"] is True


def test_frozen_params_get_zero_update():
    cfg = get_default_cfg()
    cfg.MODEL.BACKBONE.FREEZE_AT = 2
    cfg.SOLVER.WARMUP_ITERS = 0
    params = {
        "backbone": {
            "res2_block0": {"conv1": {"kernel": jnp.ones(3)}},
            "res3_block0": {"conv1": {"kernel": jnp.ones(3)}},
        }
    }
    tx, _ = build_optimizer(cfg, params)
    state = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    upd, _ = tx.update(g, state, params)
    assert float(jnp.abs(upd["backbone"]["res2_block0"]["conv1"]["kernel"]).sum()) == 0.0
    assert float(jnp.abs(upd["backbone"]["res3_block0"]["conv1"]["kernel"]).sum()) > 0.0
