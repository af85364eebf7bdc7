"""Golden forward parity through the torch-checkpoint converter.

An INDEPENDENT torch implementation of the reference's forward semantics
(d2 ResNet-50/FrozenBN stem+stages, FPN, CF-RPN head, 2-FC box head —
SURVEY.md §2.4, classification_free_rpn.py:142-162) runs a synthetic
d2-named state dict in NCHW; the same dict goes through
``convert_torch_checkpoint`` into our flax modules. Activations must match,
which pins down the converter's transposes/permutations AND our layers'
math (padding, FrozenBN folding, normalize, CHW flatten) jointly — the
checkpoint-parity oracle available without the released model zoo.
"""
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import flax.serialization

from openset_rcnn_tpu.config import get_default_cfg
from openset_rcnn_tpu.models import ModelSpec, OpensetRCNNModule, opendet_id_map
from openset_rcnn_tpu.utils.torch_weights import _STAGE_BLOCKS, convert_torch_checkpoint

from test_torch_converter import build_torch_dict


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cfg = get_default_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 81
    cfg.MODEL.ROI_HEADS.NUM_KNOWN_CLASSES = 20
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
    spec = ModelSpec.from_cfg(cfg, opendet_id_map(81, 20))
    module = OpensetRCNNModule(spec=spec)
    params = jax.jit(
        lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    )()

    rng = np.random.RandomState(7)
    src = build_torch_dict(params, rng)
    # Variance-scale the random weights so 50 layers of activations stay
    # O(1) (plain randn kernels explode by sqrt(fan_in) per layer).
    for k, w in src.items():
        if k.endswith(".weight") and w.ndim in (2, 4):
            src[k] = (w / np.sqrt(np.prod(w.shape[1:]))).astype(np.float32)
        if k.endswith(".running_mean"):
            src[k] = (w * 0.05).astype(np.float32)

    path = tmp_path_factory.mktemp("golden") / "model.pkl"
    with open(path, "wb") as f:
        pickle.dump({"model": src}, f)
    converted = convert_torch_checkpoint(str(path), params)
    return module, converted, src


# ---------------------------------------------------------------- torch ref

def _t(src, name):
    return torch.from_numpy(np.ascontiguousarray(src[name]))


def tconv(x, src, name, stride=1, pad=0):
    b = _t(src, f"{name}.bias") if f"{name}.bias" in src else None
    return F.conv2d(x, _t(src, f"{name}.weight"), b, stride=stride, padding=pad)


def tbn(x, src, name, eps=1e-5):
    """d2 FrozenBatchNorm2d: fixed stats+affine (layers/batch_norm.py)."""
    w = _t(src, f"{name}.norm.weight")[None, :, None, None]
    b = _t(src, f"{name}.norm.bias")[None, :, None, None]
    m = _t(src, f"{name}.norm.running_mean")[None, :, None, None]
    v = _t(src, f"{name}.norm.running_var")[None, :, None, None]
    return (x - m) / torch.sqrt(v + eps) * w + b


def torch_backbone(src, x):
    """d2 ResNet-50, stride_in_1x1, FrozenBN; returns {res2..res5} NCHW."""
    bu = "backbone.bottom_up"
    x = F.relu(tbn(tconv(x, src, f"{bu}.stem.conv1", 2, 3), src, f"{bu}.stem.conv1"))
    x = F.max_pool2d(x, 3, 2, 1)
    outs = {}
    for si, (stage, nblocks) in enumerate(_STAGE_BLOCKS.items()):
        for bi in range(nblocks):
            p = f"{bu}.{stage}.{bi}"
            stride = 2 if (bi == 0 and si > 0) else 1
            out = F.relu(tbn(tconv(x, src, f"{p}.conv1", stride), src, f"{p}.conv1"))
            out = F.relu(tbn(tconv(out, src, f"{p}.conv2", 1, 1), src, f"{p}.conv2"))
            out = tbn(tconv(out, src, f"{p}.conv3"), src, f"{p}.conv3")
            if bi == 0:
                sc = tbn(tconv(x, src, f"{p}.shortcut", stride), src, f"{p}.shortcut")
            else:
                sc = x
            x = F.relu(out + sc)
        outs[stage] = x
    return outs


def torch_fpn(src, res):
    """d2 FPN: 1x1 laterals, nearest x2 top-down, 3x3 outputs, P6 pool."""
    lats = [tconv(res[f"res{l}"], src, f"backbone.fpn_lateral{l}") for l in (2, 3, 4, 5)]
    tds = [lats[-1]]
    for lat in lats[-2::-1]:
        tds.append(lat + F.interpolate(tds[-1], scale_factor=2, mode="nearest"))
    tds = tds[::-1]
    outs = {
        f"p{l}": tconv(td, src, f"backbone.fpn_output{l}", 1, 1)
        for l, td in zip((2, 3, 4, 5), tds)
    }
    outs["p6"] = F.max_pool2d(outs["p5"], 1, 2)
    return outs


def torch_rpn_head(src, feat):
    """CF-RPN head (classification_free_rpn.py:142-162): 3x3 conv + ReLU,
    channel L2-normalize, 1x1 deltas + sigmoid centerness."""
    t = F.relu(tconv(feat, src, "proposal_generator.rpn_head.conv", 1, 1))
    t = F.normalize(t, dim=1)
    d = tconv(t, src, "proposal_generator.rpn_head.anchor_deltas")
    c = torch.sigmoid(tconv(t, src, "proposal_generator.rpn_head.centerness"))
    return d, c


def torch_box_head(src, pooled_nchw):
    """FastRCNNConvFCHead: CHW flatten + 2x FC + ReLU."""
    x = pooled_nchw.reshape(pooled_nchw.shape[0], -1)
    x = F.relu(F.linear(x, _t(src, "roi_heads.box_head.fc1.weight"),
                        _t(src, "roi_heads.box_head.fc1.bias")))
    x = F.relu(F.linear(x, _t(src, "roi_heads.box_head.fc2.weight"),
                        _t(src, "roi_heads.box_head.fc2.bias")))
    return x


# -------------------------------------------------------------------- tests

def test_backbone_fpn_activations_match(setup):
    module, params, src = setup
    rng = np.random.RandomState(0)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)

    want = torch_fpn(src, torch_backbone(src, torch.from_numpy(x.transpose(0, 3, 1, 2))))
    got = module.apply(
        {"params": params}, jnp.asarray(x),
        method=lambda m, xx: m.fpn(m.backbone(xx)),
    )
    for lvl in ("p2", "p3", "p4", "p5", "p6"):
        w = want[lvl].numpy().transpose(0, 2, 3, 1)
        g = np.asarray(got[lvl])
        np.testing.assert_allclose(g, w, rtol=2e-3, atol=2e-4, err_msg=lvl)


def test_rpn_head_activations_match(setup):
    module, params, src = setup
    rng = np.random.RandomState(1)
    feat = rng.randn(1, 16, 16, 256).astype(np.float32)

    d_t, c_t = torch_rpn_head(src, torch.from_numpy(feat.transpose(0, 3, 1, 2)))
    deltas, ctrs = module.apply(
        {"params": params}, [jnp.asarray(feat)],
        method=lambda m, fs: m.rpn_head(fs),
    )
    np.testing.assert_allclose(
        np.asarray(deltas[0]).reshape(-1, 4),
        d_t.numpy().transpose(0, 2, 3, 1).reshape(-1, 4),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ctrs[0]).reshape(-1),
        c_t.numpy().transpose(0, 2, 3, 1).reshape(-1),
        rtol=1e-4, atol=1e-6,
    )


def test_box_head_activations_match(setup):
    module, params, src = setup
    rng = np.random.RandomState(2)
    pooled = rng.randn(3, 7, 7, 256).astype(np.float32)  # ours: NHWC

    want = torch_box_head(src, torch.from_numpy(pooled.transpose(0, 3, 1, 2)))
    got = module.apply(
        {"params": params}, jnp.asarray(pooled),
        method=lambda m, p: m.box_head(p),
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5)


def _tlin(src, name, x):
    return F.linear(x, _t(src, f"{name}.weight"), _t(src, f"{name}.bias"))


def test_predictor_heads_activations_match(setup):
    """bbox_pred/iou_pred (osrcnn_fast_rcnn.py:204-264), PLN encoder/decoder
    (prototype_learning_network.py:67-73), cls_score (softmax_classifier.py:209)."""
    module, params, src = setup
    rng = np.random.RandomState(3)
    feat = torch.from_numpy(rng.randn(5, 1024).astype(np.float32))

    d_t = _tlin(src, "roi_heads.box_predictor.bbox_pred", feat)
    iou_t = torch.sigmoid(_tlin(src, "roi_heads.box_predictor.iou_pred", feat))[:, 0]
    deltas, iou = module.apply(
        {"params": params}, jnp.asarray(feat.numpy()), method=lambda m, f: m.box_predictor(f)
    )
    np.testing.assert_allclose(np.asarray(deltas), d_t.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(iou), iou_t.numpy(), rtol=1e-4, atol=1e-6)

    enc_t = _tlin(src, "roi_heads.dml.encoder", feat)
    rec_t = _tlin(src, "roi_heads.dml.decoder", enc_t)
    emb, rec, reps = module.apply(
        {"params": params}, jnp.asarray(feat.numpy()), method=lambda m, f: m.pln(f)
    )
    np.testing.assert_allclose(np.asarray(emb), enc_t.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rec), rec_t.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(reps), src["roi_heads.dml.representatives"], rtol=1e-6, atol=0
    )

    logits_t = _tlin(src, "roi_heads.softmaxcls.cls_score", rec_t)
    logits = module.apply(
        {"params": params}, rec, method=lambda m, r: m.classifier(r)
    )
    np.testing.assert_allclose(np.asarray(logits), logits_t.numpy(), rtol=1e-4, atol=1e-5)


def test_pln_distance_inference_matches_torch(setup):
    """Prototype distance verdict (prototype_learning_network.py:189-230):
    L2-normalized embeddings/prototypes, COS distance, min over reps then
    classes; compare raw_detections' min_dist/pln_class to torch math."""
    module, params, src = setup
    rng = np.random.RandomState(4)
    B, P, E = 2, 16, 256
    emb = rng.randn(B, P, E).astype(np.float32)
    reps = src["roi_heads.dml.representatives"]  # (20, 256)

    # torch oracle
    x = F.normalize(torch.from_numpy(emb.reshape(-1, E)), dim=1)
    r = F.normalize(torch.from_numpy(reps), dim=1)
    dist = 1.0 - x @ r.T  # (BP, 20)
    want_min = dist.min(dim=1).values.reshape(B, P)
    want_cls = dist.argmin(dim=1).reshape(B, P)

    from openset_rcnn_tpu.models.roi_heads import raw_detections
    from openset_rcnn_tpu.ops.box_transforms import Box2BoxTransform
    from openset_rcnn_tpu.structures import Proposals

    proposals = Proposals(
        boxes=jnp.asarray(rng.uniform(0, 50, (B, P, 4)).astype(np.float32)),
        scores=jnp.asarray(rng.uniform(0, 1, (B, P)).astype(np.float32)),
        valid=jnp.ones((B, P), bool),
    )
    raw = raw_detections(
        proposals,
        pred_deltas=jnp.zeros((B, P, 4)),
        pred_iou=jnp.asarray(rng.uniform(0, 1, (B, P)).astype(np.float32)),
        emb=jnp.asarray(emb),
        reps=jnp.asarray(reps),
        known_logits=jnp.zeros((B, P, 21)),
        image_hw=jnp.asarray([[64.0, 64.0]] * B),
        transform=Box2BoxTransform(),
        num_known_classes=20,
        reps_per_class=1,
    )
    np.testing.assert_allclose(np.asarray(raw.min_dist), want_min.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(raw.pln_class), want_cls.numpy())
