"""Torch/d2 checkpoint converter round-trip.

Builds a synthetic d2-named state dict FROM our param template (inverse
transposes), converts it back, and checks exact equality — validating the
name mapping, conv/linear transposes, and the fc1 CHW-flatten permutation.
"""
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openset_rcnn_tpu.config import get_default_cfg
from openset_rcnn_tpu.models import ModelSpec, OpensetRCNNModule, opendet_id_map
from openset_rcnn_tpu.utils.torch_weights import _STAGE_BLOCKS, convert_torch_checkpoint

import flax.serialization


@pytest.fixture(scope="module")
def params():
    cfg = get_default_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 81
    cfg.MODEL.ROI_HEADS.NUM_KNOWN_CLASSES = 20
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
    spec = ModelSpec.from_cfg(cfg, opendet_id_map(81, 20))
    module = OpensetRCNNModule(spec=spec)
    return jax.jit(
        lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    )()


def _rand_like(rng, tmpl):
    return rng.randn(*np.shape(tmpl)).astype(np.float32)


def build_torch_dict(params, rng):
    """Synthetic d2-format dict covering the whole model."""
    p = flax.serialization.to_state_dict(params)
    src = {}

    def conv(dst_name, node):
        src[f"{dst_name}.weight"] = np.transpose(_rand_like(rng, node["kernel"]), (3, 2, 0, 1))
        if "bias" in node:
            src[f"{dst_name}.bias"] = _rand_like(rng, node["bias"])

    def bn(dst_name, node):
        src[f"{dst_name}.norm.weight"] = _rand_like(rng, node["scale"])
        src[f"{dst_name}.norm.bias"] = _rand_like(rng, node["bias"])
        src[f"{dst_name}.norm.running_mean"] = _rand_like(rng, node["mean"])
        src[f"{dst_name}.norm.running_var"] = np.abs(_rand_like(rng, node["var"])) + 0.5

    def linear(dst_name, node):
        src[f"{dst_name}.weight"] = np.transpose(_rand_like(rng, node["kernel"]), (1, 0))
        src[f"{dst_name}.bias"] = _rand_like(rng, node["bias"])

    bu = "backbone.bottom_up"
    conv(f"{bu}.stem.conv1", p["backbone"]["stem_conv"])
    bn(f"{bu}.stem.conv1", p["backbone"]["stem_bn"])
    for stage, nblocks in _STAGE_BLOCKS.items():
        for b in range(nblocks):
            blk = p["backbone"][f"{stage}_block{b}"]
            for ci in (1, 2, 3):
                conv(f"{bu}.{stage}.{b}.conv{ci}", blk[f"conv{ci}"])
                bn(f"{bu}.{stage}.{b}.conv{ci}", blk[f"bn{ci}"])
            if "shortcut" in blk:
                conv(f"{bu}.{stage}.{b}.shortcut", blk["shortcut"])
                bn(f"{bu}.{stage}.{b}.shortcut", blk["shortcut_bn"])
    for lvl in (2, 3, 4, 5):
        conv(f"backbone.fpn_lateral{lvl}", p["fpn"][f"lateral_res{lvl}"])
        conv(f"backbone.fpn_output{lvl}", p["fpn"][f"output_res{lvl}"])
    conv("proposal_generator.rpn_head.conv", p["rpn_head"]["conv"])
    conv("proposal_generator.rpn_head.anchor_deltas", p["rpn_head"]["anchor_deltas"])
    conv("proposal_generator.rpn_head.centerness", p["rpn_head"]["centerness"])
    # fc1: torch flattens (C, 7, 7) channel-major
    fc1 = p["box_head"]["fc1"]
    out_dim = np.shape(fc1["kernel"])[1]
    src["roi_heads.box_head.fc1.weight"] = rng.randn(out_dim, 256 * 7 * 7).astype(np.float32)
    src["roi_heads.box_head.fc1.bias"] = _rand_like(rng, fc1["bias"])
    linear("roi_heads.box_head.fc2", p["box_head"]["fc2"])
    linear("roi_heads.box_predictor.bbox_pred", p["box_predictor"]["bbox_pred"])
    linear("roi_heads.box_predictor.iou_pred", p["box_predictor"]["iou_pred"])
    linear("roi_heads.dml.encoder", p["pln"]["encoder"])
    linear("roi_heads.dml.decoder", p["pln"]["decoder"])
    src["roi_heads.dml.representatives"] = _rand_like(rng, p["pln"]["representatives"])
    linear("roi_heads.softmaxcls.cls_score", p["classifier"]["cls_score"])
    return src


def test_converter_roundtrip(params, rng, tmp_path):
    src = build_torch_dict(params, rng)
    path = tmp_path / "model_final.pkl"
    with open(path, "wb") as f:
        pickle.dump({"model": src}, f)

    converted = convert_torch_checkpoint(str(path), params)
    c = flax.serialization.to_state_dict(converted)

    # conv kernels transposed correctly
    np.testing.assert_allclose(
        c["backbone"]["stem_conv"]["kernel"],
        np.transpose(src["backbone.bottom_up.stem.conv1.weight"], (2, 3, 1, 0)),
    )
    np.testing.assert_allclose(
        c["backbone"]["res3_block1"]["conv2"]["kernel"],
        np.transpose(src["backbone.bottom_up.res3.1.conv2.weight"], (2, 3, 1, 0)),
    )
    # bn stats mapped
    np.testing.assert_allclose(
        c["backbone"]["res2_block0"]["bn1"]["var"],
        src["backbone.bottom_up.res2.0.conv1.norm.running_var"],
    )
    # linear transpose
    np.testing.assert_allclose(
        c["pln"]["encoder"]["kernel"], src["roi_heads.dml.encoder.weight"].T
    )
    np.testing.assert_allclose(
        c["pln"]["representatives"], src["roi_heads.dml.representatives"]
    )
    # fc1 permutation: torch (out, C*7*7) chw-major -> ours (7*7*C, out)
    w = src["roi_heads.box_head.fc1.weight"]
    want = w.reshape(-1, 256, 7, 7).transpose(2, 3, 1, 0).reshape(7 * 7 * 256, -1)
    np.testing.assert_allclose(c["box_head"]["fc1"]["kernel"], want)


def test_fc1_permutation_semantics(rng):
    """The permuted fc1 must produce the same output on the same RoI patch
    flattened each framework's way."""
    C, P, O = 4, 3, 5
    w_torch = rng.randn(O, C * P * P).astype(np.float32)
    feat = rng.randn(P, P, C).astype(np.float32)  # ours: HWC
    # torch flattens CHW
    torch_out = w_torch @ feat.transpose(2, 0, 1).reshape(-1)
    ours_kernel = w_torch.reshape(O, C, P, P).transpose(2, 3, 1, 0).reshape(P * P * C, O)
    ours_out = feat.reshape(-1) @ ours_kernel
    np.testing.assert_allclose(torch_out, ours_out, rtol=1e-5)
