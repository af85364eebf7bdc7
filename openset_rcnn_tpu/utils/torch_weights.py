"""Torch/detectron2 checkpoint conversion -> flax params.

Lets our framework start from the reference's released artifacts
(SURVEY.md §5.4): the d2 model-zoo ImageNet init (caffe2-format
``R-50.pkl``) and trained Openset-RCNN ``model_*.pth`` checkpoints, so
metric parity can be checked against identical weights.

Layout conversions:
  * conv weight (O, I, kh, kw) -> (kh, kw, I, O);
  * linear weight (O, I) -> (I, O);
  * the first ROI-head FC consumes flattened RoI features — torch flattens
    (C, 7, 7) channel-major while we flatten (7, 7, C); the kernel rows are
    permuted accordingly;
  * FrozenBN: torch keeps weight/bias/running_mean/running_var; caffe2 pkl
    keeps fused scale/bias only (mean=0, var=1).
"""
from __future__ import annotations

import logging
import pickle
from typing import Any, Dict

import numpy as np
import flax.serialization
import jax.numpy as jnp

logger = logging.getLogger(__name__)


def _conv(w) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _linear(w) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (1, 0)))


def _linear_flatten_chw(w, channels: int, res: int) -> np.ndarray:
    """torch (out, C*res*res) -> ours (res*res*C, out)."""
    w = np.asarray(w)
    out = w.shape[0]
    w = w.reshape(out, channels, res, res).transpose(2, 3, 1, 0)
    return np.ascontiguousarray(w.reshape(res * res * channels, out))


_STAGE_BLOCKS = {"res2": 3, "res3": 4, "res4": 6, "res5": 3}


def _load_torch_file(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        model = data.get("model", data)
        return {k: np.asarray(v) for k, v in model.items() if isinstance(v, np.ndarray)}
    # .pth: needs torch (cpu build is in-image)
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    model = data.get("model", data)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in model.items()}


def _bn_entries(src, prefix: str) -> Dict[str, np.ndarray]:
    """d2-style FrozenBN (<prefix>.norm.*) or caffe2 (<prefix>_bn_{s,b})."""
    if f"{prefix}.norm.weight" in src:
        return {
            "scale": src[f"{prefix}.norm.weight"],
            "bias": src[f"{prefix}.norm.bias"],
            "mean": src[f"{prefix}.norm.running_mean"],
            "var": src[f"{prefix}.norm.running_var"],
        }
    raise KeyError(prefix)


def _caffe2_to_d2_names(src: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Rename caffe2 ImageNet-pkl keys into d2 backbone.bottom_up.* names."""
    out = {}
    branch_map = {"branch2a": "conv1", "branch2b": "conv2", "branch2c": "conv3", "branch1": "shortcut"}
    for k, v in src.items():
        if k == "conv1_w":
            out["backbone.bottom_up.stem.conv1.weight"] = v
        elif k in ("res_conv1_bn_s", "conv1_bn_s"):
            out["backbone.bottom_up.stem.conv1.norm.weight"] = v
        elif k in ("res_conv1_bn_b", "conv1_bn_b"):
            out["backbone.bottom_up.stem.conv1.norm.bias"] = v
        elif k.startswith("res") and ("branch" in k):
            # e.g. res2_0_branch2a_w  /  res2_0_branch2a_bn_s
            parts = k.split("_")
            stage, block = parts[0], parts[1]
            branch = parts[2]
            suffix = "_".join(parts[3:])
            conv = branch_map.get(branch)
            if conv is None:
                continue
            base = f"backbone.bottom_up.{stage}.{block}.{conv}"
            if suffix == "w":
                out[f"{base}.weight"] = v
            elif suffix == "bn_s":
                out[f"{base}.norm.weight"] = v
            elif suffix == "bn_b":
                out[f"{base}.norm.bias"] = v
    # caffe2 has fused stats: provide identity running stats
    for k in list(out.keys()):
        if k.endswith(".norm.weight"):
            base = k[: -len(".weight")]
            out.setdefault(f"{base}.running_mean", np.zeros_like(out[k]))
            out.setdefault(f"{base}.running_var", np.ones_like(out[k]))
    return out


def convert_torch_checkpoint(path: str, params_template) -> Any:
    """Map a reference checkpoint (d2 names) or caffe2 ImageNet pkl into our
    param tree. Missing entries keep template values (logged)."""
    src = _load_torch_file(path)
    if not any(k.startswith("backbone.") for k in src):
        src = _caffe2_to_d2_names(src)

    p = flax.serialization.to_state_dict(params_template)
    loaded, missing = [], []

    def put(dst_path, value, expect_shape=None):
        node = p
        for key in dst_path[:-1]:
            node = node[key]
        tmpl = node[dst_path[-1]]
        if value.shape != tuple(np.shape(tmpl)):
            raise ValueError(f"{'.'.join(dst_path)}: shape {value.shape} != {np.shape(tmpl)}")
        node[dst_path[-1]] = value.astype(np.asarray(tmpl).dtype)
        loaded.append(".".join(dst_path))

    def try_conv(src_name, dst_path, bias=True):
        if f"{src_name}.weight" in src:
            put(dst_path + ["kernel"], _conv(src[f"{src_name}.weight"]))
            if bias and f"{src_name}.bias" in src:
                put(dst_path + ["bias"], np.asarray(src[f"{src_name}.bias"]))
        else:
            missing.append(src_name)

    def try_bn(src_prefix, dst_path):
        try:
            entries = _bn_entries(src, src_prefix)
        except KeyError:
            missing.append(src_prefix + ".norm")
            return
        for k, v in entries.items():
            put(dst_path + [k], np.asarray(v))

    # ---- backbone ----
    bu = "backbone.bottom_up"
    try_conv(f"{bu}.stem.conv1", ["backbone", "stem_conv"], bias=False)
    try_bn(f"{bu}.stem.conv1", ["backbone", "stem_bn"])
    for stage, nblocks in _STAGE_BLOCKS.items():
        for b in range(nblocks):
            for ci in (1, 2, 3):
                try_conv(f"{bu}.{stage}.{b}.conv{ci}", ["backbone", f"{stage}_block{b}", f"conv{ci}"], bias=False)
                try_bn(f"{bu}.{stage}.{b}.conv{ci}", ["backbone", f"{stage}_block{b}", f"bn{ci}"])
            if f"{bu}.{stage}.{b}.shortcut.weight" in src:
                try_conv(f"{bu}.{stage}.{b}.shortcut", ["backbone", f"{stage}_block{b}", "shortcut"], bias=False)
                try_bn(f"{bu}.{stage}.{b}.shortcut", ["backbone", f"{stage}_block{b}", "shortcut_bn"])

    # ---- FPN ----
    for lvl in (2, 3, 4, 5):
        try_conv(f"backbone.fpn_lateral{lvl}", ["fpn", f"lateral_res{lvl}"])
        try_conv(f"backbone.fpn_output{lvl}", ["fpn", f"output_res{lvl}"])

    # ---- RPN head ----
    try_conv("proposal_generator.rpn_head.conv", ["rpn_head", "conv"])
    try_conv("proposal_generator.rpn_head.anchor_deltas", ["rpn_head", "anchor_deltas"])
    try_conv("proposal_generator.rpn_head.centerness", ["rpn_head", "centerness"])

    # ---- ROI heads ----
    if "roi_heads.box_head.fc1.weight" in src:
        fc1 = src["roi_heads.box_head.fc1.weight"]
        put(["box_head", "fc1", "kernel"], _linear_flatten_chw(fc1, channels=256, res=7))
        put(["box_head", "fc1", "bias"], np.asarray(src["roi_heads.box_head.fc1.bias"]))
        put(["box_head", "fc2", "kernel"], _linear(src["roi_heads.box_head.fc2.weight"]))
        put(["box_head", "fc2", "bias"], np.asarray(src["roi_heads.box_head.fc2.bias"]))
    for src_name, dst in [
        ("roi_heads.box_predictor.bbox_pred", ["box_predictor", "bbox_pred"]),
        ("roi_heads.box_predictor.iou_pred", ["box_predictor", "iou_pred"]),
        ("roi_heads.dml.encoder", ["pln", "encoder"]),
        ("roi_heads.dml.decoder", ["pln", "decoder"]),
        ("roi_heads.softmaxcls.cls_score", ["classifier", "cls_score"]),
    ]:
        if f"{src_name}.weight" in src:
            put(dst + ["kernel"], _linear(src[f"{src_name}.weight"]))
            put(dst + ["bias"], np.asarray(src[f"{src_name}.bias"]))
        else:
            missing.append(src_name)
    if "roi_heads.dml.representatives" in src:
        put(["pln", "representatives"], np.asarray(src["roi_heads.dml.representatives"]))

    logger.info("Converted %d tensors from %s (%d source groups unmatched)", len(loaded), path, len(missing))
    if missing:
        logger.debug("unmatched: %s", missing)
    return flax.serialization.from_state_dict(params_template, p)


def load_npz_into_params(path: str, params_template):
    """Flat 'a/b/c' keyed npz -> params tree."""
    data = np.load(path)
    p = flax.serialization.to_state_dict(params_template)
    for key in data.files:
        node = p
        parts = key.split("/")
        for k in parts[:-1]:
            node = node[k]
        node[parts[-1]] = data[key]
    return flax.serialization.from_state_dict(params_template, p)
