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


_SWIN_DEPTHS = {"T": (2, 2, 6, 2), "S": (2, 2, 18, 2), "B": (2, 2, 18, 2)}


def convert_swin_torch(path: str, params_template, size: str = "T", depths=None) -> Any:
    """Official Swin ImageNet checkpoint (microsoft/Swin-Transformer names:
    ``patch_embed.proj``, ``layers.{s}.blocks.{b}.attn.qkv`` …) -> the
    ``backbone`` subtree of our param tree (models/swin.py naming).

    Matches the mmdet fine-tuning recipe: the four output-stage LayerNorms
    (``out_norm{0..3}``) are NEW parameters with no ImageNet counterpart and
    keep their template init; the classification ``head``/final ``norm`` are
    dropped. The qkv layout ((3C, C) with [q;k;v] on the output axis, each
    head-major) and the patch-merging concat order (x[0::2,0::2],
    x[1::2,0::2], x[0::2,1::2], x[1::2,1::2]) are identical between the
    torch impl and ours, so plain (O, I) -> (I, O) transposes suffice.
    The relative_position_index buffer is recomputed (models/swin.py
    ``_rel_pos_index``), only the bias TABLE is converted.
    """
    src = path if isinstance(path, dict) else _load_torch_file(path)
    src = {
        k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        for k, v in src.items()
    }
    p = flax.serialization.to_state_dict(params_template)
    bb = p
    for k in ("params", "backbone"):  # accept full trees or bare variables
        if k in bb:
            bb = bb[k]
    loaded, missing = [], []

    def put(dst_path, value):
        node = bb
        for key in dst_path[:-1]:
            node = node[key]
        tmpl = node[dst_path[-1]]
        if np.shape(value) != tuple(np.shape(tmpl)):
            raise ValueError(f"{'.'.join(dst_path)}: shape {np.shape(value)} != {np.shape(tmpl)}")
        node[dst_path[-1]] = np.asarray(value).astype(np.asarray(tmpl).dtype)
        loaded.append(".".join(dst_path))

    def dense(src_name, dst_path, bias=True):
        if f"{src_name}.weight" not in src:
            missing.append(src_name)
            return
        put(dst_path + ["kernel"], _linear(src[f"{src_name}.weight"]))
        if bias and f"{src_name}.bias" in src:
            put(dst_path + ["bias"], src[f"{src_name}.bias"])

    def norm(src_name, dst_path):
        if f"{src_name}.weight" not in src:
            missing.append(src_name)
            return
        put(dst_path + ["scale"], src[f"{src_name}.weight"])
        put(dst_path + ["bias"], src[f"{src_name}.bias"])

    put(["patch_embed", "kernel"], _conv(src["patch_embed.proj.weight"]))
    put(["patch_embed", "bias"], src["patch_embed.proj.bias"])
    norm("patch_embed.norm", ["patch_norm"])

    for s, depth in enumerate(depths or _SWIN_DEPTHS[size]):
        for b in range(depth):
            t = f"layers.{s}.blocks.{b}"
            d = f"stage{s}_block{b}"
            norm(f"{t}.norm1", [d, "norm1"])
            dense(f"{t}.attn.qkv", [d, "attn", "qkv"])
            dense(f"{t}.attn.proj", [d, "attn", "proj"])
            put([d, "attn", "rel_bias_table"], src[f"{t}.attn.relative_position_bias_table"])
            norm(f"{t}.norm2", [d, "norm2"])
            dense(f"{t}.mlp.fc1", [d, "mlp_fc1"])
            dense(f"{t}.mlp.fc2", [d, "mlp_fc2"])
        if s < 3:
            norm(f"layers.{s}.downsample.norm", [f"downsample{s}", "norm"])
            dense(f"layers.{s}.downsample.reduction", [f"downsample{s}", "reduction"], bias=False)

    logger.info("Converted %d Swin tensors from %s (%d unmatched)", len(loaded), path, len(missing))
    if missing:
        logger.debug("unmatched: %s", missing)
    return flax.serialization.from_state_dict(params_template, p)


def _deconv(w) -> np.ndarray:
    """torch ConvTranspose2d weight (I, O, kh, kw) -> flax (kh, kw, I, O).

    flax ConvTranspose (lax.conv_transpose, transpose_kernel=False) places
    the kernel SPATIALLY MIRRORED relative to torch's gradient-of-conv
    semantics, so kh/kw are flipped (verified empirically: flipped mapping
    is exact to 0.0, unflipped is wrong)."""
    k = np.transpose(np.asarray(w), (2, 3, 0, 1))
    return np.ascontiguousarray(k[::-1, ::-1])


def convert_vit_torch(path, params_template, depth: int = 12, pos_grid=(14, 14)) -> Any:
    """ViT checkpoint (timm/MAE/ViTDet trunk naming: ``patch_embed.proj``,
    ``blocks.{i}.attn.qkv``, ``blocks.{i}.mlp.fc1`` …) -> the ``backbone``
    subtree of our param tree (models/vit.py naming).

    Mirrors :func:`convert_swin_torch`'s contract for the ViT stretch
    backbone (BASELINE configs[4]):

      * trunk tensors (patch embed, blocks, final norm) are converted with
        plain (O, I) -> (I, O) / conv transposes — the qkv output layout
        ([q;k;v] each head-major) matches between timm and models/vit.py;
      * ``pos_embed``: a pretrain table (1, 1+gh*gw, C) has its class token
        dropped and the (gh, gw, C) grid stored at the model's NATIVE
        ``pos_grid`` — a passthrough for the standard 224/16 pretrains
        (gh=gw=14), a torch-exact bicubic resize otherwise. The model then
        stretches the native table to each runtime grid inside the forward
        (models/vit.py), which IS d2 ViTDet's ``get_abs_pos``
        (modeling/backbone/utils.py) compiled to static matmuls;
      * simple-pyramid tensors (``simfp.*``: up2a/up2b deconvs and the
        p{2..5} conv/LN projections) convert when present (detection-format
        checkpoints); pretrain-only checkpoints leave them at template init
        — exactly how convert_swin_torch treats the out-stage norms.
    """
    src = path if isinstance(path, dict) else _load_torch_file(path)
    src = {
        k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        for k, v in src.items()
    }
    p = flax.serialization.to_state_dict(params_template)
    bb = p
    for k in ("params", "backbone"):  # accept full trees or bare variables
        if k in bb:
            bb = bb[k]
    loaded, missing = [], []

    def put(dst_path, value):
        node = bb
        for key in dst_path[:-1]:
            node = node[key]
        tmpl = node[dst_path[-1]]
        if np.shape(value) != tuple(np.shape(tmpl)):
            raise ValueError(
                f"{'.'.join(dst_path)}: shape {np.shape(value)} != {np.shape(tmpl)}"
            )
        node[dst_path[-1]] = np.asarray(value).astype(np.asarray(tmpl).dtype)
        loaded.append(".".join(dst_path))

    def dense(src_name, dst_path, bias=True):
        if f"{src_name}.weight" not in src:
            missing.append(src_name)
            return
        put(dst_path + ["kernel"], _linear(src[f"{src_name}.weight"]))
        if bias and f"{src_name}.bias" in src:
            put(dst_path + ["bias"], src[f"{src_name}.bias"])

    def norm(src_name, dst_path):
        if f"{src_name}.weight" not in src:
            missing.append(src_name)
            return
        put(dst_path + ["scale"], src[f"{src_name}.weight"])
        put(dst_path + ["bias"], src[f"{src_name}.bias"])

    put(["patch_embed", "kernel"], _conv(src["patch_embed.proj.weight"]))
    put(["patch_embed", "bias"], src["patch_embed.proj.bias"])

    pos = np.asarray(src["pos_embed"])
    if pos.ndim == 3 and pos.shape[0] == 1:  # (1, [1+]gh*gw, C) token table
        n, c = pos.shape[1], pos.shape[2]
        g = int(np.sqrt(n))
        if g * g != n:  # leading class token
            pos = pos[:, 1:]
            g = int(np.sqrt(pos.shape[1]))
            assert g * g == pos.shape[1], f"pos_embed length {n} not 1+k^2"
        pos = pos.reshape(g, g, c)
    if pos.shape[:2] != tuple(pos_grid):
        from ..models.vit import bicubic_resize_matrix

        # torch-exact bicubic (A=-0.75, half-pixel, clamped borders) — the
        # same matrices the model's forward uses for get_abs_pos parity
        wh = bicubic_resize_matrix(pos_grid[0], pos.shape[0])
        ww = bicubic_resize_matrix(pos_grid[1], pos.shape[1])
        pos = np.einsum("hH,HWc,wW->hwc", wh, pos.astype(np.float64), ww)
    put(["pos_embed"], pos)

    for i in range(depth):
        t = f"blocks.{i}"
        d = f"block{i}"
        norm(f"{t}.norm1", [d, "norm1"])
        dense(f"{t}.attn.qkv", [d, "attn", "qkv"])
        dense(f"{t}.attn.proj", [d, "attn", "proj"])
        norm(f"{t}.norm2", [d, "norm2"])
        dense(f"{t}.mlp.fc1", [d, "mlp_fc1"])
        dense(f"{t}.mlp.fc2", [d, "mlp_fc2"])
    norm("norm", ["norm"])

    # optional detection-format simple pyramid
    if "simfp.up2a.weight" in src:
        put(["up2a", "kernel"], _deconv(src["simfp.up2a.weight"]))
        put(["up2a", "bias"], src["simfp.up2a.bias"])
        put(["up2b", "kernel"], _deconv(src["simfp.up2b.weight"]))
        put(["up2b", "bias"], src["simfp.up2b.bias"])
        for l in (2, 3, 4, 5):
            for ci in (1, 2):
                put(
                    [f"p{l}_conv{ci}", "kernel"],
                    _conv(src[f"simfp.p{l}_conv{ci}.weight"]),
                )
                norm(f"simfp.p{l}_ln{ci}", [f"p{l}_ln{ci}"])

    logger.info(
        "Converted %d ViT tensors from %s (%d unmatched)",
        len(loaded), path if isinstance(path, str) else "<dict>", len(missing),
    )
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
