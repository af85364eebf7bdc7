"""OpensetRCNN: the full two-stage open-set detector + jitted step builders.

TPU-native equivalent of d2's ``GeneralizedRCNN`` composed with the
reference's ``ClsFreeRPN`` + ``OpensetROIHeads``
(configs/Base-RCNN-FPN.yaml:2, SURVEY.md §3.1-3.2). The whole training
forward — preprocess, backbone, both stages, all six losses
{rpn_loc, rpn_ctr, box_reg, iou, dml, cls} — lives in ONE jitted
``train_step``; inference emits fixed-shape ``RawDetections`` consumed by the
host-side cascade (evaluation/postprocess.py).

Anchors are precomputed per static image bucket and constant-folded under
jit (SURVEY.md §2.3).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import Box2BoxTransform, Box2BoxTransformLinear
from ..ops.anchors import fpn_anchors
from ..structures import GroundTruth, ImageBatch, Proposals, RawDetections
from .fpn import FPN
from .resnet import ResNet
from .vit import ViTSimpleFPN
from .roi_heads import (
    BoxHead,
    BoxIouPredictor,
    KnownClassifier,
    PLNHead,
    box_iou_losses,
    classifier_loss,
    label_and_sample_proposals,
    pln_loss,
    pool_features,
    raw_detections,
)
from .rpn import ClsFreeRPNHead, rpn_losses, rpn_targets, select_proposals

RPN_STRIDES = (4, 8, 16, 32, 64)
ROI_STRIDES = (4, 8, 16, 32)


class ModelSpec(NamedTuple):
    """Static hyperparameters distilled from a CfgNode (hashable for jit)."""

    num_classes: int
    num_known_classes: int
    pixel_mean: Tuple[float, ...]
    pixel_std: Tuple[float, ...]
    anchor_sizes: Tuple[Tuple[float, ...], ...]
    anchor_aspect_ratios: Tuple[float, ...]
    # rpn
    rpn_batch_size: int
    rpn_positive_fraction: float
    rpn_obj_positive_fraction: float
    rpn_reg_thresholds: Tuple[float, float]
    rpn_obj_thresholds: Tuple[float, float]
    rpn_loc_weight: float
    rpn_ctr_weight: float
    rpn_box_reg_loss_type: str
    rpn_ctr_smooth_l1_beta: float
    pre_nms_topk_train: int
    pre_nms_topk_test: int
    min_box_size: float
    # roi
    roi_batch_size: int
    roi_positive_fraction: float
    roi_iou_threshold: float
    fc_dim: int
    pooler_resolution: int
    roi_sampling_ratio: int
    bbox_reg_weights: Tuple[float, ...]
    box_reg_loss_type: str
    box_smooth_l1_beta: float
    iou_smooth_l1_beta: float
    box_loss_weight: float
    iou_loss_weight: float
    cls_loss_weight: float
    mean_type: str
    # pln
    emd_dim: int
    distance_type: str
    reps_per_class: int
    pln_alpha: float
    pln_beta: float
    pln_iou_threshold: float
    pln_loss_weight: float
    unk_thr: float
    # mapping
    id_map: Tuple[int, ...]  # contiguous id (+bg) -> known index / -1
    # misc
    freeze_at: int
    compute_dtype: str
    remat: bool
    backbone_name: str
    rpn_delta_bias_init: float
    resnet_depth: int
    roi_align_impl: str
    roi_align_bwd: str = "pallas"
    swin_size: str = "T"
    swin_drop_path: float = 0.0
    vit_drop_path: float = 0.0
    rpn_matcher: str = "auto"  # auto|pallas|xla (TPU.RPN_MATCHER)

    @staticmethod
    def from_cfg(cfg, id_map: Sequence[int]) -> "ModelSpec":
        m = cfg.MODEL
        return ModelSpec(
            num_classes=m.ROI_HEADS.NUM_CLASSES,
            num_known_classes=m.ROI_HEADS.NUM_KNOWN_CLASSES,
            pixel_mean=tuple(m.PIXEL_MEAN),
            pixel_std=tuple(m.PIXEL_STD),
            anchor_sizes=tuple(tuple(s) for s in m.ANCHOR_GENERATOR.SIZES),
            anchor_aspect_ratios=tuple(m.ANCHOR_GENERATOR.ASPECT_RATIOS[0]),
            rpn_batch_size=m.RPN.BATCH_SIZE_PER_IMAGE,
            rpn_positive_fraction=m.RPN.POSITIVE_FRACTION,
            rpn_obj_positive_fraction=m.RPN.POSITIVE_FRACTION_OBJECTNESS,
            rpn_reg_thresholds=tuple(m.RPN.IOU_THRESHOLDS),
            rpn_obj_thresholds=tuple(m.RPN.IOU_THRESHOLDS_OBJECTNESS),
            rpn_loc_weight=m.RPN.BBOX_REG_LOSS_WEIGHT * m.RPN.LOSS_WEIGHT,
            rpn_ctr_weight=m.RPN.CTR_REG_LOSS_WEIGHT * m.RPN.LOSS_WEIGHT,
            rpn_box_reg_loss_type=m.RPN.BBOX_REG_LOSS_TYPE,
            rpn_ctr_smooth_l1_beta=m.RPN.CTR_SMOOTH_L1_BETA,
            pre_nms_topk_train=m.RPN.PRE_NMS_TOPK_TRAIN,
            pre_nms_topk_test=m.RPN.PRE_NMS_TOPK_TEST,
            min_box_size=float(m.PROPOSAL_GENERATOR.MIN_SIZE),
            roi_batch_size=m.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
            roi_positive_fraction=m.ROI_HEADS.POSITIVE_FRACTION,
            roi_iou_threshold=m.ROI_HEADS.IOU_THRESHOLDS[0],
            fc_dim=m.ROI_BOX_HEAD.FC_DIM,
            pooler_resolution=m.ROI_BOX_HEAD.POOLER_RESOLUTION,
            roi_sampling_ratio=cfg.TPU.ROI_SAMPLING_RATIO,
            bbox_reg_weights=tuple(m.ROI_BOX_HEAD.BBOX_REG_WEIGHTS),
            box_reg_loss_type=m.ROI_BOX_HEAD.BBOX_REG_LOSS_TYPE,
            box_smooth_l1_beta=m.ROI_BOX_HEAD.SMOOTH_L1_BETA,
            iou_smooth_l1_beta=m.ROI_BOX_HEAD.IOU_SMOOTH_L1_BETA,
            box_loss_weight=m.ROI_BOX_HEAD.BBOX_REG_LOSS_WEIGHT,
            iou_loss_weight=m.ROI_BOX_HEAD.IOU_REG_LOSS_WEIGHT,
            cls_loss_weight=m.ROI_BOX_HEAD.CLS_LOSS_WEIGHT,
            mean_type=m.ROI_HEADS.MEAN_TYPE,
            emd_dim=m.PLN.EMD_DIM,
            distance_type=m.PLN.DISTANCE_TYPE,
            reps_per_class=m.PLN.REPS_PER_CLASS,
            pln_alpha=m.PLN.ALPHA,
            pln_beta=m.PLN.BETA,
            pln_iou_threshold=m.PLN.IOU_THRESHOLD,
            pln_loss_weight=m.PLN.LOSS_WEIGHT,
            unk_thr=m.PLN.UNK_THR,
            id_map=tuple(int(i) for i in id_map),
            freeze_at=m.BACKBONE.FREEZE_AT,
            compute_dtype=cfg.TPU.DTYPE,
            remat=cfg.TPU.get("REMAT", False),
            backbone_name=m.BACKBONE.NAME,
            rpn_delta_bias_init=m.RPN.get("DELTA_BIAS_INIT", 0.0),
            resnet_depth=m.RESNETS.DEPTH,
            swin_size=m.SWIN.SIZE,
            swin_drop_path=m.SWIN.get("DROP_PATH_RATE", 0.0),
            vit_drop_path=(
                m.VIT.get("DROP_PATH_RATE", 0.0) if "VIT" in m else 0.0
            ),
            roi_align_impl=cfg.TPU.get("ROI_ALIGN_IMPL", "auto"),
            roi_align_bwd=cfg.TPU.get("ROI_ALIGN_BWD", "pallas"),
            rpn_matcher=cfg.TPU.get("RPN_MATCHER", "auto"),
        )


def opendet_id_map(num_classes: int, num_known: int) -> List[int]:
    """OpenDet benchmark mapping (softmax_classifier.py:223-229): contiguous
    ids < num_known map to themselves, background (num_classes) -> num_known,
    everything else -> -1."""
    out = [-1] * (num_classes + 1)
    for i in range(num_known):
        out[i] = i
    out[num_classes] = num_known
    return out


def known_ids_id_map(num_classes: int, known_contiguous_ids: Sequence[int]) -> List[int]:
    """GraspNet-style mapping (softmax_classifier.py:231-245): sorted known
    contiguous ids map to 0..K-1, background -> K, others -> -1."""
    out = [-1] * (num_classes + 1)
    for i, v in enumerate(sorted(known_contiguous_ids)):
        out[v] = i
    out[num_classes] = len(known_contiguous_ids)
    return out


class OpensetRCNNModule(nn.Module):
    """Flax module holding all parameters; pure functions do the rest."""

    spec: ModelSpec

    def setup(self):
        dtype = jnp.bfloat16 if self.spec.compute_dtype == "bfloat16" else jnp.float32
        num_anchors = len(self.spec.anchor_aspect_ratios) * len(self.spec.anchor_sizes[0])
        if self.spec.backbone_name == "build_vit_fpn_backbone":
            # ViTDet-style trunk emits the pyramid directly (models/vit.py)
            self.backbone = ViTSimpleFPN(
                compute_dtype=dtype, drop_path_rate=self.spec.vit_drop_path
            )
            self.fpn = None
        elif self.spec.backbone_name == "build_swin_fpn_backbone":
            from .swin import SwinTransformer

            self.backbone = SwinTransformer(
                size=self.spec.swin_size,
                compute_dtype=dtype,
                drop_path_rate=self.spec.swin_drop_path,
            )
            self.fpn = FPN(out_channels=256, compute_dtype=dtype)
        else:
            self.backbone = ResNet(
                depth=self.spec.resnet_depth, compute_dtype=dtype, remat=self.spec.remat
            )
            self.fpn = FPN(out_channels=256, compute_dtype=dtype)
        head_dt = dtype if dtype != jnp.float32 else None
        self.rpn_head = ClsFreeRPNHead(
            conv_dim=256, num_anchors=num_anchors,
            delta_bias_init=self.spec.rpn_delta_bias_init,
            compute_dtype=head_dt,
        )
        self.box_head = BoxHead(fc_dim=self.spec.fc_dim, compute_dtype=head_dt)
        self.box_predictor = BoxIouPredictor()
        self.pln = PLNHead(
            feature_dim=self.spec.fc_dim,
            embedding_dim=self.spec.emd_dim,
            num_known_classes=self.spec.num_known_classes,
            reps_per_class=self.spec.reps_per_class,
        )
        self.classifier = KnownClassifier(num_known_classes=self.spec.num_known_classes)

    def preprocess(
        self, images: jnp.ndarray, image_hw: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        # The loader ships uint8 pixels (4x less host->device traffic than
        # f32; the decoded/resized image is uint8 anyway — reference
        # semantics, d2 DatasetMapper keeps uint8 until the model). The
        # widening cast runs on device and fuses into the normalize.
        #
        # Padding semantics: d2 normalizes FIRST, then ImageList.from_tensors
        # pads with 0.0 (GeneralizedRCNN.preprocess_image), so the reference's
        # pad region is exactly 0.0 post-normalization (= the mean pixel).
        # Our loader pads the uint8 buffer with 0, which would normalize to
        # -mean/std (~ -100 with PIXEL_STD=1) — a large spurious border
        # inside every conv receptive field near the image edge. Masking the
        # pad region back to 0.0 reproduces d2's pad value exactly. The one
        # remaining (unavoidable, static-shape) difference is canvas SIZE:
        # d2 pads to /32 of the per-batch max, we pad to the bucket; d2
        # itself changes edge features when batch composition changes the
        # canvas, so pad value — not canvas — is the load-bearing semantic.
        mean = jnp.asarray(self.spec.pixel_mean)
        std = jnp.asarray(self.spec.pixel_std)
        x = (images.astype(jnp.float32) - mean) / std
        if image_hw is not None:
            H, W = images.shape[1:3]
            ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
            xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
            m = (ys < image_hw[:, 0][:, None, None]) & (
                xs < image_hw[:, 1][:, None, None]
            )
            x = jnp.where(m[..., None], x, 0.0)
        return x

    def features(
        self, images: jnp.ndarray, image_hw: Optional[jnp.ndarray] = None
    ) -> Dict[str, jnp.ndarray]:
        x = self.preprocess(images, image_hw)
        if self.fpn is None:
            return self.backbone(x)
        return self.fpn(self.backbone(x))

    def rpn_predictions(self, fpn_feats, in_features=("p2", "p3", "p4", "p5", "p6")):
        feats = [fpn_feats[f] for f in in_features]
        deltas, ctrs = self.rpn_head(feats)
        level_sizes = [d.shape[1] for d in deltas]
        return jnp.concatenate(deltas, 1), jnp.concatenate(ctrs, 1), level_sizes

    def roi_forward(self, fpn_feats, boxes):
        impl = self.spec.roi_align_impl
        if impl == "auto":
            from ..parallel.mesh import active_mesh, pallas_device_local

            # on TPU whenever the kernel can run on one device's shard —
            # single chip, inside shard_map, or under an engine mesh
            # (pool_features then shard_maps the call over 'data')
            impl = (
                "pallas"
                if jax.default_backend() == "tpu"
                and (pallas_device_local() or active_mesh() is not None)
                else "gather"
            )
        pooled = pool_features(
            fpn_feats,
            boxes,
            resolution=self.spec.pooler_resolution,
            sampling_ratio=self.spec.roi_sampling_ratio,
            impl=impl,
            bwd_impl=self.spec.roi_align_bwd,
        )
        feats = self.box_head(pooled)                      # (B, S, fc_dim)
        deltas, iou = self.box_predictor(feats)            # (B, S, 4), (B, S)
        emb, rec, reps = self.pln(feats)                   # (B,S,E), (B,S,F), (Kr,E)
        logits = self.classifier(rec)                      # (B, S, K+1)
        return feats, deltas, iou, emb, rec, reps, logits

    def __call__(self, images: jnp.ndarray):
        """Parameter-initialization path: touch every submodule."""
        fpn_feats = self.features(images)
        deltas, ctrs, level_sizes = self.rpn_predictions(fpn_feats)
        dummy_boxes = jnp.tile(jnp.asarray([[0.0, 0.0, 32.0, 32.0]]), (images.shape[0], 8, 1))
        return self.roi_forward(fpn_feats, dummy_boxes)


def compute_anchors(spec: ModelSpec, image_hw: Tuple[int, int]) -> Tuple[np.ndarray, List[int]]:
    per_level = fpn_anchors(
        image_hw, RPN_STRIDES, spec.anchor_sizes, spec.anchor_aspect_ratios
    )
    sizes = [a.shape[0] for a in per_level]
    return np.concatenate(per_level, 0), sizes


def training_losses(
    module: OpensetRCNNModule,
    params,
    batch: ImageBatch,
    rng: jax.Array,
    spec: ModelSpec,
    anchors: jnp.ndarray,
    level_sizes: Sequence[int],
) -> Dict[str, jnp.ndarray]:
    """All six reference losses for one batch (SURVEY.md §3.1)."""
    losses, _ = training_losses_and_stats(
        module, params, batch, rng, spec, anchors, level_sizes
    )
    return losses


def training_losses_and_stats(
    module: OpensetRCNNModule,
    params,
    batch: ImageBatch,
    rng: jax.Array,
    spec: ModelSpec,
    anchors: jnp.ndarray,
    level_sizes: Sequence[int],
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Losses plus the reference's EventStorage training scalars
    (SURVEY.md §5.5): RPN pos/neg anchor counts
    (classification_free_rpn.py:459-463), proposal counts (:549-554), ROI
    fg/bg sample counts (osrcnn_roi_heads.py:225-228), and classifier
    accuracy stats (softmax_classifier.py:18-45)."""
    rpn_key, roi_key = jax.random.split(rng)
    linear_tf = Box2BoxTransformLinear(normalize_by_size=True)
    roi_tf = Box2BoxTransform(spec.bbox_reg_weights)
    # stochastic-depth stream (Swin drop-path); fold_in keeps the existing
    # rpn/roi sampling streams unchanged. Inference never passes rngs, so
    # drop-path is a train-only effect.
    fwd_rngs = (
        {"dropout": jax.random.fold_in(rng, 7)}
        if spec.swin_drop_path > 0 or spec.vit_drop_path > 0
        else None
    )

    def fwd(p):
        fpn_feats = module.apply(
            {"params": p}, batch.images, batch.image_hw,
            method=OpensetRCNNModule.features, rngs=fwd_rngs,
        )
        deltas, ctrs, _ = module.apply(
            {"params": p}, fpn_feats, method=OpensetRCNNModule.rpn_predictions
        )
        return fpn_feats, deltas, ctrs

    fpn_feats, pred_deltas, pred_ctr = fwd(params)

    # --- RPN losses (targets are stop-gradient by construction) ---
    targets = rpn_targets(
        anchors, batch.gt, rpn_key,
        batch_size_per_image=spec.rpn_batch_size,
        positive_fraction=spec.rpn_positive_fraction,
        objectness_positive_fraction=spec.rpn_obj_positive_fraction,
        reg_thresholds=spec.rpn_reg_thresholds,
        obj_thresholds=spec.rpn_obj_thresholds,
        use_pallas={"auto": None, "pallas": True, "xla": False}[spec.rpn_matcher],
    )
    losses = rpn_losses(
        anchors, pred_deltas, pred_ctr, targets, linear_tf,
        batch_size_per_image=spec.rpn_batch_size,
        loc_weight=spec.rpn_loc_weight,
        ctr_weight=spec.rpn_ctr_weight,
        box_reg_loss_type=spec.rpn_box_reg_loss_type,
        ctr_smooth_l1_beta=spec.rpn_ctr_smooth_l1_beta,
    )

    # --- Proposals (treated as constants for the second stage, ref :574-577) ---
    proposals = select_proposals(
        anchors,
        jax.lax.stop_gradient(pred_deltas),
        jax.lax.stop_gradient(pred_ctr),
        level_sizes,
        batch.image_hw,
        linear_tf,
        pre_topk=spec.pre_nms_topk_train,
        min_box_size=spec.min_box_size,
    )

    rois = label_and_sample_proposals(
        proposals, batch.gt, roi_key,
        num_samples=spec.roi_batch_size,
        positive_fraction=spec.roi_positive_fraction,
        iou_threshold=spec.roi_iou_threshold,
        num_classes=spec.num_classes,
    )

    _, deltas, iou, emb, rec, reps, logits = module.apply(
        {"params": params}, fpn_feats, rois.boxes, method=OpensetRCNNModule.roi_forward
    )

    losses.update(
        box_iou_losses(
            deltas, iou, rois, roi_tf, spec.num_classes,
            box_weight=spec.box_loss_weight,
            iou_weight=spec.iou_loss_weight,
            box_smooth_l1_beta=spec.box_smooth_l1_beta,
            iou_smooth_l1_beta=spec.iou_smooth_l1_beta,
            box_reg_loss_type=spec.box_reg_loss_type,
        )
    )
    id_map = jnp.asarray(spec.id_map, jnp.int32)
    losses["loss_dml"] = pln_loss(
        emb, reps, rois, id_map,
        spec.num_known_classes, spec.reps_per_class,
        spec.pln_alpha, spec.pln_beta, spec.pln_iou_threshold,
        spec.pln_loss_weight, spec.distance_type,
    )
    losses["loss_cls"] = classifier_loss(logits, rois, id_map, spec.cls_loss_weight)

    # --- training scalars (device-side; fetched with the loss dict) ---
    B = batch.images.shape[0]
    stats = {
        "rpn/num_pos_anchors": jnp.sum(targets.reg_labels == 1) / B,
        "rpn/num_neg_anchors": jnp.sum(targets.reg_labels == 0) / B,
        "rpn/obj_num_pos_anchors": jnp.sum(targets.obj_labels == 1) / B,
        "rpn/obj_num_neg_anchors": jnp.sum(targets.obj_labels == 0) / B,
        "rpn/num_proposals": jnp.sum(proposals.valid) / B,
        "roi_head/num_fg_samples": jnp.sum(rois.is_fg) / B,
        "roi_head/num_bg_samples": jnp.sum(rois.valid & ~rois.is_fg) / B,
    }
    # classifier accuracy over sampled ROIs (softmax_classifier.py:18-45)
    labels = id_map[rois.gt_classes]
    pred = jnp.argmax(logits, axis=-1)
    valid = rois.valid & (labels >= 0)
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    fg = valid & (labels < spec.num_known_classes)
    n_fg = jnp.maximum(jnp.sum(fg), 1)
    stats["softmax_classifier/cls_accuracy"] = jnp.sum((pred == labels) & valid) / n_valid
    stats["softmax_classifier/fg_cls_accuracy"] = jnp.sum((pred == labels) & fg) / n_fg
    stats["softmax_classifier/false_negative"] = (
        jnp.sum((pred == spec.num_known_classes) & fg) / n_fg
    )
    return losses, stats


def inference_forward(
    module: OpensetRCNNModule,
    params,
    images: jnp.ndarray,
    image_hw: jnp.ndarray,
    spec: ModelSpec,
    anchors: jnp.ndarray,
    level_sizes: Sequence[int],
) -> RawDetections:
    """Device part of inference; the host cascade finishes it."""
    linear_tf = Box2BoxTransformLinear(normalize_by_size=True)
    roi_tf = Box2BoxTransform(spec.bbox_reg_weights)

    fpn_feats = module.apply(
        {"params": params}, images, image_hw, method=OpensetRCNNModule.features
    )
    pred_deltas, pred_ctr, _ = module.apply(
        {"params": params}, fpn_feats, method=OpensetRCNNModule.rpn_predictions
    )
    proposals = select_proposals(
        anchors, pred_deltas, pred_ctr, level_sizes, image_hw, linear_tf,
        pre_topk=spec.pre_nms_topk_test, min_box_size=spec.min_box_size,
    )
    _, deltas, iou, emb, rec, reps, logits = module.apply(
        {"params": params}, fpn_feats, proposals.boxes, method=OpensetRCNNModule.roi_forward
    )
    return raw_detections(
        proposals, deltas, iou, emb, reps, logits, image_hw, roi_tf,
        spec.num_known_classes, spec.reps_per_class,
        mean_type=spec.mean_type, distance_type=spec.distance_type,
    )
