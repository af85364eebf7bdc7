"""Open-set ROI heads, TPU-native.

Rebuilds the reference's second stage (modeling/roi_heads/):
  * ``OpensetROIHeads`` orchestration (osrcnn_roi_heads.py:26-329):
    gt-augmented proposal sampling recording matched IoU, RoIAlign 7x7 over
    P2-P5, 2xFC-1024 box head, then three parallel heads.
  * ``OpensetFastRCNNOutputLayers`` (osrcnn_fast_rcnn.py:148-450):
    class-agnostic box deltas + sigmoid IoU; smooth-L1 losses over
    foreground, normalized by total sampled count; inference objectness
    = geometric mean sqrt(pred_iou * centerness) (:444-450).
  * ``PLN`` (prototype_learning_network.py:17-234): linear encoder/decoder
    1024<->256, learnable prototypes, cosine-distance instance-contrastive
    loss with intra/inter/proto-separation hinges (:183-185), distance-based
    open-set inference.
  * ``SoftMaxClassifier`` (softmax_classifier.py:170-345): K+1-way linear
    classifier on decoder-reconstructed features.

All heads run batched over (B, S) fixed-size sampled ROI sets with validity
masks; padded rows contribute zero loss.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import (
    Box2BoxTransform,
    clip_boxes,
    match,
    multilevel_roi_align,
    multilevel_roi_align_batched,
    pairwise_iou,
    sample_balanced_indices,
    smooth_l1,
    softmax_cross_entropy,
)
from ..structures import GroundTruth, Proposals, RawDetections, SampledRois

_fc_init = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")  # caffe2 Xavier


class BoxHead(nn.Module):
    """FastRCNNConvFCHead equivalent: flatten + 2x FC-1024 + ReLU.

    ``compute_dtype`` runs the FC matmuls in bf16 (weights stay f32); the
    returned features are always f32 for the numerics-sensitive heads.
    """

    fc_dim: int = 1024
    num_fc: int = 2
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.reshape(x.shape[:-3] + (-1,))
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        for i in range(self.num_fc):
            x = nn.relu(
                nn.Dense(
                    self.fc_dim, kernel_init=_fc_init, name=f"fc{i + 1}",
                    dtype=self.compute_dtype,
                )(x)
            )
        return x.astype(jnp.float32)


class BoxIouPredictor(nn.Module):
    """Class-agnostic box deltas + sigmoid IoU prediction."""

    box_dim: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        deltas = nn.Dense(self.box_dim, kernel_init=nn.initializers.normal(0.001), name="bbox_pred")(x)
        iou = jax.nn.sigmoid(
            nn.Dense(1, kernel_init=nn.initializers.normal(0.01), name="iou_pred")(x)
        )
        return deltas, iou[..., 0]


class PLNHead(nn.Module):
    """Prototype Learning Network: encoder/decoder + learnable prototypes."""

    feature_dim: int = 1024
    embedding_dim: int = 256
    num_known_classes: int = 20
    reps_per_class: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        emb = nn.Dense(self.embedding_dim, kernel_init=nn.initializers.normal(0.01), name="encoder")(x)
        rec = nn.Dense(self.feature_dim, kernel_init=nn.initializers.normal(0.01), name="decoder")(emb)
        reps = self.param(
            "representatives",
            nn.initializers.normal(1.0),
            (self.num_known_classes * self.reps_per_class, self.embedding_dim),
        )
        return emb, rec, reps


class KnownClassifier(nn.Module):
    """(K_known + 1)-way linear classifier over reconstructed features."""

    num_known_classes: int = 20

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(
            self.num_known_classes + 1, kernel_init=nn.initializers.normal(0.01), name="cls_score"
        )(x)


# --------------------------------------------------------------------------
# Proposal labeling / sampling
# --------------------------------------------------------------------------

def _label_sample_one_image(
    prop_boxes, prop_scores, prop_valid,
    gt_boxes, gt_classes, gt_valid,
    key, num_samples, positive_fraction, iou_threshold, num_classes,
):
    # Append GT boxes to proposals (osrcnn_roi_heads.py:177-178); appended GT
    # gets objectness 1.0 (certainty), invalid GT rows stay masked out.
    boxes = jnp.concatenate([prop_boxes, gt_boxes], axis=0)
    scores = jnp.concatenate([prop_scores, jnp.where(gt_valid, 1.0, 0.0)], axis=0)
    valid = jnp.concatenate([prop_valid, gt_valid], axis=0)

    iou = pairwise_iou(gt_boxes, boxes)  # (G, P+G)
    res = match(iou, gt_valid, [iou_threshold], [0, 1], allow_low_quality_matches=False)
    matched_iou = jnp.max(jnp.where(gt_valid[:, None], iou, -1.0), axis=0)
    matched_iou = jnp.maximum(matched_iou, 0.0)

    has_gt = jnp.any(gt_valid)
    fg = (res.labels == 1) & valid & has_gt
    bg = (res.labels == 0) & valid

    s = sample_balanced_indices(fg, bg, num_samples, positive_fraction, key)
    idx = s.indices
    sel_classes = jnp.where(
        s.is_pos, gt_classes[res.matched_idx[idx]], jnp.int32(num_classes)
    )
    return SampledRois(
        boxes=boxes[idx],
        scores=scores[idx],
        gt_boxes=gt_boxes[res.matched_idx[idx]],
        gt_classes=jnp.where(s.valid, sel_classes, jnp.int32(num_classes)),
        ious=matched_iou[idx],
        is_fg=s.is_pos & s.valid,
        valid=s.valid,
    )


def label_and_sample_proposals(
    proposals: Proposals,
    gt: GroundTruth,
    key: jax.Array,
    num_samples: int = 512,
    positive_fraction: float = 0.25,
    iou_threshold: float = 0.5,
    num_classes: int = 80,
) -> SampledRois:
    B = proposals.boxes.shape[0]
    keys = jax.random.split(key, B)
    return jax.vmap(
        lambda pb, ps, pv, gb, gc, gv, k: _label_sample_one_image(
            pb, ps, pv, gb, gc, gv, k,
            num_samples, positive_fraction, iou_threshold, num_classes,
        )
    )(proposals.boxes, proposals.scores, proposals.valid, gt.boxes, gt.classes, gt.valid, keys)


# --------------------------------------------------------------------------
# Losses
# --------------------------------------------------------------------------

def box_iou_losses(
    pred_deltas: jnp.ndarray,  # (B, S, 4)
    pred_iou: jnp.ndarray,     # (B, S)
    rois: SampledRois,
    transform: Box2BoxTransform,
    num_classes: int,
    box_weight: float = 1.0,
    iou_weight: float = 1.0,
    box_smooth_l1_beta: float = 0.0,
    iou_smooth_l1_beta: float = 0.0,
    box_reg_loss_type: str = "smooth_l1",
) -> Dict[str, jnp.ndarray]:
    fg = rois.is_fg & (rois.gt_classes < num_classes)
    denom = jnp.maximum(jnp.sum(rois.valid), 1.0)

    if box_reg_loss_type == "smooth_l1":
        gt_deltas = transform.get_deltas(rois.boxes, rois.gt_boxes)
        per = smooth_l1(pred_deltas, gt_deltas, box_smooth_l1_beta)
        box_loss = jnp.sum(jnp.where(fg[..., None], per, 0.0))
    elif box_reg_loss_type in ("iou", "giou", "diou", "ciou"):
        from ..ops import dense_box_regression_loss

        pred_boxes = transform.apply_deltas(pred_deltas, rois.boxes)
        box_loss = dense_box_regression_loss(pred_boxes, rois.gt_boxes, fg, box_reg_loss_type)
    else:
        raise ValueError(box_reg_loss_type)

    iou_per = smooth_l1(pred_iou, rois.ious, iou_smooth_l1_beta)
    iou_loss = jnp.sum(jnp.where(fg, iou_per, 0.0))

    return {
        "loss_box_reg": box_weight * box_loss / denom,
        "loss_iou": iou_weight * iou_loss / denom,
    }


def pln_loss(
    emb: jnp.ndarray,        # (B, S, E) encoder output
    reps: jnp.ndarray,       # (Kr, E) raw prototypes
    rois: SampledRois,
    id_map: jnp.ndarray,     # (num_classes + 1,) contiguous id -> known index or -1
    num_known_classes: int,
    reps_per_class: int,
    alpha: float,
    beta: float,
    iou_threshold: float,
    loss_weight: float,
    distance_type: str = "COS",
) -> jnp.ndarray:
    B, S, E = emb.shape
    known_ids = id_map[rois.gt_classes]  # (B, S); -1 or known index; bg -> K
    fg = (
        (known_ids >= 0)
        & (known_ids < num_known_classes)
        & (rois.ious > iou_threshold)
        & rois.valid
    )

    x = emb.reshape(B * S, E)
    x = x * jax.lax.rsqrt(jnp.sum(x * x, -1, keepdims=True) + 1e-12)
    r = reps * jax.lax.rsqrt(jnp.sum(reps * reps, -1, keepdims=True) + 1e-12)

    if distance_type == "COS":
        dist = 1.0 - x @ r.T
        cdist = 1.0 - r @ r.T
    elif distance_type == "L2":
        dist = jnp.sqrt(jnp.clip(jnp.sum((x[:, None] - r[None]) ** 2, -1), 1e-12))
        cdist = jnp.sqrt(jnp.clip(jnp.sum((r[:, None] - r[None]) ** 2, -1), 1e-12))
    elif distance_type == "L1":
        dist = jnp.sum(jnp.abs(x[:, None] - r[None]), -1)
        cdist = jnp.sum(jnp.abs(r[:, None] - r[None]), -1)
    else:
        raise ValueError(distance_type)

    K, R = num_known_classes, reps_per_class
    min_dist = jnp.min(dist.reshape(-1, K, R), axis=2)  # (N, K)

    labels = jnp.clip(known_ids.reshape(-1), 0, K - 1)
    onehot = jax.nn.one_hot(labels, K, dtype=bool)
    intra = jnp.sum(jnp.where(onehot, min_dist, 0.0), axis=1)
    inter = jnp.min(jnp.where(onehot, 1000.0, min_dist), axis=1)

    # Prototype separation: min distance to another class's prototype.
    own = jnp.repeat(jnp.arange(K), R)
    same_class = own[:, None] == own[None, :]
    c_dist = jnp.min(jnp.where(same_class, 1000.0, cdist), axis=1)

    fg_flat = fg.reshape(-1)
    loss = (
        jnp.sum(jnp.where(fg_flat, jnp.maximum(intra - alpha, 0.0), 0.0))
        + jnp.sum(jnp.where(fg_flat, jnp.maximum(beta - inter, 0.0), 0.0))
        + jnp.sum(jnp.maximum(beta + alpha - c_dist, 0.0))
    )
    # Denominator: the reference divides by gt_classes.numel() = the TOTAL
    # number of sampled proposals across the batch, fg and bg alike
    # (prototype_learning_network.py:187). In the fixed-shape sampler a slot
    # is valid iff it holds one of those sampled proposals (d2
    # subsample_labels returns num_pos+num_neg <= S without padding,
    # ops/sampling.py:90-123), so sum(valid) == numel exactly — including
    # GT-sparse images where both fall short of B*S
    # (tests/test_matcher_sampling.py::test_pln_denominator_matches_numel).
    denom = jnp.maximum(jnp.sum(rois.valid), 1.0)
    return loss_weight * loss / denom


def classifier_loss(
    logits: jnp.ndarray,  # (B, S, K+1)
    rois: SampledRois,
    id_map: jnp.ndarray,
    cls_loss_weight: float,
) -> jnp.ndarray:
    labels = id_map[rois.gt_classes]  # bg -> K
    valid = rois.valid & (labels >= 0)
    return cls_loss_weight * softmax_cross_entropy(logits, jnp.clip(labels, 0), valid)


# --------------------------------------------------------------------------
# Pooling
# --------------------------------------------------------------------------

def pool_features(
    fpn_feats: Dict[str, jnp.ndarray],
    boxes: jnp.ndarray,  # (B, S, 4)
    in_features: Sequence[str] = ("p2", "p3", "p4", "p5"),
    strides: Sequence[int] = (4, 8, 16, 32),
    resolution: int = 7,
    sampling_ratio: int = 2,
    pool_dtype=jnp.bfloat16,
    impl: str = "gather",
    bwd_impl: str = "pallas",
) -> jnp.ndarray:
    # The RoIAlign gather/scatter pair is HBM-bandwidth bound and dominates
    # the device step time. impl="pallas" routes the forward through the
    # window-DMA kernel (~5x); the gather path pools in bf16 to halve its
    # traffic. Pooled features are promoted back to f32 before the FC head.
    feats = tuple(fpn_feats[f].astype(pool_dtype) for f in in_features)
    align = lambda fs, bx: multilevel_roi_align_batched(
        fs, bx, strides, out_size=resolution, sampling_ratio=sampling_ratio,
        impl=impl, bwd_impl=bwd_impl,
    )
    if impl == "pallas":
        # under an engine mesh the pallas_call must run per-device: wrap in
        # shard_map over the batch ('data') axis (identity when unsharded)
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import data_shard_map

        align = data_shard_map(align, in_specs=(P("data"), P("data")), out_specs=P("data"))
    out = align(feats, boxes)
    return out.astype(jnp.float32)  # (B, S, 7, 7, C)


# --------------------------------------------------------------------------
# Inference assembly (device part; host cascade in evaluation/postprocess.py)
# --------------------------------------------------------------------------

def raw_detections(
    proposals: Proposals,
    pred_deltas: jnp.ndarray,
    pred_iou: jnp.ndarray,
    emb: jnp.ndarray,
    reps: jnp.ndarray,
    known_logits: jnp.ndarray,
    image_hw: jnp.ndarray,
    transform: Box2BoxTransform,
    num_known_classes: int,
    reps_per_class: int,
    mean_type: str = "geometric",
    distance_type: str = "COS",
) -> RawDetections:
    boxes = transform.apply_deltas(pred_deltas, proposals.boxes)
    boxes = jax.vmap(clip_boxes)(boxes, image_hw)

    if mean_type == "geometric":
        objectness = jnp.sqrt(jnp.clip(pred_iou * proposals.scores, 0.0))
    else:
        objectness = 0.5 * (pred_iou + proposals.scores)

    B, P, E = emb.shape
    x = emb.reshape(B * P, E)
    x = x * jax.lax.rsqrt(jnp.sum(x * x, -1, keepdims=True) + 1e-12)
    r = reps * jax.lax.rsqrt(jnp.sum(reps * reps, -1, keepdims=True) + 1e-12)
    if distance_type == "COS":
        dist = 1.0 - x @ r.T
    elif distance_type == "L2":
        dist = jnp.sqrt(jnp.clip(jnp.sum((x[:, None] - r[None]) ** 2, -1), 1e-12))
    else:
        dist = jnp.sum(jnp.abs(x[:, None] - r[None]), -1)
    per_class = jnp.min(dist.reshape(B, P, num_known_classes, reps_per_class), axis=3)
    min_dist = jnp.min(per_class, axis=2)
    pln_class = jnp.argmin(per_class, axis=2).astype(jnp.int32)

    probs = jax.nn.softmax(known_logits, axis=-1)
    return RawDetections(
        boxes=boxes,
        objectness=objectness,
        pred_iou=pred_iou,
        centerness=proposals.scores,
        min_dist=min_dist,
        pln_class=pln_class,
        known_probs=probs,
        valid=proposals.valid,
    )
