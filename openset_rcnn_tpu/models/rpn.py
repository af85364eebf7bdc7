"""Classification-Free RPN (CF-RPN), TPU-native.

Rebuilds the reference's ``ClsFreeRPNHead`` / ``ClsFreeRPN``
(modeling/proposal_generator/classification_free_rpn.py:50-610) as a flax
head module plus pure batched functions:

  * head: shared 3x3 conv + ReLU, channel-L2-normalize, then 1x1 convs for
    ltrb anchor deltas and sigmoid centerness (ref :142-162). There is no
    objectness classifier — localization quality replaces it.
  * targets: ONE IoU matrix feeds TWO matchers (box-regression [0.3, 0.7],
    objectness [0.1, 0.3], both with low-quality rescue; ref :290-295),
    independent balanced subsampling (256/img; pos-frac 0.5 reg, 1.0 ctr)
    and FCOS-style centerness targets (ref :393-402).
  * losses: IoU loss on sampled positives + L1 centerness on sampled
    pos+neg, both / (256 * N) (ref :465-489).
  * proposal selection: per-level top-k by centerness, concat, clip,
    validity-mask empty/non-finite boxes, NO NMS (find_top_proposals.py:
    63-127 — the NMS stage is disabled in the reference).

Everything is fixed-shape: GT is padded (G, mask), per-image work is vmapped,
and "filtering" is masking.
"""
from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import (
    Box2BoxTransformLinear,
    centerness_targets,
    clip_boxes,
    nonempty,
    pairwise_iou,
    smooth_l1,
    subsample_labels,
)
from ..structures import GroundTruth, Proposals


class ClsFreeRPNHead(nn.Module):
    """Per-level head, weights shared across FPN levels.

    ``delta_bias_init`` > 0 starts decoded boxes at a positive size, which
    removes the IoU loss's zero-area gradient saddle when training from
    scratch (the reference inits bias 0 and escapes it over its 128k-iter
    ImageNet-warm-started schedule; keep 0.0 for parity).
    """

    conv_dim: int = 256
    num_anchors: int = 1
    box_dim: int = 4
    delta_bias_init: float = 0.0
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        init = nn.initializers.normal(0.01)
        dt = self.compute_dtype
        conv = nn.Conv(
            self.conv_dim, (3, 3), padding=((1, 1), (1, 1)), kernel_init=init,
            name="conv", dtype=dt,
        )
        delta_conv = nn.Conv(
            self.num_anchors * self.box_dim,
            (1, 1),
            kernel_init=init,
            bias_init=nn.initializers.constant(self.delta_bias_init),
            name="anchor_deltas",
            dtype=dt,
        )
        ctr_conv = nn.Conv(self.num_anchors, (1, 1), kernel_init=init, name="centerness", dtype=dt)

        deltas, ctrs = [], []
        for x in feats:
            if dt is not None:
                x = x.astype(dt)
            t = nn.relu(conv(x))
            # L2-normalize over channels before the prediction convs (ref :159).
            # Accumulate the squared norm in f32 (256-term bf16 sums lose
            # mantissa), apply the scale in the compute dtype.
            sq = jnp.sum(jnp.square(t.astype(jnp.float32)), axis=-1, keepdims=True)
            t = t * jax.lax.rsqrt(sq + 1e-12).astype(t.dtype)
            d = delta_conv(t)  # (B, H, W, A*4)
            c = jax.nn.sigmoid(ctr_conv(t).astype(jnp.float32))  # (B, H, W, A)
            B = d.shape[0]
            deltas.append(d.reshape(B, -1, self.box_dim).astype(jnp.float32))
            ctrs.append(c.reshape(B, -1).astype(jnp.float32))
        return deltas, ctrs


class RPNTargets(NamedTuple):
    reg_labels: jnp.ndarray    # (B, R) in {-1, 0, 1} after sampling
    matched_boxes: jnp.ndarray # (B, R, 4)
    obj_labels: jnp.ndarray    # (B, R) in {-1, 0, 1} after sampling
    gt_centerness: jnp.ndarray # (B, R)


def _bin_labels(max_iou: jnp.ndarray, rescued: jnp.ndarray, thresholds) -> jnp.ndarray:
    """3-bin matcher labels {0, -1, 1} from fused matcher outputs (same
    semantics as ops.matcher.match with labels [0, -1, 1] and low-quality
    rescue; empty-GT images fall out naturally because max_iou is -1)."""
    out = jnp.zeros(max_iou.shape, jnp.int32)
    out = jnp.where(max_iou >= thresholds[0], jnp.int32(-1), out)
    out = jnp.where(max_iou >= thresholds[1], jnp.int32(1), out)
    return jnp.where(rescued, jnp.int32(1), out)


def _match_one_image(anchors, gt_boxes, gt_valid):
    """XLA fallback of the fused kernel: (max_iou, matched_idx, rescued)."""
    iou = pairwise_iou(gt_boxes, anchors)  # (G, R)
    masked = jnp.where(gt_valid[:, None], iou, -1.0)
    max_iou = jnp.max(masked, axis=0)
    matched_idx = jnp.argmax(masked, axis=0).astype(jnp.int32)
    best_per_gt = jnp.max(masked, axis=1, keepdims=True)
    tie = (masked == best_per_gt) & (best_per_gt > 0) & gt_valid[:, None]
    return max_iou, matched_idx, jnp.any(tie, axis=0)


def _sample_one_image(
    anchors, gt_boxes, max_iou, matched_idx, rescued, key,
    batch_size_per_image, positive_fraction, objectness_positive_fraction,
    reg_thresholds, obj_thresholds, matched_boxes=None,
):
    k_reg, k_obj = jax.random.split(key)
    reg_raw = _bin_labels(max_iou, rescued, reg_thresholds)
    obj_raw = _bin_labels(max_iou, rescued, obj_thresholds)

    reg_labels = subsample_labels(reg_raw, batch_size_per_image, positive_fraction, k_reg)
    obj_labels = subsample_labels(obj_raw, batch_size_per_image, objectness_positive_fraction, k_obj)

    if matched_boxes is None:
        # XLA path: gather the matched GT box per anchor. The Pallas kernel
        # emits these directly (the (R, 4) gather costs ~4 ms/step at scale).
        matched_boxes = gt_boxes[matched_idx]  # (R, 4); shared by both matchers
    gt_ctr = centerness_targets(anchors, matched_boxes, obj_labels)
    return reg_labels, matched_boxes, obj_labels, gt_ctr


def rpn_targets(
    anchors: jnp.ndarray,
    gt: GroundTruth,
    key: jax.Array,
    batch_size_per_image: int = 256,
    positive_fraction: float = 0.5,
    objectness_positive_fraction: float = 1.0,
    reg_thresholds: Sequence[float] = (0.3, 0.7),
    obj_thresholds: Sequence[float] = (0.1, 0.3),
    use_pallas: bool | None = None,
) -> RPNTargets:
    """Anchor target assignment. The (G x R) IoU matrix + dual matchers run
    through the fused Pallas kernel on TPU (ops/pallas/iou_match_kernel.py:
    never materializes the ~37 MB/image matrix); XLA fallback elsewhere."""
    from ..parallel.mesh import active_mesh, data_shard_map, pallas_device_local

    B = gt.boxes.shape[0]
    if use_pallas is None:
        # auto: on TPU whenever the kernel can run per-device — single chip,
        # inside a shard_map body, or under an engine-registered mesh (the
        # call below then wraps itself in shard_map over the 'data' axis)
        use_pallas = jax.default_backend() == "tpu" and (
            pallas_device_local() or active_mesh() is not None
        )
    kernel_boxes = None
    if use_pallas:
        from jax.sharding import PartitionSpec as P

        from ..ops.pallas.iou_match_kernel import iou_match_pallas

        interp = jax.default_backend() != "tpu"  # CPU tests: interpret mode
        kernel = data_shard_map(
            lambda a, b, v: iou_match_pallas(a, b, v, interpret=interp),
            in_specs=(P(), P("data"), P("data")),
            out_specs=(P("data"), P("data"), P("data"), P("data")),
        )
        max_iou, matched_idx, rescued, kernel_boxes = kernel(
            anchors, gt.boxes, gt.valid
        )
    else:
        max_iou, matched_idx, rescued = jax.vmap(
            lambda b, v: _match_one_image(anchors, b, v)
        )(gt.boxes, gt.valid)

    keys = jax.random.split(key, B)
    if kernel_boxes is None:
        fn = jax.vmap(
            lambda b, mi, idx, rc, k: _sample_one_image(
                anchors, b, mi, idx, rc, k,
                batch_size_per_image, positive_fraction, objectness_positive_fraction,
                reg_thresholds, obj_thresholds,
            )
        )
        reg_labels, matched_boxes, obj_labels, gt_ctr = fn(
            gt.boxes, max_iou, matched_idx, rescued, keys
        )
    else:
        fn = jax.vmap(
            lambda b, mi, idx, rc, k, mb: _sample_one_image(
                anchors, b, mi, idx, rc, k,
                batch_size_per_image, positive_fraction, objectness_positive_fraction,
                reg_thresholds, obj_thresholds, matched_boxes=mb,
            )
        )
        reg_labels, matched_boxes, obj_labels, gt_ctr = fn(
            gt.boxes, max_iou, matched_idx, rescued, keys, kernel_boxes
        )
    return RPNTargets(reg_labels, matched_boxes, obj_labels, gt_ctr)


def rpn_losses(
    anchors: jnp.ndarray,
    pred_deltas: jnp.ndarray,     # (B, R, 4)
    pred_centerness: jnp.ndarray, # (B, R)
    targets: RPNTargets,
    transform: Box2BoxTransformLinear,
    batch_size_per_image: int = 256,
    loc_weight: float = 1.0,
    ctr_weight: float = 1.0,
    box_reg_loss_type: str = "iou",
    ctr_smooth_l1_beta: float = 0.0,
) -> Dict[str, jnp.ndarray]:
    B = pred_deltas.shape[0]
    pos = targets.reg_labels == 1
    obj_mask = targets.obj_labels != -1

    if box_reg_loss_type in ("iou", "giou", "diou", "ciou"):
        from ..ops import dense_box_regression_loss

        pred_boxes = transform.apply_deltas(pred_deltas, anchors[None])
        loc_loss = dense_box_regression_loss(
            pred_boxes, targets.matched_boxes, pos, box_reg_loss_type
        )
    elif box_reg_loss_type == "smooth_l1":
        gt_deltas = transform.get_deltas(anchors[None], targets.matched_boxes)
        per = smooth_l1(pred_deltas, gt_deltas, 0.0)
        loc_loss = jnp.sum(jnp.where(pos[..., None], per, 0.0))
    else:
        raise ValueError(box_reg_loss_type)

    ctr_per = smooth_l1(pred_centerness, targets.gt_centerness, ctr_smooth_l1_beta)
    ctr_loss = jnp.sum(jnp.where(obj_mask, ctr_per, 0.0))

    normalizer = batch_size_per_image * B
    return {
        "loss_rpn_loc": loc_weight * loc_loss / normalizer,
        "loss_rpn_ctr": ctr_weight * ctr_loss / normalizer,
    }


def select_proposals(
    anchors: jnp.ndarray,          # (R, 4) concatenated over levels
    pred_deltas: jnp.ndarray,      # (B, R, 4)
    pred_centerness: jnp.ndarray,  # (B, R)
    level_sizes: Sequence[int],
    image_hw: jnp.ndarray,         # (B, 2) actual (h, w)
    transform: Box2BoxTransformLinear,
    pre_topk: int,
    min_box_size: float = 0.0,
) -> Proposals:
    """Per-level top-k by centerness; no NMS (mirrors find_top_proposals)."""
    boxes = transform.apply_deltas(pred_deltas, anchors[None])  # (B, R, 4)

    sel_boxes, sel_scores = [], []
    start = 0
    for n in level_sizes:
        k = min(pre_topk, n)
        s = pred_centerness[:, start : start + n]
        b = boxes[:, start : start + n]
        top_s, top_i = jax.lax.top_k(s, k)
        sel_boxes.append(jnp.take_along_axis(b, top_i[..., None], axis=1))
        sel_scores.append(top_s)
        start += n

    out_boxes = jnp.concatenate(sel_boxes, axis=1)   # (B, P, 4)
    out_scores = jnp.concatenate(sel_scores, axis=1) # (B, P)

    # Clip to each image's true extent; mask empty / non-finite boxes instead
    # of filtering (the reference raises on NaN during training,
    # find_top_proposals.py:96-101 — we surface that via metrics instead).
    out_boxes = jax.vmap(clip_boxes)(out_boxes, image_hw)
    finite = jnp.all(jnp.isfinite(out_boxes), axis=-1) & jnp.isfinite(out_scores)
    valid = finite & nonempty(out_boxes, min_box_size)
    return Proposals(boxes=out_boxes, scores=jnp.where(valid, out_scores, 0.0), valid=valid)
