"""Fixed-shape batched containers (pytrees).

TPU-native replacement for detectron2's list-of-``Instances``/``Boxes``
structures (SURVEY.md §2.4, §7.1): the batch dimension leads everywhere and
"absent" entries are expressed with validity masks instead of dynamic
filtering, so every op under jit sees static shapes.
"""
from __future__ import annotations

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class GroundTruth:
    """Padded GT annotations for a batch of images."""

    boxes: jnp.ndarray    # (B, G, 4) xyxy in network-input coordinates
    classes: jnp.ndarray  # (B, G) int32 contiguous category ids
    valid: jnp.ndarray    # (B, G) bool


@flax.struct.dataclass
class ImageBatch:
    """A padded batch ready for the device."""

    images: jnp.ndarray    # (B, H, W, 3) float32, raw BGR pixel values
    image_hw: jnp.ndarray  # (B, 2) float32 actual (h, w) before padding
    gt: GroundTruth | None = None


@flax.struct.dataclass
class Proposals:
    """Fixed-size per-image proposal sets."""

    boxes: jnp.ndarray   # (B, P, 4)
    scores: jnp.ndarray  # (B, P) centerness-derived objectness in [0, 1]
    valid: jnp.ndarray   # (B, P) bool


@flax.struct.dataclass
class SampledRois:
    """ROI-head training samples (output of label_and_sample_proposals)."""

    boxes: jnp.ndarray       # (B, S, 4) proposal boxes
    scores: jnp.ndarray      # (B, S) proposal objectness (centerness)
    gt_boxes: jnp.ndarray    # (B, S, 4) matched GT box
    gt_classes: jnp.ndarray  # (B, S) int32; num_classes = background
    ious: jnp.ndarray        # (B, S) matched IoU (the IoU-regression target)
    is_fg: jnp.ndarray       # (B, S) bool
    valid: jnp.ndarray       # (B, S) bool


@flax.struct.dataclass
class RawDetections:
    """Per-proposal raw outputs of the full cascade heads, pre-filtering.

    The host-side post-processing (evaluation/postprocess.py) consumes this
    to run the exact 3-stage filter cascade of the reference
    (osrcnn_fast_rcnn.py:89-145 -> prototype_learning_network.py:189 ->
    softmax_classifier.py:287).
    """

    boxes: jnp.ndarray        # (B, P, 4) regressed, clipped to input size
    objectness: jnp.ndarray   # (B, P) sqrt(iou * centerness)
    pred_iou: jnp.ndarray     # (B, P)
    centerness: jnp.ndarray   # (B, P)
    min_dist: jnp.ndarray     # (B, P) min prototype distance
    pln_class: jnp.ndarray    # (B, P) int32 argmin known class index
    known_probs: jnp.ndarray  # (B, P, K+1) softmax over known classes + bg
    valid: jnp.ndarray        # (B, P) bool
