from .boxes import (
    box_area,
    clip_boxes,
    elementwise_iou,
    nonempty,
    pairwise_iou,
)
from .box_transforms import Box2BoxTransform, Box2BoxTransformLinear
from .matcher import MatchResult, match
from .sampling import SampledIndices, sample_balanced_indices, subsample_labels
from .targets import centerness_targets
from .anchors import cell_anchors, fpn_anchors, grid_anchors
from .nms import NMSResult, batched_nms_mask, nms_mask, nms_select
from .roi_align import assign_levels, multilevel_roi_align, multilevel_roi_align_batched
from .losses import (
    ciou_box_loss,
    dense_box_regression_loss,
    diou_box_loss,
    giou_box_loss,
    iou_box_loss,
    masked_sum,
    smooth_l1,
    softmax_cross_entropy,
)
