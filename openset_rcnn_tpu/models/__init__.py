from .resnet import FrozenBN, ResNet
from .fpn import FPN
from .rpn import ClsFreeRPNHead, rpn_losses, rpn_targets, select_proposals
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
from .detector import (
    ModelSpec,
    OpensetRCNNModule,
    compute_anchors,
    inference_forward,
    known_ids_id_map,
    opendet_id_map,
    training_losses,
    training_losses_and_stats,
)
