"""Fused IoU+matcher kernel vs the XLA matcher (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np

from openset_rcnn_tpu.ops import match, pairwise_iou
from openset_rcnn_tpu.ops.pallas.iou_match_kernel import iou_match_pallas


def test_iou_match_matches_xla(rng):
    B, G, R = 2, 8, 256
    anchors = np.concatenate(
        [rng.uniform(0, 200, (R, 2)), rng.uniform(8, 64, (R, 2))], 1
    ).astype(np.float32)
    anchors[:, 2:] += anchors[:, :2]
    gt = np.concatenate([rng.uniform(0, 180, (B, G, 2)), rng.uniform(16, 80, (B, G, 2))], -1).astype(np.float32)
    gt[..., 2:] += gt[..., :2]
    valid = rng.rand(B, G) > 0.3
    valid[1, :] = False  # empty-GT image

    max_iou, idx, resc, mbox = iou_match_pallas(
        jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(valid), interpret=True
    )
    for b in range(B):
        iou = pairwise_iou(jnp.asarray(gt[b]), jnp.asarray(anchors))
        masked = np.where(valid[b][:, None], np.asarray(iou), -1.0)
        np.testing.assert_allclose(np.asarray(max_iou[b]), masked.max(0), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(idx[b]), masked.argmax(0))
        # matched boxes must equal the XLA path's gt_boxes[argmax] gather
        np.testing.assert_allclose(
            np.asarray(mbox[b]), gt[b][masked.argmax(0)], atol=1e-6
        )
        # rescue semantics vs the XLA matcher
        res = match(iou, jnp.asarray(valid[b]), [0.3, 0.7], [0, -1, 1], True)
        want_rescued = np.asarray(res.labels) == 1
        got_labels = np.where(np.asarray(max_iou[b]) >= 0.7, 1,
                     np.where(np.asarray(max_iou[b]) >= 0.3, -1, 0))
        got_labels = np.where(np.asarray(resc[b]), 1, got_labels)
        if valid[b].any():
            np.testing.assert_array_equal(got_labels, np.asarray(res.labels))
        else:
            assert (np.asarray(res.labels) == 0).all()
            assert not np.asarray(resc[b]).any()
