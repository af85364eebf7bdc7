"""Pallas NMS kernel vs the XLA masked-NMS reference (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np

from openset_rcnn_tpu.ops import nms_mask
from openset_rcnn_tpu.ops.pallas.nms_kernel import nms_keep_pallas


def test_pallas_nms_matches_xla(rng):
    for trial in range(5):
        n = 64
        xy = rng.uniform(0, 80, (n, 2))
        wh = rng.uniform(5, 40, (n, 2))
        boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        valid = rng.rand(n) > 0.2
        order = np.argsort(-np.where(valid, scores, -np.inf), kind="stable")
        sorted_boxes = boxes[order]
        sorted_valid = valid[order]

        got = np.asarray(
            nms_keep_pallas(jnp.asarray(sorted_boxes), jnp.asarray(sorted_valid), 0.5, interpret=True)
        )
        ref = nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5)
        # nms_mask keep is in sorted order with the same stable sort
        np.testing.assert_array_equal(np.asarray(ref.order), order.astype(np.int32))
        np.testing.assert_array_equal(got, np.asarray(ref.keep))
