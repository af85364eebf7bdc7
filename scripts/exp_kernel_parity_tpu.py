"""On-chip parity check: compiled Pallas IoU+matcher kernel vs the XLA
matcher, including the new matched-box output. Interpret-mode tests cover
CPU semantics; this validates the Mosaic-compiled kernel on real hardware
(SMEM scalar-prefetch indexing is the risk: CLAUDE.md notes 2-D prefetch
arrays are lane-padded on TPU)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from openset_rcnn_tpu.ops import match, pairwise_iou
from openset_rcnn_tpu.ops.pallas.iou_match_kernel import iou_match_pallas


def main():
    rng = np.random.RandomState(0)
    B, G, R = 4, 100, 93288  # bench-scale anchor count
    anchors = np.concatenate(
        [rng.uniform(0, 1200, (R, 2)), rng.uniform(8, 256, (R, 2))], 1
    ).astype(np.float32)
    anchors[:, 2:] += anchors[:, :2]
    gt = np.concatenate(
        [rng.uniform(0, 1000, (B, G, 2)), rng.uniform(16, 300, (B, G, 2))], -1
    ).astype(np.float32)
    gt[..., 2:] += gt[..., :2]
    valid = rng.rand(B, G) > 0.5
    valid[1, :] = False

    max_iou, idx, resc, mbox = jax.jit(iou_match_pallas)(
        jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(valid)
    )
    max_iou, idx, resc, mbox = map(np.asarray, (max_iou, idx, resc, mbox))

    bad = 0
    for b in range(B):
        iou = np.asarray(pairwise_iou(jnp.asarray(gt[b]), jnp.asarray(anchors)))
        masked = np.where(valid[b][:, None], iou, -1.0)
        want_iou, want_idx = masked.max(0), masked.argmax(0)
        e_iou = np.abs(max_iou[b] - want_iou).max()
        idx_mism = (idx[b] != want_idx).mean()
        box_err = np.abs(mbox[b] - gt[b][want_idx]).max()
        box_err_own = np.abs(mbox[b] - gt[b][idx[b]]).max()
        print(f"img {b}: max|iou err|={e_iou:.2e} idx mismatch={idx_mism:.4f} "
              f"|mbox - gt[want_idx]|max={box_err:.3f} |mbox - gt[own idx]|max={box_err_own:.3f}")
        if e_iou > 1e-5 or box_err_own > 1e-4:
            bad += 1
    print("KERNEL PARITY:", "FAIL" if bad else "OK")


if __name__ == "__main__":
    main()
