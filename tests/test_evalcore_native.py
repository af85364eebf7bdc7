"""Native C++ evalcore vs the pure-numpy reference implementations."""
import numpy as np
import pytest

from openset_rcnn_tpu.evaluation import evalcore_binding as eb
from openset_rcnn_tpu.evaluation.os_cocoeval import IOU_THRS

pytestmark = pytest.mark.skipif(not eb.available(), reason="evalcore.so not built")


def python_greedy_match(ious, gt_ignore, iscrowd, iou_thrs):
    """Inline copy of the numpy fallback (kept independent of dispatch)."""
    D, G = ious.shape
    T = len(iou_thrs)
    dtm = np.zeros((T, D), bool)
    dt_ig = np.zeros((T, D), bool)
    for ti, t in enumerate(iou_thrs):
        taken = np.zeros(G, bool)
        for d in range(D):
            best = min(t, 1 - 1e-10)
            m = -1
            for g in range(G):
                if taken[g] and not iscrowd[g]:
                    continue
                if m > -1 and gt_ignore[m] == 0 and gt_ignore[g] == 1:
                    break
                if ious[d, g] < best:
                    continue
                best = ious[d, g]
                m = g
            if m == -1:
                continue
            dtm[ti, d] = True
            dt_ig[ti, d] = bool(gt_ignore[m])
            taken[m] = True
    return dtm, dt_ig


def test_greedy_match_matches_python(rng):
    for trial in range(20):
        D, G = rng.randint(1, 20), rng.randint(1, 12)
        ious = rng.rand(D, G)
        n_ig = rng.randint(0, G + 1)
        gt_ignore = np.concatenate([np.zeros(G - n_ig, np.int32), np.ones(n_ig, np.int32)])
        iscrowd = (rng.rand(G) < 0.2).astype(np.int32)
        m1, i1 = eb.greedy_match_native(ious, gt_ignore, iscrowd, IOU_THRS)
        m2, i2 = python_greedy_match(ious, gt_ignore, iscrowd, IOU_THRS)
        np.testing.assert_array_equal(m1, m2)
        np.testing.assert_array_equal(i1, i2)


def test_nms_native_matches_python(rng):
    for trial in range(10):
        n = rng.randint(2, 60)
        xy = rng.uniform(0, 80, (n, 2))
        wh = rng.uniform(5, 40, (n, 2))
        boxes = np.concatenate([xy, xy + wh], 1)
        scores = rng.rand(n)
        order = np.argsort(-scores, kind="stable")
        keep = eb.nms_native(boxes[order], 0.5)
        # python oracle
        kept = []
        sup = np.zeros(n, bool)
        b = boxes[order]
        for i in range(n):
            if sup[i]:
                continue
            kept.append(i)
            for j in range(i + 1, n):
                x1 = max(b[i, 0], b[j, 0]); y1 = max(b[i, 1], b[j, 1])
                x2 = min(b[i, 2], b[j, 2]); y2 = min(b[i, 3], b[j, 3])
                inter = max(0, x2 - x1) * max(0, y2 - y1)
                a1 = (b[i, 2] - b[i, 0]) * (b[i, 3] - b[i, 1])
                a2 = (b[j, 2] - b[j, 0]) * (b[j, 3] - b[j, 1])
                iou = inter / (a1 + a2 - inter) if a1 + a2 - inter > 0 else 0
                if iou > 0.5:
                    sup[j] = True
        want = np.zeros(n, bool)
        want[kept] = True
        np.testing.assert_array_equal(keep, want)
