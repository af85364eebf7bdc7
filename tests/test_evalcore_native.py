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


def test_greedy_match_unexpected_native_error_is_surfaced(rng, monkeypatch, caplog):
    """An unexpected native-binding failure (not a missing extension) must be
    logged once — not silently swallowed — while still falling back to numpy
    (VERDICT r3 weak-3; mirrors the match_category fix)."""
    import logging

    from openset_rcnn_tpu.evaluation import os_cocoeval as oc
    from openset_rcnn_tpu.evaluation import evalcore_binding as ebmod

    def boom(*a, **k):
        raise ValueError("synthetic binding bug")

    monkeypatch.setattr(ebmod, "greedy_match_native", boom)
    monkeypatch.setattr(oc, "_GREEDY_NATIVE_WARNED", False)
    ious = rng.rand(5, 3)
    gt_ignore = np.zeros(3, np.int32)
    iscrowd = np.zeros(3, np.int32)
    with caplog.at_level(logging.WARNING, logger=oc.__name__):
        m1, i1 = oc.greedy_match(ious, gt_ignore, iscrowd, IOU_THRS)
        m2, i2 = oc.greedy_match(ious, gt_ignore, iscrowd, IOU_THRS)
    msgs = [r for r in caplog.records if "greedy_match" in r.getMessage()]
    assert len(msgs) == 1, "warning must fire exactly once per process"
    assert "synthetic binding bug" in msgs[0].getMessage()
    # fallback still produced correct results
    w1, w2 = python_greedy_match(ious, gt_ignore, iscrowd, IOU_THRS)
    np.testing.assert_array_equal(m1, w1)
    np.testing.assert_array_equal(i1, w2)


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


def test_match_category_batch_matches_per_group(rng):
    """The batched C++ (image x area) matcher must agree with the per-group
    numpy path (_match_group_pre) on random groups, including empty dt/gt
    groups and crowd/area-ignore interactions."""
    import numpy as np
    from openset_rcnn_tpu.evaluation.os_cocoeval import (
        IOU_THRS,
        _AREA_RANGES_ARR,
        _match_group_pre,
        _match_groups_all_areas,
        _precompute_group,
    )
    from openset_rcnn_tpu.evaluation import evalcore_binding as eb

    if not (eb.available() and hasattr(eb._load(), "match_category")):
        import pytest

        pytest.skip("native evalcore unavailable")

    pres = []
    for i in range(12):
        D = int(rng.randint(0, 15))
        G = int(rng.randint(0, 8))
        dts = []
        scores = -np.sort(-rng.rand(D))
        for d in range(D):
            x, y = rng.uniform(0, 200, 2)
            w, h = rng.uniform(2, 150, 2)
            dts.append(dict(bbox=[x, y, w, h], score=float(scores[d])))
        gts = []
        for g in range(G):
            x, y = rng.uniform(0, 200, 2)
            w, h = rng.uniform(2, 150, 2)
            gts.append(dict(bbox=[x, y, w, h], area=w * h,
                            iscrowd=int(rng.rand() < 0.2)))
        pres.append(_precompute_group(dts, gts))

    matched, ignore, n_gt = _match_groups_all_areas(pres, IOU_THRS)
    doff = np.concatenate(
        [[0], np.cumsum([len(p["scores"]) for p in pres])]
    ).astype(int)
    for ai, (lo, hi) in enumerate(_AREA_RANGES_ARR):
        for i, p in enumerate(pres):
            ev = _match_group_pre(p, lo, hi, IOU_THRS)
            np.testing.assert_array_equal(
                matched[ai][:, doff[i]:doff[i + 1]], ev.matched, err_msg=f"a{ai} g{i}"
            )
            np.testing.assert_array_equal(
                ignore[ai][:, doff[i]:doff[i + 1]], ev.ignore, err_msg=f"a{ai} g{i}"
            )
            assert n_gt[ai, i] == ev.n_gt
