"""C++ runtime extension tests: cross-check against the JAX/XLA ops."""

import numpy as np
import jax.numpy as jnp
import pytest

from idmvton_tpu.runtime.native import roi_align_cpu, nms_cpu, coco_ap
from idmvton_tpu.ops.roi_align import roi_align
from idmvton_tpu.ops.nms import nms_mask


def test_native_roi_align_matches_xla():
    rng = np.random.RandomState(0)
    feat = rng.rand(2, 12, 16, 3).astype(np.float32)
    boxes = np.asarray([[1.0, 2.0, 12.0, 10.0], [0.0, 0.0, 16.0, 12.0]],
                       np.float32)
    idx = np.asarray([0, 1], np.int32)
    native = roi_align_cpu(feat, boxes, idx, output_size=5)
    xla = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes),
                               jnp.asarray(idx), output_size=5))
    np.testing.assert_allclose(native, xla, atol=1e-4)


def test_native_nms_matches_xla():
    rng = np.random.RandomState(1)
    centers = rng.rand(30, 2) * 15
    sizes = rng.rand(30, 2) * 5 + 1
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                           axis=1).astype(np.float32)
    scores = rng.rand(30).astype(np.float32)
    native = nms_cpu(boxes, scores, 0.5)
    xla = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                              iou_threshold=0.5))
    np.testing.assert_array_equal(native, xla)


def test_coco_ap_perfect_and_empty():
    gt = np.asarray([[0, 10, 10, 50, 50], [0, 60, 60, 90, 90]], np.float32)
    det_perfect = np.asarray([[0, 0.9, 10, 10, 50, 50],
                              [0, 0.8, 60, 60, 90, 90]], np.float32)
    assert coco_ap(det_perfect, gt) > 0.99
    det_miss = np.asarray([[0, 0.9, 100, 100, 120, 120]], np.float32)
    assert coco_ap(det_miss, gt) == 0.0
    assert coco_ap(np.zeros((0, 6), np.float32), gt) == 0.0


def test_coco_ap_partial():
    gt = np.asarray([[0, 10, 10, 50, 50], [1, 10, 10, 50, 50]], np.float32)
    # one perfect match in image 0, nothing in image 1 -> recall caps at 0.5
    det = np.asarray([[0, 0.9, 10, 10, 50, 50]], np.float32)
    ap = coco_ap(det, gt)
    assert 0.3 < ap < 0.6


# ---------------------------------------------------------------------------
# Full COCO evaluator (coco_evaluate) vs an independent NumPy implementation
# of the published pycocotools protocol (the reference vendors the same
# algorithm natively: gradio_demo/detectron2/layers/csrc/cocoeval/cocoeval.cpp)
# ---------------------------------------------------------------------------

def _np_cocoeval(dets, gts, iou_thrs, rec_thrs, area_rngs, max_dets,
                 img_ids, cat_ids):
    """Literal NumPy transcription of pycocotools COCOeval.evaluateImg +
    accumulate for bbox mode. dets (D,8): img,cat,score,area,x1,y1,x2,y2;
    gts (G,9): img,cat,iscrowd,ignore,area,x1,y1,x2,y2."""
    T, R, K, A, M = (len(iou_thrs), len(rec_thrs), len(cat_ids),
                     len(area_rngs), len(max_dets))
    precision = np.full((T, R, K, A, M), -1.0)
    recall = np.full((T, K, A, M), -1.0)
    max_cap = int(max_dets[-1])

    def iou(db, gb, crowd):
        ix1, iy1 = max(db[0], gb[0]), max(db[1], gb[1])
        ix2, iy2 = min(db[2], gb[2]), min(db[3], gb[3])
        inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
        ad = max(db[2] - db[0], 0) * max(db[3] - db[1], 0)
        ag = max(gb[2] - gb[0], 0) * max(gb[3] - gb[1], 0)
        u = ad if crowd else ad + ag - inter
        return inter / u if u > 1e-12 else 0.0

    # evaluateImg for every (cat, area, img)
    evals = {}
    for ki, cat in enumerate(cat_ids):
        for ii, img in enumerate(img_ids):
            dt = dets[(dets[:, 0] == img) & (dets[:, 1] == cat)]
            g = gts[(gts[:, 0] == img) & (gts[:, 1] == cat)]
            dt = dt[np.argsort(-dt[:, 2], kind="stable")][:max_cap]
            ious = np.array([[iou(d[4:8], gg[5:9], gg[2] != 0) for gg in g]
                             for d in dt]).reshape(len(dt), len(g))
            for ai, (lo, hi) in enumerate(area_rngs):
                gt_ig0 = ((g[:, 2] != 0) | (g[:, 3] != 0) |
                          (g[:, 4] < lo) | (g[:, 4] > hi))
                gind = np.argsort(gt_ig0, kind="stable")
                gt_ig = gt_ig0[gind]
                dtm = np.zeros((T, len(dt)), int)
                dt_ig = np.zeros((T, len(dt)), bool)
                gtm = np.zeros((T, len(g)), int)
                for t, thr in enumerate(iou_thrs):
                    for d in range(len(dt)):
                        best = min(thr, 1 - 1e-10)
                        m = -1
                        for gs in range(len(g)):
                            go = gind[gs]
                            if gtm[t, gs] > 0 and g[go, 2] == 0:
                                continue
                            if m > -1 and not gt_ig[m] and gt_ig[gs]:
                                break
                            if ious[d, go] < best:
                                continue
                            best = ious[d, go]
                            m = gs
                        if m == -1:
                            continue
                        dt_ig[t, d] = gt_ig[m]
                        dtm[t, d] = m + 1
                        gtm[t, m] = d + 1
                    out = (dt[:, 3] < lo) | (dt[:, 3] > hi)
                    dt_ig[t] |= (dtm[t] == 0) & out
                evals[(ki, ai, ii)] = (dt[:, 2], dtm, dt_ig, gt_ig)

    # accumulate
    for ki in range(K):
        for ai in range(A):
            rows = [evals[(ki, ai, ii)] for ii in range(len(img_ids))]
            npig = sum(int((~r[3]).sum()) for r in rows)
            if npig == 0:
                continue
            for mi, cap in enumerate(max_dets):
                scores = np.concatenate([r[0][:cap] for r in rows])
                dtm = np.concatenate([r[1][:, :cap] for r in rows], axis=1)
                dt_ig = np.concatenate([r[2][:, :cap] for r in rows], axis=1)
                order = np.argsort(-scores, kind="stable")
                dtm, dt_ig = dtm[:, order], dt_ig[:, order]
                tps = np.cumsum((dtm > 0) & ~dt_ig, axis=1)
                fps = np.cumsum((dtm == 0) & ~dt_ig, axis=1)
                for t in range(T):
                    rc = tps[t] / npig
                    pr = np.where(tps[t] + fps[t] > 0,
                                  tps[t] / np.maximum(tps[t] + fps[t], 1), 0.0)
                    recall[t, ki, ai, mi] = rc[-1] if len(rc) else 0.0
                    pr = pr.tolist()
                    for i in range(len(pr) - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds = np.searchsorted(rc, rec_thrs, side="left")
                    q = np.zeros(R)
                    for ri, pi in enumerate(inds):
                        if pi < len(pr):
                            q[ri] = pr[pi]
                    precision[t, :, ki, ai, mi] = q
    return precision, recall


def _synthetic_coco_fixture(seed=0):
    """3 categories, 4 images, crowds + explicit ignores + all area buckets."""
    rng = np.random.RandomState(seed)
    gts, dets = [], []
    sizes = [8, 20, 60, 200]  # small / small-med / med-large / large boxes
    for img in range(4):
        for cat in range(1, 4):
            for j, s in enumerate(sizes):
                x, y = rng.rand(2) * 300
                crowd = 1.0 if (img == 1 and j == 3) else 0.0
                ignore = 1.0 if (img == 2 and j == 0) else 0.0
                gts.append([img, cat, crowd, x, y, x + s, y + s * 0.9, ignore])
                # matched det with jitter, score varies
                if rng.rand() > 0.2:
                    d = rng.rand() * s * 0.2
                    dets.append([img, cat, rng.rand(),
                                 x + d, y + d, x + s + d, y + s * 0.9 + d])
                # false positive
                if rng.rand() > 0.5:
                    fx, fy = rng.rand(2) * 300 + 400
                    dets.append([img, cat, rng.rand(), fx, fy,
                                 fx + s, fy + s])
    # duplicate detections on one gt (tests greedy matching / crowd re-match)
    dets.append([1, 1, 0.95, *gts[12][3:7]])
    dets.append([1, 1, 0.94, *gts[12][3:7]])
    return np.array(dets, np.float64), np.array(gts, np.float64)


def test_coco_evaluate_matches_pycocotools_protocol():
    from idmvton_tpu.runtime.native import coco_evaluate
    dets, gts = _synthetic_coco_fixture()
    res = coco_evaluate(dets, gts)
    # mirror inputs into the (D,8)/(G,9) internal layout
    d8 = np.zeros((len(dets), 8))
    d8[:, :3] = dets[:, :3]
    d8[:, 4:8] = dets[:, 3:7]
    d8[:, 3] = (dets[:, 5] - dets[:, 3]) * (dets[:, 6] - dets[:, 4])
    g9 = np.zeros((len(gts), 9))
    g9[:, :3] = gts[:, :3]
    g9[:, 5:9] = gts[:, 3:7]
    g9[:, 3] = gts[:, 7]
    g9[:, 4] = (gts[:, 5] - gts[:, 3]) * (gts[:, 6] - gts[:, 4])
    iou_thrs = np.linspace(.5, .95, 10)
    rec_thrs = np.linspace(0., 1., 101)
    area_rngs = np.array([[0, 1e10], [0, 32 ** 2], [32 ** 2, 96 ** 2],
                          [96 ** 2, 1e10]], np.float64)
    max_dets = np.array([1, 10, 100])
    img_ids = np.unique(np.concatenate([d8[:, 0], g9[:, 0]]))
    cat_ids = np.unique(np.concatenate([d8[:, 1], g9[:, 1]]))
    prec_np, rec_np = _np_cocoeval(d8, g9, iou_thrs, rec_thrs, area_rngs,
                                   max_dets, img_ids, cat_ids)
    np.testing.assert_allclose(res["precision"], prec_np, atol=1e-10)
    np.testing.assert_allclose(res["recall"], rec_np, atol=1e-10)
    # the headline AP actually exercises matching (not all -1 / 0 / 1)
    assert 0.05 < res["stats"][0] < 0.95
    assert res["stats"].shape == (12,)


def test_coco_evaluate_perfect_detections():
    from idmvton_tpu.runtime.native import coco_evaluate
    gts = np.array([[0, 1, 0, 10, 10, 60, 60], [0, 2, 0, 100, 100, 220, 220],
                    [1, 1, 0, 5, 5, 30, 30]], np.float64)
    dets = np.array([[0, 1, .9, 10, 10, 60, 60],
                     [0, 2, .8, 100, 100, 220, 220],
                     [1, 1, .7, 5, 5, 30, 30]], np.float64)
    res = coco_evaluate(dets, gts)
    assert abs(res["stats"][0] - 1.0) < 1e-9  # AP
    assert abs(res["stats"][8] - 1.0) < 1e-9  # AR@100


def test_coco_evaluate_maxdets_caps():
    from idmvton_tpu.runtime.native import coco_evaluate
    # 5 gts in one image; 5 perfect dets -> AR@1 ~ 1/5, AR@10 = 1
    gts = np.array([[0, 1, 0, 10 + 70 * i, 10, 50 + 70 * i, 50]
                    for i in range(5)], np.float64)
    dets = np.array([[0, 1, .9 - .01 * i, 10 + 70 * i, 10, 50 + 70 * i, 50]
                     for i in range(5)], np.float64)
    res = coco_evaluate(dets, gts)
    assert abs(res["recall"][0, 0, 0, 0] - 0.2) < 1e-9   # maxDet=1
    assert abs(res["recall"][0, 0, 0, 1] - 1.0) < 1e-9   # maxDet=10
