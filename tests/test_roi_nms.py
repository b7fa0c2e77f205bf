"""ROIAlign / NMS numerical tests vs independent numpy references."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from idmvton_tpu.ops.roi_align import roi_align
from idmvton_tpu.ops.nms import box_iou, nms_mask, nms_topk


def _np_roi_align(feat, box, out, ratio, scale=1.0):
    """Scalar-loop reference (detectron2 aligned=True semantics)."""
    h, w, c = feat.shape
    x1, y1, x2, y2 = box * scale - 0.5
    rw, rh = max(x2 - x1, 1e-6), max(y2 - y1, 1e-6)
    bw, bh = rw / out, rh / out
    res = np.zeros((out, out, c), np.float32)
    for i in range(out):
        for j in range(out):
            acc = np.zeros(c, np.float32)
            for sy in range(ratio):
                for sx in range(ratio):
                    y = y1 + (i + (sy + 0.5) / ratio) * bh
                    x = x1 + (j + (sx + 0.5) / ratio) * bw
                    if y < -1 or y > h or x < -1 or x > w:
                        continue
                    y_, x_ = min(max(y, 0), h - 1), min(max(x, 0), w - 1)
                    y0, x0 = int(y_), int(x_)
                    y1i, x1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                    wy1, wx1 = y_ - y0, x_ - x0
                    acc += ((1 - wy1) * (1 - wx1) * feat[y0, x0]
                            + (1 - wy1) * wx1 * feat[y0, x1i]
                            + wy1 * (1 - wx1) * feat[y1i, x0]
                            + wy1 * wx1 * feat[y1i, x1i])
            res[i, j] = acc / (ratio * ratio)
    return res


def test_roi_align_matches_reference():
    rng = np.random.RandomState(0)
    feat = rng.rand(2, 16, 20, 3).astype(np.float32)
    boxes = np.array([[2.0, 3.0, 14.0, 11.0],
                      [0.0, 0.0, 20.0, 16.0],
                      [5.5, 2.5, 9.0, 13.0]], np.float32)
    idx = np.array([0, 1, 0], np.int32)
    out = roi_align(jnp.asarray(feat), jnp.asarray(boxes), jnp.asarray(idx),
                    output_size=7, sampling_ratio=2)
    assert out.shape == (3, 7, 7, 3)
    for r in range(3):
        ref = _np_roi_align(feat[idx[r]], boxes[r], 7, 2)
        np.testing.assert_allclose(np.asarray(out[r]), ref, atol=1e-4)


def test_roi_align_spatial_scale_and_invalid():
    rng = np.random.RandomState(1)
    feat = rng.rand(1, 8, 8, 2).astype(np.float32)
    boxes = np.array([[0.0, 0.0, 32.0, 32.0], [1.0, 1.0, 2.0, 2.0]], np.float32)
    idx = np.array([0, -1], np.int32)   # second ROI padded/invalid
    out = roi_align(jnp.asarray(feat), jnp.asarray(boxes), jnp.asarray(idx),
                    output_size=4, spatial_scale=0.25)
    ref = _np_roi_align(feat[0], boxes[0], 4, 2, scale=0.25)
    np.testing.assert_allclose(np.asarray(out[0]), ref, atol=1e-4)
    assert np.all(np.asarray(out[1]) == 0)


def _np_greedy_nms(boxes, scores, thr):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            iou = np.asarray(box_iou(jnp.asarray(boxes[i][None]),
                                     jnp.asarray(boxes[j][None])))[0, 0]
            if iou > thr and scores[j] <= scores[i]:
                # greedy: i processed first in score order suppresses j
                if list(order).index(j) > list(order).index(i):
                    suppressed[j] = True
    return sorted(keep)


def test_box_iou():
    a = jnp.asarray([[0, 0, 2, 2], [0, 0, 1, 1]], jnp.float32)
    b = jnp.asarray([[1, 1, 3, 3], [0, 0, 2, 2]], jnp.float32)
    iou = np.asarray(box_iou(a, b))
    np.testing.assert_allclose(iou[0, 0], 1 / 7, atol=1e-6)
    np.testing.assert_allclose(iou[0, 1], 1.0, atol=1e-6)
    np.testing.assert_allclose(iou[1, 0], 0.0, atol=1e-6)


def test_nms_matches_greedy():
    rng = np.random.RandomState(2)
    centers = rng.rand(40, 2) * 20
    sizes = rng.rand(40, 2) * 6 + 1
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                           axis=1).astype(np.float32)
    scores = rng.rand(40).astype(np.float32)
    keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                               iou_threshold=0.5))
    ref = _np_greedy_nms(boxes, scores, 0.5)
    assert sorted(np.nonzero(keep)[0].tolist()) == ref


def test_nms_topk_fixed_shape():
    boxes = jnp.asarray([[0, 0, 10, 10], [0.5, 0.5, 10, 10], [20, 20, 30, 30]],
                        jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7], jnp.float32)
    ob, os_, oi = nms_topk(boxes, scores, iou_threshold=0.5, topk=5)
    assert ob.shape == (5, 4) and oi.shape == (5,)
    # box 1 suppressed by box 0; boxes 0 and 2 kept; 3 pad slots
    assert oi[0] == 0 and oi[1] == 2
    assert np.all(np.asarray(oi[2:]) == -1)
    assert np.all(np.asarray(ob[2:]) == 0)
