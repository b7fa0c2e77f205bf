"""Rotated IoU / NMS vs analytic cases and a shapely-free numpy reference."""

import numpy as np
import jax.numpy as jnp

from idmvton_tpu.ops.rotated_boxes import (
    box_corners, box_iou_rotated, nms_rotated_mask,
)


def test_corners_axis_aligned():
    c = np.asarray(box_corners(jnp.asarray([[0.0, 0.0, 4.0, 2.0, 0.0]])))[0]
    assert sorted(map(tuple, c)) == sorted(
        [(2, 1), (-2, 1), (-2, -1), (2, -1)])


def test_corners_rotated_90():
    c = np.asarray(box_corners(jnp.asarray([[0.0, 0.0, 4.0, 2.0, 90.0]])))[0]
    np.testing.assert_allclose(sorted(map(tuple, np.round(c, 5))),
                               sorted([(1, 2), (-1, 2), (-1, -2), (1, -2)]),
                               atol=1e-5)


def test_iou_identical_and_disjoint():
    a = jnp.asarray([[0, 0, 2, 2, 30.0], [10, 10, 2, 2, 45.0]])
    iou = np.asarray(box_iou_rotated(a, a))
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-5)
    assert iou[0, 1] < 1e-6


def test_iou_axis_aligned_matches_plain():
    from idmvton_tpu.ops.nms import box_iou
    rng = np.random.RandomState(0)
    centers = rng.rand(10, 2) * 10
    wh = rng.rand(10, 2) * 4 + 1
    rot = np.concatenate([centers, wh, np.zeros((10, 1))], 1).astype(np.float32)
    plain = np.concatenate([centers - wh / 2, centers + wh / 2], 1).astype(np.float32)
    iou_r = np.asarray(box_iou_rotated(jnp.asarray(rot), jnp.asarray(rot)))
    iou_p = np.asarray(box_iou(jnp.asarray(plain), jnp.asarray(plain)))
    np.testing.assert_allclose(iou_r, iou_p, atol=1e-4)


def test_iou_45_degrees_analytic():
    """Unit square vs the same square rotated 45°: intersection is a regular
    octagon with area 2*(sqrt(2)-1) ≈ 0.8284; union = 2 - inter."""
    a = jnp.asarray([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b = jnp.asarray([[0.0, 0.0, 1.0, 1.0, 45.0]])
    iou = float(box_iou_rotated(a, b)[0, 0])
    inter = 2 * (np.sqrt(2) - 1)
    expect = inter / (2 - inter)
    np.testing.assert_allclose(iou, expect, atol=1e-4)


def test_nms_rotated():
    boxes = jnp.asarray([
        [0, 0, 4, 2, 0.0],
        [0.2, 0.0, 4, 2, 5.0],   # heavy overlap with box 0
        [8, 8, 4, 2, 60.0],
    ])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = np.asarray(nms_rotated_mask(boxes, scores, iou_threshold=0.3))
    assert keep.tolist() == [True, False, True]
