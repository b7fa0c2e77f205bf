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
