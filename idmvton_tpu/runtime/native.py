"""Python wrappers for the C++ runtime extension (_idmvton_native).

Builds the extension on first use (setuptools, cached in runtime/_build).
These are the host-side counterparts of the reference's native kernel layer
(SURVEY §2.4): ROIAlign oracle/fallback, greedy NMS, COCO-style AP.
"""

from __future__ import annotations

import os
import subprocess
import sys
from typing import Optional

import numpy as np

_module = None
_SRC_DIR = os.path.dirname(os.path.abspath(__file__))


def _build_extension() -> Optional[object]:
    build_dir = os.path.join(_SRC_DIR, "_build")
    os.makedirs(build_dir, exist_ok=True)
    import sysconfig
    ext_suffix = sysconfig.get_config_var("EXT_SUFFIX")
    so_path = os.path.join(build_dir, "_idmvton_native" + ext_suffix)
    src = os.path.join(_SRC_DIR, "csrc", "native.cc")
    if (not os.path.exists(so_path)
            or os.path.getmtime(so_path) < os.path.getmtime(src)):
        include = sysconfig.get_paths()["include"]
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
               f"-I{include}", src, "-o", so_path]
        subprocess.run(cmd, check=True, capture_output=True)
    sys.path.insert(0, build_dir)
    import importlib
    return importlib.import_module("_idmvton_native")


def get_native():
    global _module
    if _module is None:
        _module = _build_extension()
    return _module


def roi_align_cpu(features: np.ndarray, boxes: np.ndarray,
                  box_indices: np.ndarray, *, output_size: int,
                  spatial_scale: float = 1.0, sampling_ratio: int = 2,
                  aligned: bool = True) -> np.ndarray:
    """features (B, H, W, C) f32; boxes (R, 4); box_indices (R,) i32."""
    nat = get_native()
    features = np.ascontiguousarray(features, np.float32)
    boxes = np.ascontiguousarray(boxes, np.float32)
    box_indices = np.ascontiguousarray(box_indices, np.int32)
    b, h, w, c = features.shape
    r = boxes.shape[0]
    out = np.zeros((r, output_size, output_size, c), np.float32)
    nat.roi_align_forward(features, boxes, box_indices, out, b, h, w, c, r,
                          output_size, sampling_ratio, float(spatial_scale),
                          int(aligned))
    return out


def nms_cpu(boxes: np.ndarray, scores: np.ndarray,
            iou_threshold: float = 0.5) -> np.ndarray:
    """Returns bool keep mask (N,)."""
    nat = get_native()
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    keep = np.zeros((boxes.shape[0],), np.int32)
    nat.nms(boxes, scores, keep, boxes.shape[0], float(iou_threshold))
    return keep.astype(bool)


_COCO_AREA_RNGS = np.array(
    [[0.0, 1e10], [0.0, 32.0 ** 2], [32.0 ** 2, 96.0 ** 2], [96.0 ** 2, 1e10]])
_COCO_MAX_DETS = np.array([1, 10, 100], np.int32)


def coco_evaluate(detections: np.ndarray, ground_truths: np.ndarray, *,
                  iou_thrs: Optional[np.ndarray] = None,
                  rec_thrs: Optional[np.ndarray] = None,
                  area_rngs: Optional[np.ndarray] = None,
                  max_dets: Optional[np.ndarray] = None,
                  img_ids: Optional[np.ndarray] = None,
                  cat_ids: Optional[np.ndarray] = None) -> dict:
    """Full COCO box evaluation — pycocotools-parity accumulate/summarize.

    Behavioral match of the reference's vendored native evaluator
    (gradio_demo/detectron2/layers/csrc/cocoeval/cocoeval.cpp) at its
    defaults: IoU thresholds .5:.05:.95, 101 recall points, area ranges
    all/small/medium/large, maxDets 1/10/100.

    detections (D, >=7): [image_id, cat_id, score, x1, y1, x2, y2]
      (optional col 7 = area; defaults to box area).
    ground_truths (G, >=6): [image_id, cat_id, iscrowd, x1, y1, x2, y2]
      (optional col 7 = explicit ignore, col 8 = area; default box area).

    Returns {"precision": (T,R,K,A,M), "recall": (T,K,A,M),
             "scores": (T,R,K,A,M), "stats": the 12 COCO summary numbers}.
    """
    nat = get_native()
    det = np.asarray(detections, np.float64)
    det = det.reshape(-1, det.shape[-1] if det.size else 7)
    gt = np.asarray(ground_truths, np.float64)
    gt = gt.reshape(-1, gt.shape[-1] if gt.size else 6)

    def _box_area(rows, off):
        return np.maximum(rows[:, off + 2] - rows[:, off], 0) * \
            np.maximum(rows[:, off + 3] - rows[:, off + 1], 0)

    d8 = np.zeros((len(det), 8))
    if len(det):
        d8[:, :3] = det[:, :3]
        d8[:, 4:8] = det[:, 3:7]
        d8[:, 3] = det[:, 7] if det.shape[1] > 7 else _box_area(det, 3)
    g9 = np.zeros((len(gt), 9))
    if len(gt):
        g9[:, :3] = gt[:, :3]
        g9[:, 5:9] = gt[:, 3:7]
        g9[:, 3] = gt[:, 7] if gt.shape[1] > 7 else 0.0
        g9[:, 4] = gt[:, 8] if gt.shape[1] > 8 else _box_area(gt, 3)

    iou_thrs = np.linspace(.5, .95, 10) if iou_thrs is None \
        else np.asarray(iou_thrs, np.float64)
    rec_thrs = np.linspace(0., 1., 101) if rec_thrs is None \
        else np.asarray(rec_thrs, np.float64)
    area_rngs = _COCO_AREA_RNGS if area_rngs is None \
        else np.asarray(area_rngs, np.float64).reshape(-1, 2)
    max_dets = _COCO_MAX_DETS if max_dets is None \
        else np.asarray(max_dets, np.int32)
    ids = np.concatenate([d8[:, 0], g9[:, 0]])
    img_ids = np.unique(ids) if img_ids is None \
        else np.asarray(img_ids, np.float64)
    cats = np.concatenate([d8[:, 1], g9[:, 1]])
    cat_ids = np.unique(cats) if cat_ids is None \
        else np.asarray(cat_ids, np.float64)

    T, R, K, A, M = (len(iou_thrs), len(rec_thrs), len(cat_ids),
                     len(area_rngs), len(max_dets))
    precision = np.full((T, R, K, A, M), -1.0)
    recall = np.full((T, K, A, M), -1.0)
    scores = np.full((T, R, K, A, M), -1.0)
    nat.coco_evaluate(
        np.ascontiguousarray(d8), np.ascontiguousarray(g9),
        np.ascontiguousarray(img_ids), np.ascontiguousarray(cat_ids),
        np.ascontiguousarray(iou_thrs), np.ascontiguousarray(rec_thrs),
        np.ascontiguousarray(area_rngs), np.ascontiguousarray(max_dets),
        precision, recall, scores,
        len(d8), len(g9), len(img_ids), K, T, R, A, M)

    def _mean(x):
        x = x[x > -1]
        return float(x.mean()) if x.size else -1.0

    m_last = M - 1
    stats = np.array([
        _mean(precision[:, :, :, 0, m_last]),
        _mean(precision[iou_thrs == .5][:, :, :, 0, m_last])
        if (iou_thrs == .5).any() else -1.0,
        _mean(precision[iou_thrs == .75][:, :, :, 0, m_last])
        if (iou_thrs == .75).any() else -1.0,
        _mean(precision[:, :, :, 1, m_last]) if A > 3 else -1.0,
        _mean(precision[:, :, :, 2, m_last]) if A > 3 else -1.0,
        _mean(precision[:, :, :, 3, m_last]) if A > 3 else -1.0,
        _mean(recall[:, :, 0, 0]),
        _mean(recall[:, :, 0, 1]) if M > 1 else -1.0,
        _mean(recall[:, :, 0, m_last]),
        _mean(recall[:, :, 1, m_last]) if A > 3 else -1.0,
        _mean(recall[:, :, 2, m_last]) if A > 3 else -1.0,
        _mean(recall[:, :, 3, m_last]) if A > 3 else -1.0,
    ])
    return {"precision": precision, "recall": recall, "scores": scores,
            "stats": stats}


def coco_ap(detections: np.ndarray, ground_truths: np.ndarray) -> float:
    """detections (D, 6): [image_id, score, x1, y1, x2, y2];
    ground_truths (G, 5): [image_id, x1, y1, x2, y2]. Returns AP@[.5:.95]."""
    nat = get_native()
    det = np.ascontiguousarray(detections, np.float32)
    det = det[np.argsort(-det[:, 1])] if len(det) else det
    gt = np.ascontiguousarray(ground_truths, np.float32)
    return float(nat.coco_average_precision(det, gt, len(det), len(gt)))
