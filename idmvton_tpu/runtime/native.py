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


def coco_ap(detections: np.ndarray, ground_truths: np.ndarray) -> float:
    """detections (D, 6): [image_id, score, x1, y1, x2, y2];
    ground_truths (G, 5): [image_id, x1, y1, x2, y2]. Returns AP@[.5:.95]."""
    nat = get_native()
    det = np.ascontiguousarray(detections, np.float32)
    det = det[np.argsort(-det[:, 1])] if len(det) else det
    gt = np.ascontiguousarray(ground_truths, np.float32)
    return float(nat.coco_average_precision(det, gt, len(det), len(gt)))
