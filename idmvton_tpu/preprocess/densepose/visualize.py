"""DensePose IUV extraction + fine-segmentation visualization, and the
end-to-end ``DensePose`` wrapper producing the pose conditioning image.

reference: gradio_demo/apply_net.py ShowAction with the `dp_segm` visualizer
(gradio_demo/densepose/vis/densepose_results.py
DensePoseResultsFineSegmentationVisualizer): extract per-detection 24-part
labels + UV, then alpha-blend a colormapped label matrix onto the grayscale
person image — the "image-densepose" conditioning input
(gradio_demo/app.py:168-172).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from idmvton_tpu.preprocess.densepose.rcnn import (
    DensePoseConfig, init_densepose_rcnn, densepose_rcnn_apply,
)

PIXEL_MEAN_BGR = np.asarray([103.530, 116.280, 123.675], np.float32)


def extract_iuv(coarse, fine, u, v):
    """Per-detection IUV from head outputs (densepose chart result
    semantics): label = argmax(fine) gated by coarse fg; u/v gathered at the
    label channel. Inputs (K, S, S, C) -> labels (K, S, S) uint8,
    uv (K, S, S, 2) float in [0, 1]."""
    fg = jnp.argmax(coarse, axis=-1) > 0
    labels = jnp.argmax(fine, axis=-1)
    labels = jnp.where(fg, labels, 0).astype(jnp.uint8)
    lab_idx = labels.astype(jnp.int32)[..., None]
    uu = jnp.take_along_axis(u, lab_idx, axis=-1)[..., 0]
    vv = jnp.take_along_axis(v, lab_idx, axis=-1)[..., 0]
    uv = jnp.clip(jnp.stack([uu, vv], axis=-1), 0.0, 1.0)
    return labels, uv


def paint_segmentation(image_rgb: np.ndarray, boxes: np.ndarray,
                       labels: np.ndarray, valid: np.ndarray,
                       *, alpha: float = 0.7,
                       num_parts: int = 24) -> np.ndarray:
    """Gray image + colormapped part labels inside each detection box
    (MatrixVisualizer semantics: cv2 PARULA colormap, alpha 0.7,
    val_scale 255/24)."""
    import cv2
    gray = cv2.cvtColor(cv2.cvtColor(image_rgb, cv2.COLOR_RGB2GRAY),
                        cv2.COLOR_GRAY2BGR)
    out = gray.copy()
    h, w = out.shape[:2]
    for k in range(len(boxes)):
        if not valid[k]:
            continue
        x1, y1, x2, y2 = [int(round(float(c))) for c in boxes[k]]
        x1, y1 = max(x1, 0), max(y1, 0)
        x2, y2 = min(x2, w), min(y2, h)
        if x2 <= x1 or y2 <= y1:
            continue
        lab = cv2.resize(labels[k].astype(np.uint8), (x2 - x1, y2 - y1),
                         interpolation=cv2.INTER_NEAREST)
        matrix = np.clip(lab.astype(np.float32) * (255.0 / num_parts),
                         0, 255).astype(np.uint8)
        colored = cv2.applyColorMap(matrix, cv2.COLORMAP_PARULA)
        mask = lab > 0
        region = out[y1:y2, x1:x2]
        region[mask] = (region[mask] * (1 - alpha)
                        + colored[mask] * alpha).astype(np.uint8)
        out[y1:y2, x1:x2] = region
    return out[:, :, ::-1]  # BGR -> RGB


class DensePose:
    """image -> densepose conditioning image (RGB uint8, input size).

    Mirrors apply_net 'show' dp_segm (ShowAction.execute,
    gradio_demo/apply_net.py:270-285): ResizeShortestEdge(800, max 1333),
    caffe-style BGR mean subtraction, R-CNN, fine-seg painting."""

    def __init__(self, params=None, cfg: DensePoseConfig = DensePoseConfig(),
                 *, short_edge: int = 800, max_size: int = 1333):
        self.cfg = cfg
        self.params = params if params is not None else init_densepose_rcnn(
            jax.random.PRNGKey(0), cfg)
        self.short_edge = short_edge
        self.max_size = max_size
        self._apply = jax.jit(lambda p, x: densepose_rcnn_apply(p, x, cfg))

    @staticmethod
    def from_pickle(path: str, cfg: DensePoseConfig = DensePoseConfig()
                    ) -> "DensePose":
        from idmvton_tpu.preprocess.densepose.convert import (
            load_d2_pickle, convert_densepose,
        )
        return DensePose(convert_densepose(load_d2_pickle(path), cfg), cfg)

    def _preprocess(self, image_rgb: np.ndarray) -> Tuple[np.ndarray, float]:
        import cv2
        h, w = image_rgb.shape[:2]
        scale = self.short_edge / min(h, w)
        if max(h, w) * scale > self.max_size:
            scale = self.max_size / max(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        resized = cv2.resize(image_rgb, (nw, nh),
                             interpolation=cv2.INTER_LINEAR)
        bgr = resized[:, :, ::-1].astype(np.float32) - PIXEL_MEAN_BGR
        # pad to stride-32 multiples (FPN divisibility)
        ph = (32 - nh % 32) % 32
        pw = (32 - nw % 32) % 32
        bgr = np.pad(bgr, ((0, ph), (0, pw), (0, 0)))
        return bgr, scale

    def detect(self, image_rgb: np.ndarray):
        """Detection-only forward: (boxes (K,4) xyxy in input-image coords,
        scores (K,), valid (K,) bool) with K = cfg.num_detections. The
        model half of the eval harness (preprocess/densepose/evaluate.py),
        like d2's model-in-eval-mode under inference_on_dataset."""
        bgr, scale = self._preprocess(image_rgb)
        out = self._apply(self.params, jnp.asarray(bgr[None]))
        return (np.asarray(out["boxes"]) / scale,
                np.asarray(out["scores"]),
                np.asarray(out["valid"]).astype(bool))

    def __call__(self, image_rgb: np.ndarray) -> np.ndarray:
        bgr, scale = self._preprocess(image_rgb)
        out = self._apply(self.params, jnp.asarray(bgr[None]))
        boxes = np.asarray(out["boxes"]) / scale
        valid = np.asarray(out["valid"])
        labels, _ = extract_iuv(out["coarse"], out["fine"], out["u"], out["v"])
        return paint_segmentation(image_rgb, boxes, np.asarray(labels), valid)
