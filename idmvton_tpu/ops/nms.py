"""Fixed-shape NMS and box IoU — XLA-friendly replacements for the
reference's native kernels (N2b: detectron2 csrc/nms_rotated + torchvision
nms on the hot RPN path, wrapper gradio_demo/detectron2/layers/nms.py).

TPU formulation: static-size greedy suppression over the precomputed IoU
matrix with a lax.fori_loop — no dynamic output shapes; callers get a keep
mask (and can top-k it to a fixed post-NMS count, the detectron2
POST_NMS_TOPK contract).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_iou(a, b):
    """a: (N, 4), b: (M, 4) [x1, y1, x2, y2] -> (N, M) IoU."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms_mask(boxes, scores, *, iou_threshold: float = 0.7,
             score_threshold: float = float("-inf")):
    """Greedy NMS. boxes (N, 4), scores (N,) -> keep mask (N,) bool.

    Equivalent to torchvision.ops.nms over the valid (score > threshold)
    boxes; padded/invalid boxes never suppress anything.
    """
    n = boxes.shape[0]
    valid = scores > score_threshold
    iou = box_iou(boxes, boxes)
    order = jnp.argsort(-scores)  # descending
    inv = jnp.argsort(order)
    iou_sorted = iou[order][:, order]   # (N, N) in score order
    valid_sorted = valid[order]

    def body(i, keep):
        # box i survives if valid and no higher-scoring kept box overlaps it
        suppressed = jnp.any(
            jnp.where(jnp.arange(n) < i, keep, False)
            & (iou_sorted[:, i] > iou_threshold))
        return keep.at[i].set(valid_sorted[i] & ~suppressed)

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), bool))
    return keep_sorted[inv]


def nms_topk(boxes, scores, *, iou_threshold: float = 0.7, topk: int = 100,
             score_threshold: float = float("-inf")):
    """NMS + fixed-size top-k selection. Returns (boxes (K,4), scores (K,),
    indices (K,) with -1 padding). The static K replaces detectron2's dynamic
    post-NMS tensors (POST_NMS_TOPK)."""
    keep = nms_mask(boxes, scores, iou_threshold=iou_threshold,
                    score_threshold=score_threshold)
    masked_scores = jnp.where(keep, scores, -jnp.inf)
    n = boxes.shape[0]
    if n < topk:  # pad inputs so the output shape is always (topk, ...)
        pad = topk - n
        masked_scores = jnp.pad(masked_scores, (0, pad),
                                constant_values=-jnp.inf)
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
    top_scores, idx = jax.lax.top_k(masked_scores, topk)
    valid = jnp.isfinite(top_scores)
    out_boxes = jnp.where(valid[:, None], boxes[idx], 0.0)
    out_idx = jnp.where(valid, idx, -1)
    out_scores = jnp.where(valid, top_scores, 0.0)
    return out_boxes, out_scores, out_idx
