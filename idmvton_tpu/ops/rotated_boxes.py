"""Rotated box IoU + rotated NMS — XLA-native (static shapes).

The reference ships these as CUDA/C++ (N2b: gradio_demo/detectron2/layers/
csrc/nms_rotated/, box_iou_rotated_cuda.cu) for detectron2's RRPN-style
heads. TPU formulation: convex polygon intersection (Sutherland-Hodgman over
the two 4-gons with fixed 16-vertex masked buffers, branch-free), vmapped
over box pairs; NMS reuses the fixed-shape greedy loop pattern of ops/nms.py.

Boxes: (cx, cy, w, h, angle_degrees), angle CCW — detectron2 convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MAX_VERTS = 16  # intersection of two 4-gons has <= 8 vertices; padded


def box_corners(boxes):
    """(..., 5) -> (..., 4, 2) CCW corner coordinates."""
    cx, cy, w, h, a = (boxes[..., i] for i in range(5))
    t = jnp.deg2rad(a)
    cos, sin = jnp.cos(t), jnp.sin(t)
    dx = jnp.stack([w / 2, -w / 2, -w / 2, w / 2], -1)
    dy = jnp.stack([h / 2, h / 2, -h / 2, -h / 2], -1)
    x = cx[..., None] + dx * cos[..., None] - dy * sin[..., None]
    y = cy[..., None] + dx * sin[..., None] + dy * cos[..., None]
    return jnp.stack([x, y], axis=-1)


def _clip_polygon(verts, count, a, b):
    """One Sutherland-Hodgman step: keep the part of the masked polygon
    (verts[:count], ordered) on the left of edge a->b (CCW interior)."""
    n = verts.shape[0]
    edge = b - a
    # signed area cross(edge, p - a): > 0 means left of a->b
    d = edge[0] * (verts[:, 1] - a[1]) - edge[1] * (verts[:, 0] - a[0])

    def body(i, state):
        out_verts, out_count = state
        j = jnp.where(i + 1 < count, i + 1, 0)
        vi, vj = verts[i], verts[j]
        di, dj = d[i], d[j]
        active = i < count
        emit_v = active & (di >= 0)
        out_verts = jax.lax.dynamic_update_slice(
            out_verts,
            jnp.where(emit_v, vi, jax.lax.dynamic_slice(
                out_verts, (out_count, 0), (1, 2))[0])[None],
            (out_count, 0))
        out_count = out_count + emit_v.astype(jnp.int32)
        crosses = active & ((di >= 0) != (dj >= 0))
        denom = di - dj
        t = di / jnp.where(jnp.abs(denom) < 1e-12,
                           jnp.where(denom < 0, -1e-12, 1e-12), denom)
        inter = vi + t * (vj - vi)
        out_verts = jax.lax.dynamic_update_slice(
            out_verts,
            jnp.where(crosses, inter, jax.lax.dynamic_slice(
                out_verts, (out_count, 0), (1, 2))[0])[None],
            (out_count, 0))
        out_count = out_count + crosses.astype(jnp.int32)
        return out_verts, out_count

    out = jnp.zeros((n, 2), verts.dtype)
    return jax.lax.fori_loop(0, n, body, (out, jnp.int32(0)))


def _polygon_area(verts, count):
    """Shoelace over the first ``count`` (ordered) vertices."""
    n = verts.shape[0]
    idx = jnp.arange(n)
    nxt = jnp.where(idx + 1 < count, idx + 1, 0)
    vj = verts[nxt]
    cross = verts[:, 0] * vj[:, 1] - vj[:, 0] * verts[:, 1]
    cross = jnp.where(idx < count, cross, 0.0)
    return jnp.abs(jnp.sum(cross)) / 2.0


def _pair_intersection_area(box_a, box_b):
    ca = box_corners(box_a)           # (4, 2) CCW
    cb = box_corners(box_b)
    verts = jnp.zeros((_MAX_VERTS, 2), ca.dtype).at[:4].set(ca)
    count = jnp.int32(4)
    for i in range(4):
        verts, count = _clip_polygon(verts, count, cb[i], cb[(i + 1) % 4])
    return _polygon_area(verts, count)


def box_iou_rotated(a, b):
    """a: (N, 5), b: (M, 5) -> (N, M) IoU of rotated boxes."""
    inter = jax.vmap(lambda ba: jax.vmap(
        lambda bb: _pair_intersection_area(ba, bb))(b))(a)
    area_a = a[:, 2] * a[:, 3]
    area_b = b[:, 2] * b[:, 3]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms_rotated_mask(boxes, scores, *, iou_threshold: float = 0.5):
    """Greedy rotated NMS -> keep mask (N,) (csrc/nms_rotated semantics)."""
    n = boxes.shape[0]
    iou = box_iou_rotated(boxes, boxes)
    order = jnp.argsort(-scores)
    inv = jnp.argsort(order)
    iou_sorted = iou[order][:, order]

    def body(i, keep):
        suppressed = jnp.any(
            jnp.where(jnp.arange(n) < i, keep, False)
            & (iou_sorted[:, i] > iou_threshold))
        return keep.at[i].set(~suppressed)

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), bool))
    return keep_sorted[inv]
