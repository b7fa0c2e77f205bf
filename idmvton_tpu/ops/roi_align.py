"""ROIAlign as a batched bilinear gather — XLA-native, static shapes.

The reference's hot native op (N2a): detectron2 CUDA ROIAlign
(gradio_demo/detectron2/layers/csrc/ROIAlignRotated/, wrapper
layers/roi_align.py), used by the box head + DensePose head pooling
(configs/Base-DensePose-RCNN-FPN.yaml:31-36). A TPU has no per-thread
scatter/gather kernels; the idiomatic formulation is a dense gather:
every (roi, bin, sample-point) becomes 4 gathers + bilinear weights, batched
over a fixed number of ROIs (XLA loves the static shape; invalid ROIs are
masked, matching detectron2's pad-free semantics via zero weights).

Implements detectron2 semantics: aligned=True (half-pixel offset),
sampling_ratio fixed (default 2), max/avg pooling = avg (detectron2 default).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def roi_align(features, boxes, box_indices, *, output_size: int,
              spatial_scale: float = 1.0, sampling_ratio: int = 2,
              aligned: bool = True):
    """features: (B, H, W, C); boxes: (R, 4) [x1, y1, x2, y2] in input-image
    coords; box_indices: (R,) int batch index per ROI (may be -1 for padded /
    invalid ROIs -> zero output). Returns (R, output_size, output_size, C).
    """
    b, h, w, c = features.shape
    r = boxes.shape[0]
    n = output_size
    s = sampling_ratio

    offset = 0.5 if aligned else 0.0
    bx = boxes.astype(jnp.float32) * spatial_scale - offset
    x1, y1, x2, y2 = bx[:, 0], bx[:, 1], bx[:, 2], bx[:, 3]
    roi_w = jnp.maximum(x2 - x1, 1e-6 if aligned else 1.0)
    roi_h = jnp.maximum(y2 - y1, 1e-6 if aligned else 1.0)
    bin_w = roi_w / n
    bin_h = roi_h / n

    # sample-point grid: (R, n, s) per axis
    iy = jnp.arange(n, dtype=jnp.float32)
    is_ = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    # y coords: y1 + (bin + frac) * bin_h
    ys = (y1[:, None, None]
          + (iy[None, :, None] + is_[None, None, :]) * bin_h[:, None, None])
    xs = (x1[:, None, None]
          + (iy[None, :, None] + is_[None, None, :]) * bin_w[:, None, None])
    ys = ys.reshape(r, n * s)   # (R, P) P = n*s
    xs = xs.reshape(r, n * s)

    def bilinear_gather(coords_y, coords_x):
        """(R, Py), (R, Px) -> (R, Py, Px, C) bilinear samples."""
        # detectron2: points outside (-1, size) contribute zero; in-range
        # coords are clamped to [0, size-1] before the bilinear split
        valid_y = (coords_y >= -1.0) & (coords_y <= h)
        valid_x = (coords_x >= -1.0) & (coords_x <= w)
        cy = jnp.clip(coords_y, 0.0, h - 1)
        cx = jnp.clip(coords_x, 0.0, w - 1)
        y0 = jnp.floor(cy)
        x0 = jnp.floor(cx)
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)
        y1i = jnp.clip(y0i + 1, 0, h - 1)
        x1i = jnp.clip(x0i + 1, 0, w - 1)
        wy1 = jnp.where(valid_y, cy - y0, 0.0)
        wy0 = jnp.where(valid_y, 1.0 - (cy - y0), 0.0)
        wx1 = jnp.where(valid_x, cx - x0, 0.0)
        wx0 = jnp.where(valid_x, 1.0 - (cx - x0), 0.0)

        bi = jnp.clip(box_indices, 0, b - 1)
        fmap = features[bi]                      # (R, H, W, C)

        def take(yi, xi):
            # gather rows then cols: (R, P, W, C) -> (R, Py, Px, C)
            rows = jnp.take_along_axis(
                fmap, yi[:, :, None, None].astype(jnp.int32), axis=1)
            return jnp.take_along_axis(
                rows, xi[:, None, :, None].astype(jnp.int32), axis=2)

        out = (take(y0i, x0i) * (wy0[:, :, None, None] * wx0[:, None, :, None])
               + take(y0i, x1i) * (wy0[:, :, None, None] * wx1[:, None, :, None])
               + take(y1i, x0i) * (wy1[:, :, None, None] * wx0[:, None, :, None])
               + take(y1i, x1i) * (wy1[:, :, None, None] * wx1[:, None, :, None]))
        return out

    samples = bilinear_gather(ys, xs)            # (R, n*s, n*s, C)
    samples = samples.reshape(r, n, s, n, s, c)
    pooled = jnp.mean(samples, axis=(2, 4))      # avg over sampling points
    valid = (box_indices >= 0)[:, None, None, None]
    return jnp.where(valid, pooled, 0.0).astype(features.dtype)
