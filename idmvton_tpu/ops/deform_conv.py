"""Deformable / modulated-deformable convolution as an XLA bilinear-gather.

The reference implements this as 2.5k LoC of CUDA im2col
(gradio_demo/detectron2/layers/csrc/deformable/, SURVEY N1 — optional
backbone op, not on the R50-FPN DensePose serving path). TPU formulation:
sample the input at (grid + learned offset) positions with a batched bilinear
gather, then contract the K*C sampled features with the kernel on the MXU —
the same math, no scatter/atomic ops, differentiable for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def deform_conv2d(x, offsets, kernel, *, mask=None, stride: int = 1,
                  padding: int = 1, bias=None):
    """x: (B, H, W, C); offsets: (B, Ho, Wo, 2*K) in (dy, dx) pairs per tap
    (torchvision/detectron2 channel order); kernel: (kh, kw, C, O);
    mask: optional (B, Ho, Wo, K) modulation (DCNv2). Returns (B, Ho, Wo, O).
    """
    b, h, w, c = x.shape
    kh, kw, _, o = kernel.shape
    k = kh * kw
    _, ho, wo, _ = offsets.shape

    # base sampling grid (top-left aligned with torch semantics)
    ys = jnp.arange(ho) * stride - padding
    xs = jnp.arange(wo) * stride - padding
    ky, kx = jnp.meshgrid(jnp.arange(kh), jnp.arange(kw), indexing="ij")
    base_y = ys[:, None, None] + ky.reshape(-1)[None, None, :]   # (Ho,1,K)
    base_x = xs[None, :, None] + kx.reshape(-1)[None, None, :]   # (1,Wo,K)

    off = offsets.reshape(b, ho, wo, k, 2)
    sy = base_y[None, :, :, :] + off[..., 0]
    sx = base_x[None, :, :, :] + off[..., 1]

    # bilinear sample: zero outside
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = sy - y0
    wx = sx - x0

    def gather(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat = x.reshape(b, h * w, c)
        idx = (yc * w + xc).reshape(b, -1)                 # (B, Ho*Wo*K)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        vals = vals.reshape(b, ho, wo, k, c)
        return jnp.where(inside[..., None], vals, 0.0)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wy = wy[..., None]
    wx = wx[..., None]
    samples = ((1 - wy) * (1 - wx) * v00 + (1 - wy) * wx * v01
               + wy * (1 - wx) * v10 + wy * wx * v11)      # (B,Ho,Wo,K,C)
    if mask is not None:
        samples = samples * mask[..., None]

    out = jnp.einsum("bhwkc,kco->bhwo",
                     samples, kernel.reshape(k, c, o),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out
