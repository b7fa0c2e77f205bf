"""Functional NN primitives: explicit param pytrees + pure apply functions.

Layout conventions (TPU-native, not the reference's NCHW):
- images / feature maps: NHWC
- conv kernels: (kh, kw, in_ch, out_ch)  [HWIO]
- linear kernels: (in, out)

Norms and softmax always compute in fp32; matmuls run in the policy compute
dtype (bf16) with fp32 accumulation requested via ``preferred_element_type``.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# init helpers
# ---------------------------------------------------------------------------


def _fan_in_normal(key, shape, fan_in, dtype):
    std = 1.0 / math.sqrt(max(fan_in, 1))
    return (jax.random.normal(key, shape, jnp.float32) * std).astype(dtype)


def init_linear(key, in_dim: int, out_dim: int, *, bias: bool = True,
                dtype=jnp.bfloat16, zero_init: bool = False):
    kkey, _ = jax.random.split(key)
    kernel = (jnp.zeros((in_dim, out_dim), dtype) if zero_init
              else _fan_in_normal(kkey, (in_dim, out_dim), in_dim, dtype))
    p = {"kernel": kernel}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def init_conv(key, in_ch: int, out_ch: int, kernel_size: int = 3, *,
              bias: bool = True, dtype=jnp.bfloat16, zero_init: bool = False):
    kkey, _ = jax.random.split(key)
    shape = (kernel_size, kernel_size, in_ch, out_ch)
    fan_in = in_ch * kernel_size * kernel_size
    kernel = (jnp.zeros(shape, dtype) if zero_init
              else _fan_in_normal(kkey, shape, fan_in, dtype))
    p = {"kernel": kernel}
    if bias:
        p["bias"] = jnp.zeros((out_ch,), dtype)
    return p


def init_norm(num_channels: int, dtype=jnp.float32):
    # norm affine params are kept fp32 — they are tiny and precision-sensitive
    return {"scale": jnp.ones((num_channels,), dtype),
            "bias": jnp.zeros((num_channels,), dtype)}


def init_embedding(key, vocab: int, dim: int, dtype=jnp.bfloat16, std=0.02):
    return {"embedding": (jax.random.normal(key, (vocab, dim), jnp.float32) * std).astype(dtype)}


# ---------------------------------------------------------------------------
# apply functions
# ---------------------------------------------------------------------------


def linear(params, x, *, precision=None):
    y = jnp.dot(x, params["kernel"].astype(x.dtype),
                preferred_element_type=jnp.float32, precision=precision)
    y = y.astype(x.dtype)
    if "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y


import os

# fp32 conv outputs (+fused convert) vs native-dtype outputs were measured
# perf-neutral on v5e; native is now the DEFAULT because the fp32 variant's
# mixed-dtype backward conv (fp32 cotangent x bf16 kernel) is rejected by
# lax.conv_general_dilated under bf16 training. The MXU accumulates in fp32
# internally either way, so outputs are bit-identical.
_CONV_FP32_OUT = os.environ.get("IDMVTON_CONV_FP32_OUT") == "1"


def conv2d(params, x, *, stride: int = 1, padding="SAME", impl=None):
    """NHWC conv. ``padding`` is "SAME", "VALID" or explicit pairs.

    ``impl`` selects 'xla'/'pallas' per the repo convention (None = auto:
    pallas on TPU). The MXU accumulates bf16 convs in fp32 internally
    either way; IDMVTON_CONV_FP32_OUT=1 requests an fp32 output + fused
    convert instead (measured neutral; breaks bf16 training's backward
    conv)."""
    k = params["kernel"]
    if (stride == 1 and k.shape[:2] == (3, 3)
            and (padding == "SAME" or padding == ((1, 1), (1, 1)))):
        from idmvton_tpu.ops.dispatch import resolve
        from idmvton_tpu.ops.pallas_conv import (
            conv3x3, conv3x3_supported, conv3x3_hblock,
            conv3x3_hblock_supported,
        )
        if resolve(impl) == "pallas":
            # IDMVTON_CONV_HBLOCK_ALL=1: prefer the HBM-input DMA-halo
            # kernel even where the whole activation fits VMEM (A/B knob —
            # hblock measured 95% MFU at VAE scale vs 80% for whole-act at
            # UNet scale, and it skips the host-side jnp.pad)
            prefer_hblock = os.environ.get("IDMVTON_CONV_HBLOCK_ALL") == "1"
            if prefer_hblock and conv3x3_hblock_supported(x, k):
                return conv3x3_hblock(x, k.astype(x.dtype),
                                      params.get("bias"))
            if conv3x3_supported(x, k):
                return conv3x3(x, k.astype(x.dtype), params.get("bias"))
            if conv3x3_hblock_supported(x, k):
                return conv3x3_hblock(x, k.astype(x.dtype),
                                      params.get("bias"))
    y = jax.lax.conv_general_dilated(
        x,
        params["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32 if _CONV_FP32_OUT else None,
    ).astype(x.dtype)
    if "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y


def group_norm(params, x, *, num_groups: int, eps: float = 1e-5,
               act: Optional[str] = None, impl=None):
    """GroupNorm over channel-last input of any spatial rank.

    Statistics accumulate in fp32 via the reduction dtype WITHOUT
    materializing an fp32 copy of the activation (the fp32 round-trip was a
    measured 37 ms/UNet-forward of convert_reduce fusions on v5e); the
    normalize/affine math then runs elementwise, fusing into neighbors.
    Optionally fuses a SiLU activation.
    """
    b = x.shape[0]
    c = x.shape[-1]
    g = num_groups
    # Lane-preserving stats: reduce spatial (sublane) axes per channel, then
    # combine channels into groups on the tiny (B, C) tensor. A naive
    # reshape(b, -1, g, c//g) puts c//g (e.g. 10) in the lane dim and forces
    # relayouts of the whole activation (measured ~40 ms/UNet-forward).
    spatial_axes = tuple(range(1, x.ndim - 1))
    n_spatial = 1
    for a in spatial_axes:
        n_spatial *= x.shape[a]
    from idmvton_tpu.ops.dispatch import resolve
    from idmvton_tpu.ops.pallas_norm import gn_spatial_stats, gn_stats_supported
    xf32 = x.astype(jnp.float32)
    if resolve(impl) == "pallas" and gn_stats_supported(x) and n_spatial >= 64:
        # XLA lowers this spatial reduce to a *convolution* at several UNet
        # sites (~50x off bandwidth, 17.8 ms/tryon-fwd); the Pallas kernel
        # keeps channels in lanes and accumulates with plain vector adds
        s1, s2 = gn_spatial_stats(x)
        mean_c = s1 / n_spatial                                # (B, C)
        mean2_c = s2 / n_spatial
    else:
        mean_c = jnp.mean(xf32, axis=spatial_axes)             # (B, C)
        mean2_c = jnp.mean(jnp.square(xf32), axis=spatial_axes)
    gmean = jnp.mean(mean_c.reshape(b, g, c // g), axis=-1)    # (B, G)
    gmean2 = jnp.mean(mean2_c.reshape(b, g, c // g), axis=-1)
    var = jnp.maximum(gmean2 - jnp.square(gmean), 0.0)
    inv = jax.lax.rsqrt(var + eps)                             # (B, G)
    inv_c = jnp.repeat(inv, c // g, axis=-1)                   # (B, C)
    mean_bc = jnp.repeat(gmean, c // g, axis=-1)
    w = inv_c * params["scale"].astype(jnp.float32)[None]
    bias = params["bias"].astype(jnp.float32)[None] - mean_bc * w
    shape = (b,) + (1,) * (x.ndim - 2) + (c,)
    xf = xf32 * w.reshape(shape) + bias.reshape(shape)
    if act == "silu":
        xf = jax.nn.silu(xf)
    return xf.astype(x.dtype)


def layer_norm(params, x, *, eps: float = 1e-5):
    # NOTE: a fused Pallas LN exists (ops/pallas_norm.py) but measured SLOWER
    # in-graph (306 vs 296 ms/UNet-fwd) — the custom-call boundary outweighs
    # XLA's fused convert+reduce at 210 call sites. Kept unwired.
    mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
    mean2 = jnp.mean(jnp.square(x), axis=-1, keepdims=True, dtype=jnp.float32)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    xf = (x.astype(jnp.float32) - mean) * inv
    xf = xf * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return xf.astype(x.dtype)


def embedding_lookup(params, ids):
    return params["embedding"][ids]


def timestep_embedding(timesteps, dim: int, *, max_period: float = 10000.0,
                       flip_sin_to_cos: bool = True, downscale_freq_shift: float = 0.0):
    """Sinusoidal timestep embedding, fp32 (diffusers Timesteps semantics:
    flip_sin_to_cos=True for SDXL)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32)
        / (half - downscale_freq_shift)
    )
    args = timesteps.astype(jnp.float32)[..., None] * freqs
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb


def gelu(x, approximate: bool = False):
    return jax.nn.gelu(x, approximate=approximate)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


ACTIVATIONS = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "quick_gelu": quick_gelu,
    "silu": jax.nn.silu,
}
