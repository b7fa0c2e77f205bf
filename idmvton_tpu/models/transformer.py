"""Spatial Transformer2D: GN -> linear proj_in -> N BasicTransformerBlocks ->
linear proj_out -> +residual (SDXL use_linear_projection=True layout;
reference: src/transformerhacked_{tryon,garmnet}.py:45,246).

Garment features flow through as explicit tuples (static-length pytrees)
instead of the reference's mutable running index (src/unet_hacked_tryon.py:1254)
— this keeps every call remat-able and scan-friendly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from idmvton_tpu.models.layers import init_linear, init_norm, linear, group_norm
from idmvton_tpu.models.attention import init_transformer_block, transformer_block


def init_transformer2d(key, channels: int, *, depth: int, heads: int,
                       head_dim: int, context_dim: int,
                       ip_adapter: bool = False, dtype=jnp.bfloat16):
    ks = jax.random.split(key, depth + 2)
    inner = heads * head_dim
    return {
        "norm": init_norm(channels),
        "proj_in": init_linear(ks[0], channels, inner, dtype=dtype),
        "blocks": [
            init_transformer_block(ks[1 + i], inner, heads=heads,
                                   head_dim=head_dim, context_dim=context_dim,
                                   ip_adapter=ip_adapter, dtype=dtype)
            for i in range(depth)
        ],
        "proj_out": init_linear(ks[depth + 1], inner, channels, dtype=dtype),
    }


def transformer2d(params, x, context, *, heads: int, num_groups: int = 32,
                  garment_mode: str = "none",
                  garment_feats: Optional[Tuple[jnp.ndarray, ...]] = None,
                  garment_uncond_zero: bool = False,
                  ip_num_tokens: int = 0, ip_scale: float = 1.0,
                  impl: Optional[str] = None
                  ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
    """x: (B, H, W, C) NHWC.

    - consume mode: ``garment_feats`` must hold one (B, H*W, C) feature per
      block — or (B/2, H*W, C) with garment_uncond_zero=True (CFG layout,
      leading half of the batch sees zero garment KV).
    - emit mode: returns the per-block emitted features.
    Returns (output, emitted_features_tuple).
    """
    b, h, w, c = x.shape
    residual = x
    hs = group_norm(params["norm"], x, num_groups=num_groups, eps=1e-6,
                    impl=impl)
    hs = hs.reshape(b, h * w, c)
    hs = linear(params["proj_in"], hs)
    emitted = []
    for i, blk in enumerate(params["blocks"]):
        gf = garment_feats[i] if garment_mode == "consume" else None
        hs, em = transformer_block(blk, hs, context, heads=heads,
                                   garment_mode=garment_mode, garment_feat=gf,
                                   garment_uncond_zero=garment_uncond_zero,
                                   ip_num_tokens=ip_num_tokens,
                                   ip_scale=ip_scale, impl=impl)
        if garment_mode == "emit":
            emitted.append(em)
    hs = linear(params["proj_out"], hs)
    return hs.reshape(b, h, w, c) + residual, tuple(emitted)
