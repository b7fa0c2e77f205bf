"""IP-Adapter-plus Perceiver Resampler.

16 learned latent queries attend over [image tokens | latents] for 4 layers,
then project 1280 -> 2048 (reference: ip_adapter/resampler.py:129-176
Resampler, :34 PerceiverAttention, installed as encoder_hid_proj at
src/unet_hacked_tryon.py:476-485).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from idmvton_tpu.core.config import ResamplerConfig
from idmvton_tpu.models.layers import init_linear, init_norm, linear, layer_norm
from idmvton_tpu.ops.attention import sdpa


def init_resampler(key, cfg: ResamplerConfig, dtype=jnp.bfloat16):
    keys = iter(jax.random.split(key, cfg.depth * 6 + 8))
    nk = lambda: next(keys)
    inner = cfg.heads * cfg.dim_head
    latents = jax.random.normal(nk(), (cfg.num_queries, cfg.dim), jnp.float32)
    latents = (latents / (cfg.dim ** 0.5)).astype(dtype)
    layers = []
    for _ in range(cfg.depth):
        layers.append({
            "ln_x": init_norm(cfg.dim),
            "ln_latents": init_norm(cfg.dim),
            "to_q": init_linear(nk(), cfg.dim, inner, bias=False, dtype=dtype),
            "to_kv": init_linear(nk(), cfg.dim, inner * 2, bias=False, dtype=dtype),
            "to_out": init_linear(nk(), inner, cfg.dim, bias=False, dtype=dtype),
            "ff_ln": init_norm(cfg.dim),
            "ff_in": init_linear(nk(), cfg.dim, cfg.dim * cfg.ff_mult,
                                 bias=False, dtype=dtype),
            "ff_out": init_linear(nk(), cfg.dim * cfg.ff_mult, cfg.dim,
                                  bias=False, dtype=dtype),
        })
    return {
        "latents": latents,
        "proj_in": init_linear(nk(), cfg.embedding_dim, cfg.dim, dtype=dtype),
        "layers": layers,
        "proj_out": init_linear(nk(), cfg.dim, cfg.output_dim, dtype=dtype),
        "norm_out": init_norm(cfg.output_dim),
    }


def resampler_apply(params, cfg: ResamplerConfig, x):
    """x: (B, S, embedding_dim) image tokens (ViT-H penultimate states).
    Returns (B, num_queries, output_dim) ip tokens."""
    b = x.shape[0]
    heads, hd = cfg.heads, cfg.dim_head
    lat = jnp.broadcast_to(params["latents"][None].astype(x.dtype),
                           (b, cfg.num_queries, cfg.dim))
    x = linear(params["proj_in"], x)
    for lyr in params["layers"]:
        xn = layer_norm(lyr["ln_x"], x)
        ln = layer_norm(lyr["ln_latents"], lat)
        kv_in = jnp.concatenate([xn, ln], axis=1)
        q = linear(lyr["to_q"], ln).reshape(b, cfg.num_queries, heads, hd)
        kv = linear(lyr["to_kv"], kv_in).reshape(b, kv_in.shape[1], 2, heads, hd)
        k, v = kv[:, :, 0], kv[:, :, 1]
        attn = sdpa(q, k, v, impl="xla").reshape(b, cfg.num_queries, heads * hd)
        lat = lat + linear(lyr["to_out"], attn)
        h = layer_norm(lyr["ff_ln"], lat)
        h = linear(lyr["ff_in"], h)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(lat.dtype)
        lat = lat + linear(lyr["ff_out"], h)
    out = linear(params["proj_out"], lat)
    return layer_norm(params["norm_out"], out)
