"""Attention / transformer-block modules for the SDXL UNets.

One BasicTransformerBlock implementation covers all three reference variants:
- garment_mode="emit":    capture post-norm1 hidden states as the garment
  reference feature (reference: src/attentionhacked_garmnet.py:321-322).
- garment_mode="consume": self-attention with KV concat of the garment feature
  (reference: src/attentionhacked_tryon.py:334-348).
- garment_mode="none":    vanilla SDXL block.

Cross-attention optionally runs IP-Adapter decoupled attention: the context is
[text tokens | ip tokens] and the last ``ip_num_tokens`` are routed through
separate K/V projections (reference: ip_adapter/attention_processor.py:1949-1953).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from idmvton_tpu.models.layers import (
    init_linear, init_norm, linear, layer_norm,
)
from idmvton_tpu.ops.attention import sdpa, concat_kv_attention, decoupled_ip_attention


# ---------------------------------------------------------------------------
# attention projections
# ---------------------------------------------------------------------------


def init_attention(key, query_dim: int, *, context_dim: Optional[int] = None,
                   heads: int, head_dim: int, ip_adapter: bool = False,
                   dtype=jnp.bfloat16):
    context_dim = context_dim if context_dim is not None else query_dim
    inner = heads * head_dim
    ks = jax.random.split(key, 6)
    p = {
        "to_q": init_linear(ks[0], query_dim, inner, bias=False, dtype=dtype),
        "to_k": init_linear(ks[1], context_dim, inner, bias=False, dtype=dtype),
        "to_v": init_linear(ks[2], context_dim, inner, bias=False, dtype=dtype),
        "to_out": init_linear(ks[3], inner, query_dim, bias=True, dtype=dtype),
    }
    if ip_adapter:
        p["to_k_ip"] = init_linear(ks[4], context_dim, inner, bias=False, dtype=dtype)
        p["to_v_ip"] = init_linear(ks[5], context_dim, inner, bias=False, dtype=dtype)
    return p


def _split_heads(x, heads: int):
    b, s, _ = x.shape
    return x.reshape(b, s, heads, -1)


def _merge_heads(x):
    b, s, h, d = x.shape
    return x.reshape(b, s, h * d)


def self_attention(params, x, *, heads: int,
                   garment_feat: Optional[jnp.ndarray] = None,
                   impl: Optional[str] = None):
    """Self-attention; if ``garment_feat`` (B, M, C) is given, keys/values are
    the concat of own and garment tokens (KV-concat formulation of the
    reference's sequence concat + slice)."""
    q = _split_heads(linear(params["to_q"], x), heads)
    k = _split_heads(linear(params["to_k"], x), heads)
    v = _split_heads(linear(params["to_v"], x), heads)
    if garment_feat is not None:
        g = garment_feat.astype(x.dtype)
        k_ref = _split_heads(linear(params["to_k"], g), heads)
        v_ref = _split_heads(linear(params["to_v"], g), heads)
        out = concat_kv_attention(q, k, v, k_ref, v_ref, impl=impl)
    else:
        out = sdpa(q, k, v, impl=impl)
    return linear(params["to_out"], _merge_heads(out))


def cross_attention(params, x, context, *, heads: int,
                    ip_num_tokens: int = 0, ip_scale: float = 1.0,
                    impl: Optional[str] = None):
    """Cross-attention over text context, with optional decoupled IP branch.

    ``context`` is (B, S_text [+ ip_num_tokens], C). When the params carry
    to_k_ip/to_v_ip, the trailing ip tokens get their own K/V and an
    independently-normalized softmax (IPAttnProcessor2_0 semantics)."""
    q = _split_heads(linear(params["to_q"], x), heads)
    if "to_k_ip" in params and ip_num_tokens > 0:
        text_ctx = context[:, :-ip_num_tokens]
        ip_ctx = context[:, -ip_num_tokens:]
        k = _split_heads(linear(params["to_k"], text_ctx), heads)
        v = _split_heads(linear(params["to_v"], text_ctx), heads)
        k_ip = _split_heads(linear(params["to_k_ip"], ip_ctx), heads)
        v_ip = _split_heads(linear(params["to_v_ip"], ip_ctx), heads)
        out = decoupled_ip_attention(q, k, v, k_ip, v_ip, ip_scale=ip_scale,
                                     impl=impl)
    else:
        k = _split_heads(linear(params["to_k"], context), heads)
        v = _split_heads(linear(params["to_v"], context), heads)
        out = sdpa(q, k, v, impl=impl)
    return linear(params["to_out"], _merge_heads(out))


# ---------------------------------------------------------------------------
# GEGLU feed-forward
# ---------------------------------------------------------------------------


def init_feedforward(key, dim: int, *, mult: int = 4, dtype=jnp.bfloat16):
    k1, k2 = jax.random.split(key)
    inner = dim * mult
    return {
        "proj_in": init_linear(k1, dim, inner * 2, dtype=dtype),   # GEGLU: value+gate
        "proj_out": init_linear(k2, inner, dim, dtype=dtype),
    }


def feedforward(params, x):
    h = linear(params["proj_in"], x)
    value, gate = jnp.split(h, 2, axis=-1)
    h = value * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(x.dtype)
    return linear(params["proj_out"], h)


# ---------------------------------------------------------------------------
# BasicTransformerBlock
# ---------------------------------------------------------------------------


def init_transformer_block(key, dim: int, *, heads: int, head_dim: int,
                           context_dim: int, ip_adapter: bool = False,
                           dtype=jnp.bfloat16):
    ks = jax.random.split(key, 3)
    return {
        "norm1": init_norm(dim),
        "attn1": init_attention(ks[0], dim, heads=heads, head_dim=head_dim,
                                dtype=dtype),
        "norm2": init_norm(dim),
        "attn2": init_attention(ks[1], dim, context_dim=context_dim,
                                heads=heads, head_dim=head_dim,
                                ip_adapter=ip_adapter, dtype=dtype),
        "norm3": init_norm(dim),
        "ff": init_feedforward(ks[2], dim, dtype=dtype),
    }


def transformer_block(params, x, context, *, heads: int,
                      garment_mode: str = "none",
                      garment_feat: Optional[jnp.ndarray] = None,
                      ip_num_tokens: int = 0, ip_scale: float = 1.0,
                      impl: Optional[str] = None
                      ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Returns (hidden_states, emitted_garment_feature_or_None)."""
    emitted = None
    h = layer_norm(params["norm1"], x)
    if garment_mode == "emit":
        # GarmentNet captures the post-norm1, pre-attention hidden states
        # (reference: src/attentionhacked_garmnet.py:321-322).
        emitted = h
    x = x + self_attention(
        params["attn1"], h, heads=heads,
        garment_feat=garment_feat if garment_mode == "consume" else None,
        impl=impl)
    h = layer_norm(params["norm2"], x)
    x = x + cross_attention(params["attn2"], h, context, heads=heads,
                            ip_num_tokens=ip_num_tokens, ip_scale=ip_scale,
                            impl=impl)
    h = layer_norm(params["norm3"], x)
    x = x + feedforward(params["ff"], h)
    return x, emitted
