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
    """Projections are stored FUSED for TPU efficiency: ~400 small
    serially-dependent GEMMs per UNet forward expose ~0.3 ms/launch pipeline
    latency (measured: 3072x1280x1280 chained GEMMs run at 31 TF/s vs 117 at
    N=10240), so q/k/v fold into one wide GEMM:
    - self-attention: ``to_qkv`` (dim -> 3*inner)
    - cross-attention: ``to_q`` + fused ``to_kv`` (+ ``to_kv_ip``)
    The torch<->jax converter splits/concats to the reference's separate
    to_q/to_k/to_v (weights/converter.py)."""
    is_cross = context_dim is not None
    context_dim = context_dim if is_cross else query_dim
    inner = heads * head_dim
    ks = jax.random.split(key, 6)
    if not is_cross:
        return {
            "to_qkv": init_linear(ks[0], query_dim, 3 * inner, bias=False,
                                  dtype=dtype),
            "to_out": init_linear(ks[3], inner, query_dim, bias=True,
                                  dtype=dtype),
        }
    p = {
        "to_q": init_linear(ks[0], query_dim, inner, bias=False, dtype=dtype),
        "to_kv": init_linear(ks[1], context_dim, 2 * inner, bias=False,
                             dtype=dtype),
        "to_out": init_linear(ks[3], inner, query_dim, bias=True, dtype=dtype),
    }
    if ip_adapter:
        p["to_kv_ip"] = init_linear(ks[4], context_dim, 2 * inner, bias=False,
                                    dtype=dtype)
    return p


def _split_heads(x, heads: int):
    b, s, _ = x.shape
    return x.reshape(b, s, heads, -1)


def _merge_heads(x):
    b, s, h, d = x.shape
    return x.reshape(b, s, h * d)


def self_attention(params, x, *, heads: int,
                   garment_feat: Optional[jnp.ndarray] = None,
                   garment_uncond_zero: bool = False,
                   norm: Optional[dict] = None,
                   impl: Optional[str] = None):
    """Self-attention; if ``garment_feat`` is given, keys/values span the
    concat of own and garment tokens (reference attn(cat([x, g]))[:, :N],
    src/attentionhacked_tryon.py:334-348).

    garment_feat is (B, M, C), or (B/2, M, C) with garment_uncond_zero=True:
    the CFG layout where the leading B/2 rows (uncond half) see all-zero
    garment KV (reference zeros-concat, src/tryon_pipeline.py:1787). On TPU
    the flash kernel consumes the QKV GEMM output directly and folds the
    zero half in analytically (softmax sink) — the zeros are never
    materialized, projected, or attended.
    """
    from idmvton_tpu.ops.dispatch import resolve
    from idmvton_tpu.ops.pallas_norm import (
        ln_linear, ln_linear_supported, proj_kernel, dequantize_int8,
    )
    b, s, _ = x.shape
    inner = params["to_out"]["kernel"].shape[0]
    to_qkv = params["to_qkv"]
    quantized = "kernel_i8" in to_qkv
    if norm is not None and resolve(impl) == "pallas" and \
            ln_linear_supported(x, proj_kernel(to_qkv)):
        # fused pre-attention LayerNorm + QKV projection (one x read);
        # int8-quantized params route through the W8A8 kernel inside
        qkv = ln_linear(x, norm, to_qkv)
    else:
        if norm is not None:
            x = layer_norm(norm, x)
        qkv = linear(dequantize_int8(to_qkv, x.dtype) if quantized
                     else to_qkv, x)             # (B, N, 3*inner)

    kv_g = None
    if garment_feat is not None:
        # garment tokens only ever contribute K/V — project with the KV
        # columns of the fused weight (their Q projection is never used).
        # For int8 params this GEMM stays bf16 (XLA fuses the dequant into
        # the weight load) — it is not an ln_linear site.
        if quantized:
            wk = (to_qkv["kernel_i8"][:, inner:].astype(jnp.float32)
                  * to_qkv["kernel_scale"][None, inner:]).astype(x.dtype)
        else:
            wk = to_qkv["kernel"][:, inner:]
        kv_g = linear({"kernel": wk}, garment_feat.astype(x.dtype))

    from idmvton_tpu.ops.pallas_attention import (
        flash_attention_gemm, flash_attention_gemm_supported,
    )
    if resolve(impl) == "pallas" and flash_attention_gemm_supported(inner,
                                                                    heads):
        uncond = 0
        if kv_g is not None and garment_uncond_zero:
            assert 2 * garment_feat.shape[0] == b, (garment_feat.shape, b)
            uncond = b // 2
        out = flash_attention_gemm(qkv, kv_g, heads=heads,
                                   uncond_rows=uncond)
        return linear(params["to_out"], out)

    # XLA path (and layouts the kernel doesn't cover)
    q = _split_heads(qkv[..., :inner], heads)
    k = _split_heads(qkv[..., inner:2 * inner], heads)
    v = _split_heads(qkv[..., 2 * inner:], heads)
    if kv_g is not None:
        if garment_uncond_zero:
            kv_g = jnp.concatenate([jnp.zeros_like(kv_g), kv_g], axis=0)
        k_ref = _split_heads(kv_g[..., :inner], heads)
        v_ref = _split_heads(kv_g[..., inner:], heads)
        out = concat_kv_attention(q, k, v, k_ref, v_ref, impl=impl)
    else:
        out = sdpa(q, k, v, impl=impl)
    return linear(params["to_out"], _merge_heads(out))


def cross_attention(params, x, context, *, heads: int,
                    ip_num_tokens: int = 0, ip_scale: float = 1.0,
                    norm: Optional[dict] = None,
                    impl: Optional[str] = None):
    """Cross-attention over text context, with optional decoupled IP branch.

    ``context`` is (B, S_text [+ ip_num_tokens], C). When the params carry
    to_kv_ip, the trailing ip tokens get their own K/V and an independently-
    normalized softmax (IPAttnProcessor2_0 semantics)."""
    from idmvton_tpu.ops.dispatch import resolve
    from idmvton_tpu.ops.pallas_norm import ln_linear, ln_linear_supported
    from idmvton_tpu.ops.pallas_attention import (
        cross_attention_small_kv, cross_attention_small_kv_supported,
    )
    inner = params["to_out"]["kernel"].shape[0]
    use_fused_q = norm is not None and resolve(impl) == "pallas" and \
        ln_linear_supported(x, params["to_q"]["kernel"])
    if resolve(impl) == "pallas" and cross_attention_small_kv_supported(
            inner, heads, context.shape[1]):
        # GEMM-layout small-KV kernel: one pass over Q, both branches fused,
        # no split-heads copies or HBM logits
        if use_fused_q:
            q = ln_linear(x, norm, params["to_q"])
        else:
            q = linear(params["to_q"], layer_norm(norm, x)
                       if norm is not None else x)
        if "to_kv_ip" in params and ip_num_tokens > 0:
            kv_t = linear(params["to_kv"], context[:, :-ip_num_tokens])
            kv_i = linear(params["to_kv_ip"], context[:, -ip_num_tokens:])
            out = cross_attention_small_kv(q, kv_t, kv_i, heads=heads,
                                           ip_scale=ip_scale)
        else:
            out = cross_attention_small_kv(q, linear(params["to_kv"], context),
                                           heads=heads)
        return linear(params["to_out"], out)

    if use_fused_q:
        q = _split_heads(ln_linear(x, norm, params["to_q"]), heads)
    else:
        if norm is not None:
            x = layer_norm(norm, x)
        q = _split_heads(linear(params["to_q"], x), heads)

    def kv(p, ctx):
        h = linear(p, ctx)
        h = h.reshape(ctx.shape[0], ctx.shape[1], 2, heads, -1)
        return h[:, :, 0], h[:, :, 1]

    if "to_kv_ip" in params and ip_num_tokens > 0:
        k, v = kv(params["to_kv"], context[:, :-ip_num_tokens])
        k_ip, v_ip = kv(params["to_kv_ip"], context[:, -ip_num_tokens:])
        out = decoupled_ip_attention(q, k, v, k_ip, v_ip, ip_scale=ip_scale,
                                     impl=impl)
    else:
        k, v = kv(params["to_kv"], context)
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


def feedforward(params, x, *, norm: Optional[dict] = None,
                impl: Optional[str] = None):
    from idmvton_tpu.ops.dispatch import resolve
    from idmvton_tpu.ops.pallas_norm import (
        ln_linear, ln_linear_supported, proj_kernel, dequantize_int8,
    )
    proj_in = params["proj_in"]
    if norm is not None and resolve(impl) == "pallas" and \
            ln_linear_supported(x, proj_kernel(proj_in), geglu=True):
        # fused LN + proj_in + GEGLU: skips the (.., 2*4C) HBM round-trip
        h = ln_linear(x, norm, proj_in, geglu=True)
        return linear(params["proj_out"], h)
    if norm is not None:
        x = layer_norm(norm, x)
    if "kernel_i8" in proj_in:
        proj_in = dequantize_int8(proj_in, x.dtype)
    h = linear(proj_in, x)
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
                      garment_uncond_zero: bool = False,
                      ip_num_tokens: int = 0, ip_scale: float = 1.0,
                      impl: Optional[str] = None
                      ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Returns (hidden_states, emitted_garment_feature_or_None)."""
    emitted = None
    if garment_mode == "emit":
        # GarmentNet captures the post-norm1, pre-attention hidden states
        # (reference: src/attentionhacked_garmnet.py:321-322) — the LN output
        # must materialize here, so the LN+GEMM fusion doesn't apply; the
        # standalone fused-LN kernel still beats XLA's convert+reduce.
        from idmvton_tpu.ops.dispatch import resolve
        from idmvton_tpu.ops.pallas_norm import (fused_layer_norm,
                                                 supports_fused_ln)
        if resolve(impl) == "pallas" and supports_fused_ln(x):
            h = fused_layer_norm(x, params["norm1"]["scale"],
                                 params["norm1"]["bias"])
        else:
            h = layer_norm(params["norm1"], x)
        emitted = h
        x = x + self_attention(params["attn1"], h, heads=heads, impl=impl)
    else:
        x = x + self_attention(
            params["attn1"], x, heads=heads, norm=params["norm1"],
            garment_feat=garment_feat if garment_mode == "consume" else None,
            garment_uncond_zero=garment_uncond_zero,
            impl=impl)
    x = x + cross_attention(params["attn2"], x, context, heads=heads,
                            norm=params["norm2"],
                            ip_num_tokens=ip_num_tokens, ip_scale=ip_scale,
                            impl=impl)
    x = x + feedforward(params["ff"], x, norm=params["norm3"], impl=impl)
    return x, emitted
