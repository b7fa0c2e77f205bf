"""Attention ops.

Three entry points, each with an XLA reference and (hot ones) a Pallas kernel:

- ``sdpa``                  — standard scaled dot-product attention.
- ``concat_kv_attention``   — the IDM-VTON garment-conditioning attention.
  The reference concatenates garment tokens onto the *sequence* and slices the
  first half of the output: ``attn1(cat([x, g], dim=1))[:, :N]``
  (reference: src/attentionhacked_tryon.py:334-348). Queries beyond N are
  discarded, so this is mathematically identical to cross-attention of x's
  queries against the concatenated KV — which halves query-side work and
  avoids materializing the concat when fused in Pallas.
- ``decoupled_ip_attention``— IP-Adapter decoupled cross-attention:
  softmax(Q K_text)V_text + scale * softmax(Q K_ip)V_ip
  (reference: ip_adapter/attention_processor.py:1907-2010 IPAttnProcessor2_0).

Shapes: q (B, Sq, H, D); k/v (B, Skv, H, D). Softmax in fp32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from idmvton_tpu.ops.dispatch import resolve


def _sdpa_xla(q, k, v, scale):
    dtype = q.dtype
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(dtype)


def sdpa(q, k, v, *, scale: Optional[float] = None, impl: Optional[str] = None):
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    if resolve(impl) == "pallas":
        from idmvton_tpu.ops.pallas_attention import flash_attention
        return flash_attention(q, k, v, scale=scale)
    return _sdpa_xla(q, k, v, scale)


def concat_kv_attention(q, k, v, k_ref, v_ref, *, scale: Optional[float] = None,
                        impl: Optional[str] = None):
    """Attention of q against concat([own KV, garment KV], seq axis).

    q: (B, N, H, D); k/v: (B, N, H, D) own tokens; k_ref/v_ref: (B, M, H, D)
    garment reference tokens (M == N in IDM-VTON). Equivalent to the
    reference's ``attn(cat([x, g]))[:, :N]``.
    """
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    if resolve(impl) == "pallas":
        from idmvton_tpu.ops.pallas_attention import flash_attention_concat_kv
        return flash_attention_concat_kv(q, k, v, k_ref, v_ref, scale=scale)
    kk = jnp.concatenate([k, k_ref], axis=1)
    vv = jnp.concatenate([v, v_ref], axis=1)
    return _sdpa_xla(q, kk, vv, scale)


def decoupled_ip_attention(q, k_text, v_text, k_ip, v_ip, *, ip_scale: float = 1.0,
                           scale: Optional[float] = None,
                           impl: Optional[str] = None):
    """IP-Adapter decoupled cross-attention: two softmaxes, summed outputs.

    NOTE: this is NOT one softmax over the concatenated context — text and
    image branches are normalized independently and summed
    (reference: ip_adapter/attention_processor.py:1970-1995).
    """
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    # Context is short (77 text + 16 IP tokens); a single fused XLA graph is
    # already bandwidth-optimal here, so both impls share this path.
    out_text = _sdpa_xla(q, k_text, v_text, scale)
    out_ip = _sdpa_xla(q, k_ip, v_ip, scale)
    return out_text + jnp.asarray(ip_scale, out_text.dtype) * out_ip
