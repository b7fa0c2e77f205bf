"""Minimal faithful `diffusers` stand-in so the reference's hacked attention
files execute verbatim as test oracles.

`diffusers` is not installed (and not installable) in this environment, but
/root/reference/src/attentionhacked_{tryon,garmnet}.py and
/root/reference/ip_adapter/attention_processor.py only need ~10 symbols from
it. This module registers faithful minimal implementations under the
`diffusers.*` names in sys.modules so those reference files can be imported
file-direct and RUN — making the garment-concat self-attention
(src/attentionhacked_tryon.py:334-348), the pre-attention feature capture
(src/attentionhacked_garmnet.py:321-322) and the decoupled IP cross-attention
(ip_adapter/attention_processor.py:1907-2010) executable oracles.

Faithful pieces (these ARE executed by the oracle paths, re-derived from the
documented diffusers==0.25 semantics the reference pins):
- ``Attention`` + default ``AttnProcessor2_0`` (SDPA, scale=dim_head**-0.5)
- ``GEGLU`` / ``GELU`` / ``ApproximateGELU``
- ``LoRACompatibleLinear`` (plain Linear whose forward takes an inert
  ``scale`` arg when no lora_layer is attached — the only mode used here)

Inert stubs (instantiated never / only on config branches the reference
models don't take: norm_type="layer_norm", positional_embeddings=None):
AdaLayerNorm / AdaLayerNormZero / AdaLayerNormContinuous / RMSNorm,
SinusoidalPositionalEmbedding, LoRALinearLayer / LoRAConv2dLayer,
Transformer2DModel.
"""

from __future__ import annotations

import importlib.machinery
import math
import sys
import types

import torch
import torch.nn.functional as F
from torch import nn


class LoRACompatibleLinear(nn.Linear):
    """nn.Linear that tolerates the trailing lora ``scale`` argument.

    diffusers' LoRACompatibleLinear with lora_layer=None (the only state the
    reference reaches with fresh modules) is exactly F.linear; the scale is
    inert."""

    def forward(self, hidden_states, scale: float = 1.0):  # noqa: ARG002
        return F.linear(hidden_states, self.weight, self.bias)


class GEGLU(nn.Module):
    """value * gelu(gate) with a fused (dim_in -> 2*dim_out) projection."""

    def __init__(self, dim_in: int, dim_out: int, bias: bool = True):
        super().__init__()
        self.proj = LoRACompatibleLinear(dim_in, dim_out * 2, bias=bias)

    def forward(self, hidden_states, scale: float = 1.0):
        hidden_states = self.proj(hidden_states, scale)
        hidden_states, gate = hidden_states.chunk(2, dim=-1)
        return hidden_states * F.gelu(gate)


class GELU(nn.Module):
    def __init__(self, dim_in: int, dim_out: int, approximate: str = "none",
                 bias: bool = True):
        super().__init__()
        self.proj = LoRACompatibleLinear(dim_in, dim_out, bias=bias)
        self.approximate = approximate

    def forward(self, hidden_states, scale: float = 1.0):
        return F.gelu(self.proj(hidden_states, scale),
                      approximate=self.approximate)


class ApproximateGELU(nn.Module):
    def __init__(self, dim_in: int, dim_out: int, bias: bool = True):
        super().__init__()
        self.proj = LoRACompatibleLinear(dim_in, dim_out, bias=bias)

    def forward(self, hidden_states, scale: float = 1.0):
        x = self.proj(hidden_states, scale)
        return x * torch.sigmoid(1.702 * x)


class AttnProcessor2_0:
    """Default SDPA attention processor (diffusers 2.0 path)."""

    def __call__(self, attn, hidden_states, encoder_hidden_states=None,
                 attention_mask=None, temb=None, scale: float = 1.0):
        residual = hidden_states
        if attn.spatial_norm is not None:
            hidden_states = attn.spatial_norm(hidden_states, temb)

        input_ndim = hidden_states.ndim
        if input_ndim == 4:
            batch_size, channel, height, width = hidden_states.shape
            hidden_states = hidden_states.view(
                batch_size, channel, height * width).transpose(1, 2)

        batch_size, sequence_length, _ = (
            hidden_states.shape if encoder_hidden_states is None
            else encoder_hidden_states.shape)
        if attention_mask is not None:
            attention_mask = attn.prepare_attention_mask(
                attention_mask, sequence_length, batch_size)
            attention_mask = attention_mask.view(
                batch_size, attn.heads, -1, attention_mask.shape[-1])

        if attn.group_norm is not None:
            hidden_states = attn.group_norm(
                hidden_states.transpose(1, 2)).transpose(1, 2)

        query = attn.to_q(hidden_states)
        if encoder_hidden_states is None:
            encoder_hidden_states = hidden_states
        elif attn.norm_cross:
            encoder_hidden_states = attn.norm_encoder_hidden_states(
                encoder_hidden_states)
        key = attn.to_k(encoder_hidden_states)
        value = attn.to_v(encoder_hidden_states)

        inner_dim = key.shape[-1]
        head_dim = inner_dim // attn.heads
        query = query.view(batch_size, -1, attn.heads, head_dim).transpose(1, 2)
        key = key.view(batch_size, -1, attn.heads, head_dim).transpose(1, 2)
        value = value.view(batch_size, -1, attn.heads, head_dim).transpose(1, 2)

        hidden_states = F.scaled_dot_product_attention(
            query, key, value, attn_mask=attention_mask, dropout_p=0.0,
            is_causal=False)
        hidden_states = hidden_states.transpose(1, 2).reshape(
            batch_size, -1, attn.heads * head_dim)
        hidden_states = hidden_states.to(query.dtype)

        hidden_states = attn.to_out[0](hidden_states)
        hidden_states = attn.to_out[1](hidden_states)

        if input_ndim == 4:
            hidden_states = hidden_states.transpose(-1, -2).reshape(
                batch_size, channel, height, width)
        if attn.residual_connection:
            hidden_states = hidden_states + residual
        return hidden_states / attn.rescale_output_factor


class Attention(nn.Module):
    """Minimal faithful diffusers Attention: the attribute surface used by the
    reference BasicTransformerBlock (default SDPA processor) and
    IPAttnProcessor2_0 (to_q/to_k/to_v/to_out, heads, spatial_norm,
    group_norm, norm_cross, residual_connection, rescale_output_factor)."""

    def __init__(self, query_dim: int, cross_attention_dim=None, heads: int = 8,
                 dim_head: int = 64, dropout: float = 0.0, bias: bool = False,
                 upcast_attention: bool = False, upcast_softmax: bool = False,
                 out_bias: bool = True, scale_qk: bool = True,
                 rescale_output_factor: float = 1.0,
                 residual_connection: bool = False, eps: float = 1e-5,
                 processor=None, **unused):
        super().__init__()
        self.inner_dim = dim_head * heads
        self.query_dim = query_dim
        self.cross_attention_dim = (cross_attention_dim
                                    if cross_attention_dim is not None
                                    else query_dim)
        self.heads = heads
        self.upcast_attention = upcast_attention
        self.upcast_softmax = upcast_softmax
        self.rescale_output_factor = rescale_output_factor
        self.residual_connection = residual_connection
        self.scale_qk = scale_qk
        self.scale = dim_head ** -0.5 if scale_qk else 1.0
        self.eps = eps
        self.spatial_norm = None
        self.group_norm = None
        self.norm_cross = False
        self.to_q = LoRACompatibleLinear(query_dim, self.inner_dim, bias=bias)
        self.to_k = LoRACompatibleLinear(self.cross_attention_dim,
                                         self.inner_dim, bias=bias)
        self.to_v = LoRACompatibleLinear(self.cross_attention_dim,
                                         self.inner_dim, bias=bias)
        self.to_out = nn.ModuleList([
            LoRACompatibleLinear(self.inner_dim, query_dim, bias=out_bias),
            nn.Dropout(dropout),
        ])
        self.processor = processor if processor is not None else AttnProcessor2_0()

    def set_processor(self, processor):
        self.processor = processor

    def prepare_attention_mask(self, attention_mask, target_length,
                               batch_size, out_dim: int = 3):
        head_size = self.heads
        if attention_mask is None:
            return attention_mask
        current_length = attention_mask.shape[-1]
        if current_length != target_length:
            attention_mask = F.pad(attention_mask,
                                   (0, target_length - current_length),
                                   value=0.0)
        if out_dim == 3 and attention_mask.shape[0] < batch_size * head_size:
            attention_mask = attention_mask.repeat_interleave(head_size, dim=0)
        return attention_mask

    def norm_encoder_hidden_states(self, encoder_hidden_states):
        raise NotImplementedError("norm_cross is never enabled here")

    def forward(self, hidden_states, encoder_hidden_states=None,
                attention_mask=None, **cross_attention_kwargs):
        return self.processor(self, hidden_states,
                              encoder_hidden_states=encoder_hidden_states,
                              attention_mask=attention_mask,
                              **cross_attention_kwargs)


class _NeverInstantiated(nn.Module):
    """Config branches the reference models don't take."""

    def __init__(self, *a, **k):
        super().__init__()
        raise NotImplementedError(
            f"{type(self).__name__} is outside the oracle's config space")


class AdaLayerNorm(_NeverInstantiated):
    pass


class AdaLayerNormZero(_NeverInstantiated):
    pass


class AdaLayerNormContinuous(_NeverInstantiated):
    pass


class RMSNorm(_NeverInstantiated):
    pass


class SinusoidalPositionalEmbedding(_NeverInstantiated):
    pass


class LoRALinearLayer(_NeverInstantiated):
    pass


class LoRAConv2dLayer(_NeverInstantiated):
    pass


class Transformer2DModel(_NeverInstantiated):
    pass


def maybe_allow_in_graph(cls):
    return cls


def _module(name, **attrs):
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def install():
    """Register the diffusers shim modules in sys.modules (idempotent).

    No-op if a real `diffusers` is importable (then the oracle runs against
    the real thing)."""
    if "diffusers" in sys.modules and \
            getattr(sys.modules["diffusers"], "__file__", None):
        return  # real diffusers present
    models = _module("diffusers.models")
    mods = {
        "diffusers": _module("diffusers"),
        "diffusers.utils": _module("diffusers.utils", USE_PEFT_BACKEND=False),
        "diffusers.utils.torch_utils": _module(
            "diffusers.utils.torch_utils",
            maybe_allow_in_graph=maybe_allow_in_graph),
        "diffusers.models": models,
        "diffusers.models.activations": _module(
            "diffusers.models.activations", GEGLU=GEGLU, GELU=GELU,
            ApproximateGELU=ApproximateGELU),
        "diffusers.models.attention_processor": _module(
            "diffusers.models.attention_processor", Attention=Attention,
            AttnProcessor2_0=AttnProcessor2_0),
        "diffusers.models.embeddings": _module(
            "diffusers.models.embeddings",
            SinusoidalPositionalEmbedding=SinusoidalPositionalEmbedding),
        "diffusers.models.lora": _module(
            "diffusers.models.lora",
            LoRACompatibleLinear=LoRACompatibleLinear,
            LoRALinearLayer=LoRALinearLayer, LoRAConv2dLayer=LoRAConv2dLayer),
        "diffusers.models.normalization": _module(
            "diffusers.models.normalization", AdaLayerNorm=AdaLayerNorm,
            AdaLayerNormZero=AdaLayerNormZero,
            AdaLayerNormContinuous=AdaLayerNormContinuous, RMSNorm=RMSNorm),
        "diffusers.models.transformer_2d": _module(
            "diffusers.models.transformer_2d",
            Transformer2DModel=Transformer2DModel),
    }
    for name, mod in mods.items():
        sys.modules.setdefault(name, mod)
    # attribute-style access (diffusers.models.lora etc.)
    mods["diffusers"].utils = mods["diffusers.utils"]
    mods["diffusers"].models = models
    models.activations = mods["diffusers.models.activations"]
    models.attention_processor = mods["diffusers.models.attention_processor"]
    models.embeddings = mods["diffusers.models.embeddings"]
    models.lora = mods["diffusers.models.lora"]
    models.normalization = mods["diffusers.models.normalization"]
    models.transformer_2d = mods["diffusers.models.transformer_2d"]
