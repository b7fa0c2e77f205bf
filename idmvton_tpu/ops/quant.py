"""Weight quantization for int8 serving (r4 verdict #3).

Targets the ln_linear sites (self-attention to_qkv, GEGLU ff.proj_in) —
the largest near-peak GEMM bucket of the denoise step — replacing their
bf16 kernels with symmetric per-output-channel int8 + fp32 scales. The
fused LN+GEMM kernel (ops/pallas_norm.py::_ln_mm_kernel_i8) then runs the
projection on the MXU's 2x-rate s8 path with dynamic per-row activation
quantization.

Default OFF: enable with IDMVTON_GEMM_INT8=1 (bench.py) or by calling
quantize_unet_linears_int8 on a UNet param tree before jitting. Reference
GEMM sites: src/attentionhacked_tryon.py:336-412 (the reference serves them
in fp16; int8 is TPU-native headroom, shipped with a measured busy-ms delta
and a tiny-model SSIM bound in PARITY.md).
"""

from __future__ import annotations

import jax.numpy as jnp


def quantize_linear_int8(proj_params: dict) -> dict:
    """{'kernel': (C, N) float} -> {'kernel_i8': int8, 'kernel_scale':
    (N,) fp32} with symmetric per-output-channel scales (absmax/127).
    bias (if any) is kept fp."""
    w = proj_params["kernel"].astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8) / 127.0
    w_i8 = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    out = {k: v for k, v in proj_params.items() if k != "kernel"}
    out["kernel_i8"] = w_i8
    out["kernel_scale"] = scale
    return out


def quantize_unet_linears_int8(unet_params: dict, *,
                               attn_qkv: bool = True) -> dict:
    """Quantize every transformer block's attn1.to_qkv and ff.proj_in in a
    UNet param tree (the ln_linear sites). Returns a new tree; all other
    leaves are shared, not copied.

    attn_qkv=False skips the attn1.to_qkv sites — pass it for the
    GarmentNet (emit) tower: its blocks must materialize the post-norm1
    hidden states (the emitted garment feature, attentionhacked_garmnet.py
    :321-322), so self_attention runs with norm=None and a quantized to_qkv
    would never reach the W8A8 LN+GEMM kernel — it would only add weight
    rounding error (plus a per-step dequant) for zero speedup. The emit
    tower's measured int8 gain comes from its ff.proj_in sites."""

    def walk(node):
        if isinstance(node, dict):
            if "attn1" in node and "ff" in node:
                out = dict(node)
                if attn_qkv:
                    out["attn1"] = dict(node["attn1"])
                    out["attn1"]["to_qkv"] = quantize_linear_int8(
                        node["attn1"]["to_qkv"])
                out["ff"] = dict(node["ff"])
                out["ff"]["proj_in"] = quantize_linear_int8(
                    node["ff"]["proj_in"])
                return out
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(unet_params)
