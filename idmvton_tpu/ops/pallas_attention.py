"""Pallas TPU flash attention for the IDM-VTON hot path.

Shapes on the 768x1024 operating point (reference: SURVEY.md §5):
- garment-concat self-attn: Q 3072 x KV 6144 @ 10 heads x 64 (640-ch level)
  and Q 768 x KV 1536 @ 20 heads x 64 (1280-ch level), batch 2B for CFG.
- The reference materializes the concatenated sequence and runs torch SDPA
  over 2N queries, discarding half the output (src/attentionhacked_tryon.py:
  334-348). Here only the N real queries are computed (flash over concat KV),
  halving the query-side FLOPs.

Blockwise online-softmax kernel:
- grid (B, H, num_q_blocks, num_kv_blocks), kv innermost (sequential on TPU),
- fp32 logits/softmax state in VMEM scratch, bf16 PV matmul on the MXU,
- KV-tail masking via broadcasted_iota against the true kv length,
- head_dim padded to the 128-lane width (zero pads are free on the MXU's
  128-wide contraction; they only cost KV bandwidth).

The backward pass recomputes attention with the XLA reference implementation
(inference never differentiates; the trainer combines this kernel's forward
with remat).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# defaults tuned in-graph on v5e (scripts/ab_step.py): large blocks win —
# grid-step overhead dominates below ~1024x2048 tiles
DEFAULT_BLOCK_Q = int(os.environ.get("IDMVTON_FLASH_BLOCK_Q", "1024"))
DEFAULT_BLOCK_KV = int(os.environ.get("IDMVTON_FLASH_BLOCK_KV", "2048"))
# below this KV length, XLA's materialized attention beats the blockwise
# kernel's grid overhead (tuned in-graph on v5e)
XLA_KV_CUTOFF = int(os.environ.get("IDMVTON_FLASH_XLA_CUTOFF", "0"))
_NEG_INF = -1e30
_LANE = 128


def _cdiv(a, b):
    return -(-a // b)


def _round_up(a, b):
    return _cdiv(a, b) * b


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                  scale: float, kv_len: int, block_kv: int):
    kvb = pl.program_id(3)
    num_kvb = pl.num_programs(3)

    @pl.when(kvb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]                      # (BQ, D)
    k = k_ref[0, 0]                      # (BKV, D)
    v = v_ref[0, 0]                      # (BKV, D)

    # precision pinned to DEFAULT: a global jax_default_matmul_precision of
    # fp32 would otherwise request an unsupported bf16xbf16->fp32(fp32-pass)
    # MXU mode inside Mosaic
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT) * scale   # (BQ, BKV) fp32

    # mask the padded KV tail
    col = kvb * block_kv + jax.lax.broadcasted_iota(
        jnp.int32, logits.shape, dimension=1)
    logits = jnp.where(col < kv_len, logits, _NEG_INF)

    m_prev = m_ref[:, 0][:, None]                       # (BQ, 1)
    m_cur = jnp.max(logits, axis=-1, keepdims=True)     # (BQ, 1)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(logits - m_new)                         # (BQ, BKV) fp32
    alpha = jnp.exp(m_prev - m_new)                     # (BQ, 1)

    l_ref[:] = alpha * l_ref[:] + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)            # (BQ, D)
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(kvb == num_kvb - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, 0][:, None], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / l).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention_core(q, k, v, scale, block_q, block_kv):
    """q (B,H,Sq,D), k/v (B,H,Skv,D) -> (B,H,Sq,D). Pads Sq/Skv/D internally."""
    b, h, sq, d = q.shape
    skv = k.shape[2]
    sq_p = _round_up(sq, block_q)
    skv_p = _round_up(skv, block_kv)
    d_p = _round_up(d, _LANE)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, d_p - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - skv), (0, d_p - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - skv), (0, d_p - d)))

    grid = (b, h, sq_p // block_q, skv_p // block_kv)
    kernel = functools.partial(_flash_kernel, scale=scale, kv_len=skv,
                               block_kv=block_kv)
    nbytes = jnp.dtype(q.dtype).itemsize
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d_p),
                         lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_kv, d_p),
                         lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_kv, d_p),
                         lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d_p),
                               lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, d_p), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANE), jnp.float32),   # m (lane-broadcast)
            pltpu.VMEM((block_q, _LANE), jnp.float32),   # l
            pltpu.VMEM((block_q, d_p), jnp.float32),     # acc
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_p * skv_p * d_p,
            bytes_accessed=(qp.size + kp.size + vp.size
                            + b * h * sq_p * d_p) * nbytes,
            transcendentals=b * h * sq_p * skv_p,
        ),
        interpret=(jax.default_backend() != "tpu"),
    )(qp, kp, vp)
    return out[:, :, :sq, :d]


def _xla_ref_bhsd(q, k, v, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _flash_fwd(q, k, v, scale, block_q, block_kv):
    out = _flash_attention_core(q, k, v, scale, block_q, block_kv)
    return out, (q, k, v)


def _flash_bwd(scale, block_q, block_kv, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_ref_bhsd(q_, k_, v_, scale),
                     q, k, v)
    return vjp(g)


_flash_attention_core.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, *, scale: Optional[float] = None,
                    block_q: Optional[int] = None,
                    block_kv: Optional[int] = None):
    """q: (B, Sq, H, D); k/v: (B, Skv, H, D) -> (B, Sq, H, D)."""
    block_q = block_q or DEFAULT_BLOCK_Q
    block_kv = block_kv or DEFAULT_BLOCK_KV
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    if k.shape[1] <= XLA_KV_CUTOFF:
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v,
                         preferred_element_type=jnp.float32)
        return out.astype(q.dtype)
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    block_q = min(block_q, _round_up(qt.shape[2], 128))
    block_kv = min(block_kv, _round_up(kt.shape[2], 128))
    out = _flash_attention_core(qt, kt, vt, float(scale), block_q, block_kv)
    return jnp.swapaxes(out, 1, 2)


def flash_attention_concat_kv(q, k, v, k_ref, v_ref, *,
                              scale: Optional[float] = None,
                              block_q: Optional[int] = None,
                              block_kv: Optional[int] = None):
    """Garment-concat attention: q against [own KV | reference KV].

    The concat is a cheap HBM copy relative to the O(N*2N) attention compute;
    the flash kernel then streams the combined KV without the reference's
    doubled query sequence.
    """
    kk = jnp.concatenate([k, k_ref], axis=1)
    vv = jnp.concatenate([v, v_ref], axis=1)
    return flash_attention(q, kk, vv, scale=scale, block_q=block_q,
                           block_kv=block_kv)


def _flash_kernel_fused(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                        scale: float, kv_len: int, block_kv: int):
    """Same online-softmax body, 5-D refs (the three inputs alias one fused
    qkv buffer at leading index 0/1/2)."""
    kvb = pl.program_id(3)
    num_kvb = pl.num_programs(3)

    @pl.when(kvb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0, 0]
    k = k_ref[0, 0, 0]
    v = v_ref[0, 0, 0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT) * scale
    col = kvb * block_kv + jax.lax.broadcasted_iota(
        jnp.int32, logits.shape, dimension=1)
    logits = jnp.where(col < kv_len, logits, _NEG_INF)
    m_prev = m_ref[:, 0][:, None]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
    p = jnp.exp(logits - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:] = alpha * l_ref[:] + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(kvb == num_kvb - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, 0][:, None], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / l).astype(o_ref.dtype)


def flash_attention_fused_qkv(qkv, s_own: int, *,
                              scale: Optional[float] = None,
                              block_q: Optional[int] = None,
                              block_kv: Optional[int] = None):
    """Attention directly on a fused-QKV GEMM output.

    qkv: (B, St, 3, H, D) — reshaped projection output over the
    [own | garment] concatenated sequence (St tokens). Queries are the first
    ``s_own`` tokens; keys/values span all St tokens. One transpose feeds the
    kernel (replacing the slice+concat+per-tensor-transpose+pad chain, a
    measured ~60 ms/UNet-forward of copy/pad/slice ops).

    Returns (B, s_own, H, D).
    """
    b, st, three, h, d = qkv.shape
    assert three == 3
    scale = scale if scale is not None else d ** -0.5
    block_q = min(block_q or DEFAULT_BLOCK_Q, _round_up(s_own, 128))
    block_kv = min(block_kv or DEFAULT_BLOCK_KV, _round_up(st, 128))
    d_p = _round_up(d, _LANE)

    t = jnp.transpose(qkv, (2, 0, 3, 1, 4))        # (3, B, H, St, D)
    sq_p = _round_up(s_own, block_q)
    skv_p = _round_up(st, block_kv)
    pad_s = max(sq_p, skv_p) - st   # skv_p >= st, so pad_s >= 0
    t = jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, pad_s), (0, d_p - d)))

    grid = (b, h, sq_p // block_q, skv_p // block_kv)
    kernel = functools.partial(_flash_kernel_fused, scale=float(scale),
                               kv_len=st, block_kv=block_kv)
    spec = lambda which: pl.BlockSpec(
        (1, 1, 1, block_q if which == 0 else block_kv, d_p),
        functools.partial(
            lambda which, bi, hi, qi, ki: (
                which, bi, hi, qi if which == 0 else ki, 0), which))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec(0), spec(1), spec(2)],
        out_specs=pl.BlockSpec((1, 1, block_q, d_p),
                               lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, d_p), qkv.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, d_p), jnp.float32),
        ],
        interpret=(jax.default_backend() != "tpu"),
    )(t, t, t)
    return jnp.transpose(out[:, :, :s_own, :d], (0, 2, 1, 3))
