"""Fused LayerNorm Pallas kernel.

XLA lowers the UNet's per-token LayerNorms to convert+reduce fusions that run
~30x off bandwidth on v5e (measured 0.6 ms for a (4, 3072, 640) LN that
moves ~16 MB). This kernel does one VMEM pass per token block: fp32 stats in
registers, affine, cast — bandwidth-bound.

Backward recomputes via the XLA reference (training wraps blocks in remat
anyway); inference never differentiates.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_TOKENS = 256


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    # lane-parallel stats (128-lane group accumulators + ONE 128-wide
    # cross-lane reduce per row) — a naive jnp.mean(axis=-1) is a cross-lane
    # op per element, the very pathology this kernel exists to fix
    bm, c = x_ref.shape
    lane = 128
    if c % lane == 0 and c > lane:
        acc1 = jnp.zeros((bm, lane), jnp.float32)
        acc2 = jnp.zeros((bm, lane), jnp.float32)
        for gi in range(c // lane):
            xg = x_ref[:, gi * lane:(gi + 1) * lane].astype(jnp.float32)
            acc1 = acc1 + xg
            acc2 = acc2 + xg * xg
        mean = jnp.sum(acc1, axis=-1, keepdims=True) / c
        mean2 = jnp.sum(acc2, axis=-1, keepdims=True) / c
        inv = jax.lax.rsqrt(jnp.maximum(mean2 - mean * mean, 0.0) + eps)
        for gi in range(c // lane):
            sl = slice(gi * lane, (gi + 1) * lane)
            xg = x_ref[:, sl].astype(jnp.float32)
            o_ref[:, sl] = ((xg - mean) * inv * scale_ref[0, sl]
                            + bias_ref[0, sl]).astype(o_ref.dtype)
        return
    xf = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean)
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    y = (xf - mean) * inv * scale_ref[0] + bias_ref[0]
    o_ref[:] = y.astype(o_ref.dtype)


def _ln_forward(x, scale, bias, eps, block_tokens):
    orig_shape = x.shape
    c = x.shape[-1]
    flat = x.reshape(-1, c)
    t = flat.shape[0]
    t_pad = -(-t // block_tokens) * block_tokens
    if t_pad != t:
        flat = jnp.pad(flat, ((0, t_pad - t), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(t_pad // block_tokens,),
        in_specs=[
            pl.BlockSpec((block_tokens, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_tokens, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((t_pad, c), x.dtype),
        interpret=(jax.default_backend() != "tpu"),
    )(flat, scale.reshape(1, c).astype(jnp.float32),
      bias.reshape(1, c).astype(jnp.float32))
    return out[:t].reshape(orig_shape)


def _xla_ln(x, scale, bias, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
    mean2 = jnp.mean(jnp.square(x), axis=-1, keepdims=True, dtype=jnp.float32)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    xf = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps)
    return (xf * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_layer_norm(x, scale, bias, eps: float = 1e-5,
                     block_tokens: int = DEFAULT_BLOCK_TOKENS):
    """x: (..., C) with C a multiple of 128; scale/bias: (C,)."""
    return _ln_forward(x, scale, bias, eps, block_tokens)


def _ln_fwd(x, scale, bias, eps, block_tokens):
    return _ln_forward(x, scale, bias, eps, block_tokens), (x, scale, bias)


def _ln_bwd(eps, block_tokens, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda x_, s_, b_: _xla_ln(x_, s_, b_, eps),
                     x, scale, bias)
    return vjp(g)


fused_layer_norm.defvjp(_ln_fwd, _ln_bwd)


def supports_fused_ln(x) -> bool:
    return x.shape[-1] % 128 == 0


# ---------------------------------------------------------------------------
# Fused LayerNorm + matmul (+ optional GEGLU epilogue)
#
# Round-2 kernel. XLA lowers the transformer's pre-projection LayerNorms to
# convert+reduce fusions that run ~17x off bandwidth on v5e (measured 31 ms /
# tryon fwd across the 180 L2 sites alone: the last-axis reduce is a cross-
# lane operation per element). Every LN in the block feeds a GEMM (to_qkv,
# to_q, ff.proj_in), so the fusion reads x ONCE, computes stats lane-parallel
# (128-lane group accumulators, one 128-wide cross-lane reduce per row),
# normalizes into VMEM scratch, and runs the projection straight off it.
# The GEGLU variant also folds gelu(gate)*value, eliminating the (.., 2*4C)
# intermediate round-trip to HBM (63 MB/site at the 1280-ch level).
# ---------------------------------------------------------------------------

_LANE = 128


def _ln_mm_kernel(x_ref, g_ref, b_ref, *rest, eps: float, c: int,
                  geglu: bool, gelu_tanh: bool):
    if geglu:
        wa_ref, wb_ref, ba_ref, bb_ref, o_ref = rest[:5]
        xn_ref = rest[5]
    else:
        wa_ref, ba_ref, o_ref = rest[:3]
        xn_ref = rest[3]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _stats():
        bm = x_ref.shape[0]
        acc1 = jnp.zeros((bm, _LANE), jnp.float32)
        acc2 = jnp.zeros((bm, _LANE), jnp.float32)
        for gi in range(c // _LANE):
            xg = x_ref[:, gi * _LANE:(gi + 1) * _LANE].astype(jnp.float32)
            acc1 = acc1 + xg
            acc2 = acc2 + xg * xg
        s1 = jnp.sum(acc1, axis=-1, keepdims=True)        # (bm, 1)
        s2 = jnp.sum(acc2, axis=-1, keepdims=True)
        mean = s1 / c
        var = jnp.maximum(s2 / c - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + eps)
        for gi in range(c // _LANE):
            sl = slice(gi * _LANE, (gi + 1) * _LANE)
            xg = x_ref[:, sl].astype(jnp.float32)
            xn_ref[:, sl] = ((xg - mean) * inv * g_ref[0, sl]
                             + b_ref[0, sl]).astype(xn_ref.dtype)

    xn = xn_ref[:]
    val = jax.lax.dot_general(
        xn, wa_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT) + ba_ref[0][None, :]
    if geglu:
        gate = jax.lax.dot_general(
            xn, wb_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT) + bb_ref[0][None, :]
        if gelu_tanh:
            gact = jax.nn.gelu(gate, approximate=True)
        else:
            gact = _gelu_erf(gate)
        val = val * gact
    o_ref[:] = val.astype(o_ref.dtype)


def _gelu_erf(x):
    """Exact-semantics gelu: Mosaic has no erf/erfc primitive, so erf uses
    the Abramowitz-Stegun 7.1.26 rational approximation (1.5e-7 max abs
    error — below bf16 output resolution)."""
    z = x * jnp.float32(0.7071067811865476)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf_abs = 1.0 - poly * jnp.exp(-az * az)
    erf = jnp.where(z < 0, -erf_abs, erf_abs)
    return 0.5 * x * (1.0 + erf)


def _pick_block_n(n_out: int, cap: int = 640) -> int:
    best = 0
    for mult in range(1, cap // _LANE + 1):
        bn = mult * _LANE
        if n_out % bn == 0:
            best = bn
    return best


def _pick_block_m(m: int, block_m: int) -> int:
    """Largest row block <= block_m; prefers one that DIVIDES m exactly.
    The r5 step trace showed the garment tower's 1280-ch sites (m=1536)
    padding to 2*1024 under the flat 1024 default — +33% wasted MXU work
    plus a pad+unpad copy chain (~4 ms/step total); bm=768 there is
    measured near-optimal (ab_step: 1024 -> 229.3 ms, 768 -> 230.1 at the
    divisible sites) and removes the waste entirely."""
    bm = min(block_m, -(-m // 8) * 8)
    if m % bm == 0:
        return bm
    for cand in range(bm - 8, 255, -8):
        if m % cand == 0:
            return cand
    return bm


def _ln_mm_forward(x, gamma, beta, w, b, eps, geglu, gelu_tanh, block_m):
    orig = x.shape
    c = x.shape[-1]
    xf = x.reshape(-1, c)
    m = xf.shape[0]
    two = 2 if geglu else 1
    n_out = w.shape[1] // two
    bn = _pick_block_n(n_out)
    bm = _pick_block_m(m, block_m)
    m_pad = -(-m // bm) * bm
    if m_pad != m:
        xf = jnp.pad(xf, ((0, m_pad - m), (0, 0)))

    grid = (m_pad // bm, n_out // bn)
    g2 = gamma.reshape(1, c).astype(jnp.float32)
    b2 = beta.reshape(1, c).astype(jnp.float32)
    bias = (jnp.zeros((w.shape[1],), jnp.float32) if b is None
            else b.astype(jnp.float32)).reshape(1, -1)

    in_specs = [
        pl.BlockSpec((bm, c), lambda i, j: (i, 0)),
        pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        pl.BlockSpec((c, bn), lambda i, j: (0, j)),
    ]
    inputs = [xf, g2, b2, w]
    steps = n_out // bn
    if geglu:
        in_specs.append(pl.BlockSpec((c, bn),
                                     lambda i, j: (0, j + steps)))
        inputs.append(w)
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j: (0, j)))
        inputs.append(bias)
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j: (0, j + steps)))
        inputs.append(bias)
    else:
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j: (0, j)))
        inputs.append(bias)

    out = pl.pallas_call(
        functools.partial(_ln_mm_kernel, eps=eps, c=c, geglu=geglu,
                          gelu_tanh=gelu_tanh),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_out), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, c), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=LN_MM_VMEM_LIMIT_MB * 1024 * 1024,
        ) if jax.default_backend() == "tpu" else None,
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * c * n_out * two,
            bytes_accessed=(xf.size + w.size * grid[0]) * 2
            + m_pad * n_out * 2,
            transcendentals=m_pad * n_out if geglu else 0,
        ),
        interpret=(jax.default_backend() != "tpu"),
    )(*inputs)
    return out[:m].reshape(*orig[:-1], n_out)


def _ln_mm_xla(x, gamma, beta, w, b, eps, geglu, gelu_tanh):
    h = _xla_ln(x, gamma, beta, eps)
    y = jnp.dot(h, w.astype(h.dtype), preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    if geglu:
        val, gate = jnp.split(y, 2, axis=-1)
        y = val * jax.nn.gelu(gate, approximate=gelu_tanh)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _ln_mm_core(x, gamma, beta, w, b, eps, geglu, gelu_tanh, block_m):
    return _ln_mm_forward(x, gamma, beta, w, b, eps, geglu, gelu_tanh,
                          block_m)


def _ln_mm_fwd(x, gamma, beta, w, b, eps, geglu, gelu_tanh, block_m):
    out = _ln_mm_core(x, gamma, beta, w, b, eps, geglu, gelu_tanh, block_m)
    return out, (x, gamma, beta, w, b)


def _ln_mm_bwd(eps, geglu, gelu_tanh, block_m, res, g):
    x, gamma, beta, w, b = res
    if b is None:
        _, vjp = jax.vjp(lambda x_, g_, bt_, w_: _ln_mm_xla(
            x_, g_, bt_, w_, None, eps, geglu, gelu_tanh), x, gamma, beta, w)
        return vjp(g) + (None,)
    _, vjp = jax.vjp(lambda x_, g_, bt_, w_, b_: _ln_mm_xla(
        x_, g_, bt_, w_, b_, eps, geglu, gelu_tanh), x, gamma, beta, w, b)
    return vjp(g)


_ln_mm_core.defvjp(_ln_mm_fwd, _ln_mm_bwd)

# tuned on v5e (scripts/ab_step.py, full tryon fwd): 1024 229.3ms,
# 768 230.1, 512 234.9, 256 251.4
DEFAULT_LN_MM_BLOCK_M = int(os.environ.get("IDMVTON_LN_MM_BLOCK_M", "1024"))
LN_MM_VMEM_LIMIT_MB = int(os.environ.get("IDMVTON_LN_MM_VMEM_MB", "100"))


def ln_linear(x, norm_params, proj_params, *, eps: float = 1e-5,
              geglu: bool = False, gelu_tanh: bool = False,
              block_m: Optional[int] = None):
    """layer_norm(x) @ kernel (+ bias), optionally with a GEGLU epilogue.

    proj_params["kernel"]: (C, N) — or (C, 2N) for geglu, laid out
    [value | gate] like ff.proj_in (reference GEGLU, attention.py FF).
    A projection quantized by ops.quant.quantize_linear_int8 (kernel_i8 +
    kernel_scale instead of kernel) routes through the W8A8 int8 MXU kernel.
    Falls back to the unfused XLA expression off-TPU-support.
    """
    if "kernel_i8" in proj_params:
        w_i8 = proj_params["kernel_i8"]
        b = proj_params.get("bias")
        if not ln_linear_supported(x, w_i8, geglu=geglu):
            dq = dequantize_int8(proj_params, x.dtype)
            return _ln_mm_xla(x, norm_params["scale"], norm_params["bias"],
                              dq["kernel"], b, eps, geglu, gelu_tanh)
        return _ln_mm_core_i8(x, norm_params["scale"], norm_params["bias"],
                              w_i8, proj_params["kernel_scale"], b,
                              eps, geglu, gelu_tanh,
                              block_m or DEFAULT_LN_MM_BLOCK_M)
    w = proj_params["kernel"]
    b = proj_params.get("bias")
    if not ln_linear_supported(x, w, geglu=geglu):
        return _ln_mm_xla(x, norm_params["scale"], norm_params["bias"],
                          w, b, eps, geglu, gelu_tanh)
    return _ln_mm_core(x, norm_params["scale"], norm_params["bias"], w, b,
                       eps, geglu, gelu_tanh,
                       block_m or DEFAULT_LN_MM_BLOCK_M)


def ln_linear_supported(x, w, *, geglu: bool = False) -> bool:
    c = x.shape[-1]
    two = 2 if geglu else 1
    n_out = w.shape[1] // two
    return (c % _LANE == 0 and n_out % _LANE == 0
            and w.shape[1] == two * n_out
            and _pick_block_n(n_out) > 0)


# ---------------------------------------------------------------------------
# W8A8 int8 LN+GEMM (r4 verdict #3)
#
# v5e's MXU runs s8 x s8 -> s32 at 2x the bf16 rate (394 vs 197 TOP/s), and
# the ln_linear sites are the largest already-near-peak GEMM bucket
# (50.1 + 24.0 ms/step at 85-90% bf16 MFU). Weight-only int8 cannot help
# here — weight bytes are <5% of these GEMMs' time — so this is the full
# W8A8 path: weights pre-quantized per OUTPUT CHANNEL (symmetric, scale =
# absmax/127), activations quantized per ROW (token) dynamically inside the
# kernel right after the LayerNorm (whose output is zero-mean/unit-var —
# the friendliest possible int8 input), int32 accumulate, fp32 dequant
# epilogue (row_scale * col_scale), optional GEGLU epilogue unchanged.
#
# Default OFF (IDMVTON_GEMM_INT8): ship only with the measured busy-ms delta
# AND the tiny-model SSIM bound recorded in PARITY.md (same honesty pattern
# as garment_cache).
# ---------------------------------------------------------------------------


def _ln_mm_kernel_i8(x_ref, g_ref, b_ref, *rest, eps: float, c: int,
                     geglu: bool, gelu_tanh: bool):
    if geglu:
        wa_ref, wb_ref, sa_ref, sb_ref, ba_ref, bb_ref, o_ref = rest[:7]
        xq_ref, rs_ref = rest[7:9]
    else:
        wa_ref, sa_ref, ba_ref, o_ref = rest[:4]
        xq_ref, rs_ref = rest[4:6]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _stats_quant():
        bm = x_ref.shape[0]
        acc1 = jnp.zeros((bm, _LANE), jnp.float32)
        acc2 = jnp.zeros((bm, _LANE), jnp.float32)
        for gi in range(c // _LANE):
            xg = x_ref[:, gi * _LANE:(gi + 1) * _LANE].astype(jnp.float32)
            acc1 = acc1 + xg
            acc2 = acc2 + xg * xg
        mean = jnp.sum(acc1, axis=-1, keepdims=True) / c
        var = jnp.maximum(jnp.sum(acc2, axis=-1, keepdims=True) / c
                          - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + eps)
        # pass 2: row absmax of the NORMALIZED values (lane-group max)
        amax = jnp.zeros((bm, _LANE), jnp.float32)
        for gi in range(c // _LANE):
            sl = slice(gi * _LANE, (gi + 1) * _LANE)
            xg = x_ref[:, sl].astype(jnp.float32)
            xn = (xg - mean) * inv * g_ref[0, sl] + b_ref[0, sl]
            amax = jnp.maximum(amax, jnp.abs(xn))
        row_scale = jnp.maximum(jnp.max(amax, axis=-1, keepdims=True),
                                1e-8) / 127.0
        rs_ref[:] = jnp.broadcast_to(row_scale, rs_ref.shape)
        rcp = 1.0 / row_scale
        # pass 3: recompute + quantize (3 VMEM passes beat a second fp
        # scratch: VMEM bandwidth is not the bottleneck here, the MXU is)
        for gi in range(c // _LANE):
            sl = slice(gi * _LANE, (gi + 1) * _LANE)
            xg = x_ref[:, sl].astype(jnp.float32)
            xn = (xg - mean) * inv * g_ref[0, sl] + b_ref[0, sl]
            q = jnp.clip(jnp.round(xn * rcp), -127.0, 127.0)
            xq_ref[:, sl] = q.astype(jnp.int8)

    xq = xq_ref[:]
    rs = rs_ref[:, 0:1]
    acc = jax.lax.dot_general(
        xq, wa_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    val = (acc.astype(jnp.float32) * rs * sa_ref[0][None, :]
           + ba_ref[0][None, :])
    if geglu:
        acc_g = jax.lax.dot_general(
            xq, wb_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        gate = (acc_g.astype(jnp.float32) * rs * sb_ref[0][None, :]
                + bb_ref[0][None, :])
        if gelu_tanh:
            gact = jax.nn.gelu(gate, approximate=True)
        else:
            gact = _gelu_erf(gate)
        val = val * gact
    o_ref[:] = val.astype(o_ref.dtype)


def _ln_mm_forward_i8(x, gamma, beta, w_i8, w_scale, b, eps, geglu,
                      gelu_tanh, block_m):
    orig = x.shape
    c = x.shape[-1]
    xf = x.reshape(-1, c)
    m = xf.shape[0]
    two = 2 if geglu else 1
    n_out = w_i8.shape[1] // two
    bn = _pick_block_n(n_out)
    bm = _pick_block_m(m, block_m)
    m_pad = -(-m // bm) * bm
    if m_pad != m:
        xf = jnp.pad(xf, ((0, m_pad - m), (0, 0)))

    grid = (m_pad // bm, n_out // bn)
    g2 = gamma.reshape(1, c).astype(jnp.float32)
    b2 = beta.reshape(1, c).astype(jnp.float32)
    scale = w_scale.reshape(1, -1).astype(jnp.float32)
    bias = (jnp.zeros((w_i8.shape[1],), jnp.float32) if b is None
            else b.astype(jnp.float32)).reshape(1, -1)

    in_specs = [
        pl.BlockSpec((bm, c), lambda i, j: (i, 0)),
        pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        pl.BlockSpec((c, bn), lambda i, j: (0, j)),
    ]
    inputs = [xf, g2, b2, w_i8]
    steps = n_out // bn
    if geglu:
        in_specs.append(pl.BlockSpec((c, bn), lambda i, j: (0, j + steps)))
        inputs.append(w_i8)
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j: (0, j)))
        inputs.append(scale)
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j: (0, j + steps)))
        inputs.append(scale)
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j: (0, j)))
        inputs.append(bias)
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j: (0, j + steps)))
        inputs.append(bias)
    else:
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j: (0, j)))
        inputs.append(scale)
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j: (0, j)))
        inputs.append(bias)

    out = pl.pallas_call(
        functools.partial(_ln_mm_kernel_i8, eps=eps, c=c, geglu=geglu,
                          gelu_tanh=gelu_tanh),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_out), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, c), jnp.int8),
                        pltpu.VMEM((bm, _LANE), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=LN_MM_VMEM_LIMIT_MB * 1024 * 1024,
        ) if jax.default_backend() == "tpu" else None,
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * c * n_out * two,
            bytes_accessed=(xf.size * 2 + w_i8.size * grid[0])
            + m_pad * n_out * 2,
            transcendentals=m_pad * n_out if geglu else 0,
        ),
        interpret=(jax.default_backend() != "tpu"),
    )(*inputs)
    return out[:m].reshape(*orig[:-1], n_out)


def dequantize_int8(proj_params, dtype):
    """bf16 view of an int8-quantized projection (fallback paths; XLA fuses
    the convert+scale into the consuming GEMM's weight load)."""
    w = (proj_params["kernel_i8"].astype(jnp.float32)
         * proj_params["kernel_scale"].reshape(1, -1)).astype(dtype)
    out = {"kernel": w}
    if "bias" in proj_params:
        out["bias"] = proj_params["bias"]
    return out


def proj_kernel(proj_params):
    """The (C, N) kernel array of a maybe-quantized projection (for shape
    checks)."""
    return proj_params.get("kernel", proj_params.get("kernel_i8"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _ln_mm_core_i8(x, gamma, beta, w_i8, w_scale, b, eps, geglu, gelu_tanh,
                   block_m):
    return _ln_mm_forward_i8(x, gamma, beta, w_i8, w_scale, b, eps, geglu,
                             gelu_tanh, block_m)


def _ln_mm_i8_fwd(x, gamma, beta, w_i8, w_scale, b, eps, geglu, gelu_tanh,
                  block_m):
    out = _ln_mm_core_i8(x, gamma, beta, w_i8, w_scale, b, eps, geglu,
                         gelu_tanh, block_m)
    return out, (x, gamma, beta, w_i8, w_scale, b)


def _ln_mm_i8_bwd(eps, geglu, gelu_tanh, block_m, res, g):
    # int8 serving is inference-only; the (never-hot) gradient flows through
    # the dequantized fp expression w.r.t. x/gamma/beta, None for the
    # quantized weight leaves
    x, gamma, beta, w_i8, w_scale, b = res
    w = (w_i8.astype(jnp.float32) * w_scale.reshape(1, -1)).astype(x.dtype)
    if b is None:
        _, vjp = jax.vjp(lambda x_, g_, bt_: _ln_mm_xla(
            x_, g_, bt_, w, None, eps, geglu, gelu_tanh), x, gamma, beta)
        return vjp(g) + (None, None, None)
    _, vjp = jax.vjp(lambda x_, g_, bt_, b_: _ln_mm_xla(
        x_, g_, bt_, w, b_, eps, geglu, gelu_tanh), x, gamma, beta, b)
    dx, dg, dbt, db = vjp(g)
    return dx, dg, dbt, None, None, db


_ln_mm_core_i8.defvjp(_ln_mm_i8_fwd, _ln_mm_i8_bwd)


# ---------------------------------------------------------------------------
# GroupNorm spatial statistics
#
# XLA lowers group_norm's per-channel spatial mean/mean-square over
# (B, H, W, C) to *convolutions* at several UNet sites (f32[4,1280]-output
# "convolution" fusions costing 0.8-0.9 ms each, ~50x off bandwidth —
# 17.8 ms/tryon-fwd total). This kernel is the obvious lowering instead:
# channels stay in lanes, spatial rows accumulate with plain vector adds,
# one 8-sublane fold at the end.
# ---------------------------------------------------------------------------


def _gn_stats_kernel(x_ref, s1_ref, s2_ref, acc1, acc2):
    rb = pl.program_id(1)

    @pl.when(rb == 0)
    def _init():
        acc1[:] = jnp.zeros_like(acc1)
        acc2[:] = jnp.zeros_like(acc2)

    xf = x_ref[0].astype(jnp.float32)               # (blockR, C)
    br, c = xf.shape
    x3 = xf.reshape(br // 8, 8, c)
    acc1[:] = acc1[:] + jnp.sum(x3, axis=0)          # (8, C), lane-parallel
    acc2[:] = acc2[:] + jnp.sum(x3 * x3, axis=0)

    @pl.when(rb == pl.num_programs(1) - 1)
    def _fin():
        # (8, C) partials; the trivial 8-row fold happens outside in XLA
        s1_ref[0] = acc1[:]
        s2_ref[0] = acc2[:]


def _gn_stats_forward(x, block_rows):
    b = x.shape[0]
    c = x.shape[-1]
    flat = x.reshape(b, -1, c)
    s = flat.shape[1]
    br = min(block_rows, -(-s // 8) * 8)
    s_pad = -(-s // br) * br
    if s_pad != s:
        flat = jnp.pad(flat, ((0, 0), (0, s_pad - s), (0, 0)))
    s1, s2 = pl.pallas_call(
        _gn_stats_kernel,
        grid=(b, s_pad // br),
        in_specs=[pl.BlockSpec((1, br, c), lambda bi, rb: (bi, rb, 0))],
        out_specs=[pl.BlockSpec((1, 8, c), lambda bi, rb: (bi, 0, 0)),
                   pl.BlockSpec((1, 8, c), lambda bi, rb: (bi, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((b, 8, c), jnp.float32),
                   jax.ShapeDtypeStruct((b, 8, c), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((8, c), jnp.float32),
                        pltpu.VMEM((8, c), jnp.float32)],
        interpret=(jax.default_backend() != "tpu"),
    )(flat)
    return jnp.sum(s1, axis=1), jnp.sum(s2, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def gn_spatial_stats(x, block_rows: int = 512):
    """(B, ..., C) -> (sum, sum_of_squares) per (B, C) over spatial axes,
    fp32 accumulation. Zero-pad-exact (padded rows contribute 0)."""
    return _gn_stats_forward(x, block_rows)


def _gn_stats_fwd(x, block_rows):
    return _gn_stats_forward(x, block_rows), x


def _gn_stats_bwd(block_rows, x, g):
    g1, g2 = g
    shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
    gx = (g1.reshape(shape)
          + 2.0 * x.astype(jnp.float32) * g2.reshape(shape))
    return (gx.astype(x.dtype),)


gn_spatial_stats.defvjp(_gn_stats_fwd, _gn_stats_bwd)


def gn_stats_supported(x) -> bool:
    # any channel count works: the block's last dim equals the full C
    # (Mosaic pads the lane tail internally)
    return x.ndim >= 3 and x.shape[-1] >= 8
