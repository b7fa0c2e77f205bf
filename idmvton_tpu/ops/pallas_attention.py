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
import threading
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
# below this KV length, XLA's fused attention beats the blockwise kernel:
# the GarmentNet's 77-token cross-attention ran at 13.5% MFU through the
# kernel (5.9 ms/fwd + split-heads copies) vs ~2.5 ms on the XLA path.
# (The round-1 note "XLA slower below 2048 KV" applied to the SELF-attention
# sequence lengths, which never dip below 768 — those still take the kernel.)
XLA_KV_CUTOFF = int(os.environ.get("IDMVTON_FLASH_XLA_CUTOFF", "256"))
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


# ---------------------------------------------------------------------------
# GEMM-layout flash attention (round 2): consumes the fused-QKV projection
# output (B, N, 3*H*D) DIRECTLY — no transpose, no d-padding copy — and
# writes merged-head (B, N, H*D) output that to_out consumes as-is.
#
# Each 128-lane column block holds 128/D heads (D=64 -> head pairs); garment
# KV streams from a SECOND GEMM buffer (B_cond rows), and the CFG uncond
# half's all-zero garment KV (reference zeros-concat,
# src/tryon_pipeline.py:1787) is folded in ANALYTICALLY: zero logits
# contribute exactly sink_count*exp(-m) to the softmax denominator and
# nothing to the numerator, so the kernel initializes (m=0, l=M) for uncond
# rows and never reads or computes the zero half — exact math, ~1/4 of the
# attention work and the garment-KV GEMM waste removed.
# ---------------------------------------------------------------------------


def _exp_bf16() -> bool:
    # softmax exp on packed bf16 (A/B knob; measured neutral on v5e)
    return os.environ.get("IDMVTON_FLASH_EXP_BF16", "0") == "1"


# Fixed-shift clamp. exp(60) ~= 1.14e26; even 1e6 clamped KV entries sum to
# ~1.1e32 << fp32 max 3.4e38, so the l accumulator can NEVER overflow to inf
# (at 80 it could: exp(80)*9e3 > fp32 max, silently zeroing the row after the
# 1/l finalize — advisor r2 finding). Softmax weights stay EXACT for all
# logits <= 60 — double the empirical [-30, 30] bound of converged SDXL
# checkpoints. A checkpoint with logits > 60 only loses the *relative*
# ordering among >60 entries (each gets weight exp(60)/l); validate new
# checkpoints with fixed_shift_max_error() below.
_FIXED_SHIFT_CLAMP = 60.0


def _mxu_lsum() -> bool:
    # MXU softmax denominator (fixed-shift path only, d < 128): see the
    # kernel comment. IDMVTON_FLASH_MXU_LSUM=1 enables it. Default OFF: the
    # r3 on-device A/B never completed (relay compile-helper failures), so
    # the default stays on the r2-MEASURED configuration (VPU row-sum,
    # 0.2605 img/s) rather than an unmeasured variant.
    return os.environ.get("IDMVTON_FLASH_MXU_LSUM", "0") == "1"


# Set by calibrate_fixed_shift() when a checkpoint's live logits exceed the
# clamp: forces the exact online-max softmax for the rest of the process.
_FIXED_SHIFT_FORCED_OFF = False

# Serializes the calibrate A/B (it mutates os.environ + the force-off flag
# non-atomically — advisor r4) and counts flash dispatches so a calibration
# that runs AFTER serving programs were already traced can warn (those
# programs captured _fixed_shift() at trace time and are not retrofitted).
_CALIBRATE_LOCK = threading.Lock()
_FLASH_GEMM_CALLS = 0


def _fixed_shift() -> bool:
    # Fixed-shift softmax (DEFAULT): skip the online running-max and compute
    # p = exp(min(logits, clamp)) directly. EXACT by softmax shift-invariance
    # for all logits <= _FIXED_SHIFT_CLAMP (see its comment for the overflow
    # analysis). The CFG zero-garment sink stays exact (exp(0) = 1 per
    # token). Removes the max-reduce/subtract/alpha VPU work per logit:
    # measured 40.5 -> 33.2 ms attention per tryon fwd.
    # Set IDMVTON_FLASH_FIXED_SHIFT=0 for the classical online-max softmax.
    if _FIXED_SHIFT_FORCED_OFF:
        return False
    return os.environ.get("IDMVTON_FLASH_FIXED_SHIFT", "1") == "1"


def calibrate_fixed_shift(qkv, kv_ref=None, *, tol: float = 5e-3,
                          **kw) -> dict:
    """Load-time guard for new/finetuned checkpoints: A/B the fixed-shift
    softmax against the exact online-max softmax on ONE batch of REAL
    projected activations. If the max |difference| exceeds `tol` (logits
    above _FIXED_SHIFT_CLAMP equalize silently — converged SDXL sits in
    [-30, 30] but a hot finetune might not), force the online-max path for
    the rest of the process and report it. Returns
    {"max_error", "fixed_shift"}. Call once per checkpoint bring-up with the
    to_qkv output of the hottest attention site; kwargs forward to
    flash_attention_gemm (heads=... required).

    MUST run BEFORE the first pipeline/serving program is jitted for the
    checkpoint: _fixed_shift() is read at trace time, so programs compiled
    earlier keep whichever path was active when they were traced — flipping
    the flag afterward does not retrofit cached executables (a calibration
    that runs after prior flash dispatches logs a warning). A clean
    calibration (err <= tol) RESETS a previous force-off, so switching back
    to a well-behaved checkpoint restores the fast path. Thread-safe: the
    A/B's env/flag mutation is serialized by a module lock."""
    global _FIXED_SHIFT_FORCED_OFF
    import logging
    log = logging.getLogger(__name__)
    with _CALIBRATE_LOCK:
        if _FLASH_GEMM_CALLS > 0:
            log.warning(
                "calibrate_fixed_shift called after %d flash-attention "
                "dispatches: programs already traced keep the softmax path "
                "that was active at trace time — calibrate at checkpoint "
                "bring-up, before the first jit", _FLASH_GEMM_CALLS)
        err = _fixed_shift_max_error_locked(qkv, kv_ref, **kw)
        if err > tol:
            _FIXED_SHIFT_FORCED_OFF = True
            log.warning(
                "fixed-shift softmax miscalibrated for this checkpoint "
                "(max_error %.3g > tol %.3g): falling back to online-max "
                "softmax process-wide", err, tol)
        else:
            _FIXED_SHIFT_FORCED_OFF = False
        return {"max_error": err, "fixed_shift": not _FIXED_SHIFT_FORCED_OFF}


def fixed_shift_max_error(qkv, kv_ref=None, **kw):
    """A/B the fixed-shift softmax against the online-max softmax on REAL
    activations; returns the max |difference|. Run this once when bringing up
    a new/finetuned checkpoint (converged SDXL logits sit in [-30, 30]; a
    checkpoint whose logits exceed _FIXED_SHIFT_CLAMP would silently degrade
    under fixed-shift). Kwargs are forwarded to flash_attention_gemm."""
    with _CALIBRATE_LOCK:
        return _fixed_shift_max_error_locked(qkv, kv_ref, **kw)


def _fixed_shift_max_error_locked(qkv, kv_ref=None, **kw):
    import numpy as np
    global _FIXED_SHIFT_FORCED_OFF, _FLASH_GEMM_CALLS
    old = os.environ.get("IDMVTON_FLASH_FIXED_SHIFT")
    old_forced = _FIXED_SHIFT_FORCED_OFF
    old_calls = _FLASH_GEMM_CALLS  # the A/B's own throwaway dispatches
    try:                           # must not count as serving traces
        _FIXED_SHIFT_FORCED_OFF = False  # the A/B must exercise both paths
        os.environ["IDMVTON_FLASH_FIXED_SHIFT"] = "1"
        a = flash_attention_gemm(qkv, kv_ref, **kw)
        os.environ["IDMVTON_FLASH_FIXED_SHIFT"] = "0"
        b = flash_attention_gemm(qkv, kv_ref, **kw)
    finally:
        _FIXED_SHIFT_FORCED_OFF = old_forced
        _FLASH_GEMM_CALLS = old_calls
        if old is None:
            os.environ.pop("IDMVTON_FLASH_FIXED_SHIFT", None)
        else:
            os.environ["IDMVTON_FLASH_FIXED_SHIFT"] = old
    return float(np.max(np.abs(np.asarray(a, np.float32)
                               - np.asarray(b, np.float32))))


def _flash_kernel_gemm(q_ref, ko_ref, vo_ref, *rest, scale: float,
                       hpb: int, d: int, n_own: int, m_garm: int,
                       block_kv: int, own_steps: int, n_kv: int,
                       uncond_rows: int, sink_tokens: int, has_garm: bool,
                       prescale_q: bool, fixed_shift: bool, mxu_lsum: bool):
    if has_garm:
        kg_ref, vg_ref, o_ref = rest[:3]
        scratch = rest[3:]
    else:
        o_ref = rest[0]
        scratch = rest[1:]
    bi = pl.program_id(0)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        # analytic zero-KV sink: M zero logits = a pre-reduced block with
        # max 0 and mass M (uncond CFG rows), plus any static sink_tokens
        sink = jnp.float32(sink_tokens)
        if has_garm and uncond_rows > 0:
            sink = sink + jnp.where(bi < uncond_rows,
                                    jnp.float32(m_garm), jnp.float32(0.0))
        m0 = jnp.where(sink > 0, 0.0, _NEG_INF)
        for h in range(hpb):
            m_ref, l_ref, acc_ref = scratch[3 * h:3 * h + 3]
            m_ref[:] = jnp.zeros_like(m_ref) + m0
            l_ref[:] = jnp.zeros_like(l_ref) + sink
            acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                                   # (BQ, 128) = hpb heads
    if prescale_q:
        # power-of-two scale: exact in bf16, saves one VPU op per LOGIT
        # (BQxBKV) by spending one per q element (BQx128)
        q = q * jnp.asarray(scale, q.dtype)

    def process(k, v, base, limit, masked):
        # masked=False is the interior-block fast path: no tail iota/compare/
        # select VPU work per logit (the softmax is VPU-bound, not MXU-bound)
        if masked:
            # zero V's out-of-bounds tail rows: the unpadded edge block holds
            # garbage there, and garbage * (p == 0) is NaN in the PV matmul
            row_ok = (base + jax.lax.broadcasted_iota(
                jnp.int32, (k.shape[0], 1), 0)) < limit
            v = jnp.where(row_ok, v, 0)
        for h in range(hpb):
            m_ref, l_ref, acc_ref = scratch[3 * h:3 * h + 3]
            qh = q[:, h * d:(h + 1) * d]
            kh = k[:, h * d:(h + 1) * d]
            vh = v[:, h * d:(h + 1) * d]
            logits = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            if not prescale_q:
                logits = logits * scale
            if masked:
                col = base + jax.lax.broadcasted_iota(jnp.int32,
                                                      logits.shape, 1)
                logits = jnp.where(col < limit, logits, _NEG_INF)
            if fixed_shift:
                # clamp at _FIXED_SHIFT_CLAMP: weights exact below it, and the
                # l accumulator cannot overflow fp32 at any KV length (see the
                # constant's comment) — never NaN/inf
                p = jnp.exp(jnp.minimum(logits, _FIXED_SHIFT_CLAMP))
                pb = p.astype(v.dtype)
                if mxu_lsum:
                    # softmax denominator on the MXU: a ones column appended
                    # to V makes the PV matmul emit [acc | sum(p)] in one
                    # pass (same single 128-lane output tile at d<=127),
                    # replacing the BQxBKV VPU row-reduction with a BKVx1
                    # concat. Masked tail columns have p == 0 exactly, so
                    # the unmasked ones column contributes nothing there.
                    # The denominator becomes an fp32 accumulation of bf16
                    # terms (~2^-9 relative) — below the bf16 output
                    # rounding, same argument as the exp_bf16 knob.
                    vh_ext = jnp.concatenate(
                        [vh, jnp.ones((vh.shape[0], 1), vh.dtype)], axis=1)
                    pv = jax.lax.dot_general(
                        pb, vh_ext, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)  # (BQ, d+1)
                    acc_ref[:] = acc_ref[:] + pv[:, :d]
                    l_ref[:] = l_ref[:] + pv[:, d:d + 1]
                    continue
                l_ref[:] = l_ref[:] + jnp.sum(p, axis=-1, keepdims=True)
                pv = jax.lax.dot_general(
                    pb, vh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
                acc_ref[:] = acc_ref[:] + pv
                continue
            m_prev = m_ref[:, 0][:, None]
            m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1,
                                                keepdims=True))
            if _exp_bf16():
                # exp on bf16 vectors (2 lanes/op). The numerator is cast to
                # bf16 for the MXU PV matmul EITHER WAY, so this only touches
                # the softmax denominator: fp32-accumulated sum of bf16 terms
                # (~2^-9 relative) instead of fp32 terms — well under the
                # output's own bf16 rounding.
                p = jnp.exp((logits - m_new).astype(jnp.bfloat16))
                l_add = jnp.sum(p, axis=-1, keepdims=True,
                                dtype=jnp.float32)
            else:
                p = jnp.exp(logits - m_new)
                l_add = jnp.sum(p, axis=-1, keepdims=True)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[:] = alpha * l_ref[:] + l_add
            m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
            pv = jax.lax.dot_general(
                p.astype(v.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            acc_ref[:] = acc_ref[:] * alpha + pv

    own_edge = n_own % block_kv != 0 or own_steps * block_kv > n_own
    if not own_edge:
        @pl.when(ki < own_steps)
        def _own():
            process(ko_ref[0], vo_ref[0], ki * block_kv, n_own, masked=False)
    else:
        @pl.when(ki < own_steps - 1)
        def _own_full():
            process(ko_ref[0], vo_ref[0], ki * block_kv, n_own, masked=False)

        @pl.when(ki == own_steps - 1)
        def _own_edge():
            process(ko_ref[0], vo_ref[0], ki * block_kv, n_own, masked=True)

    if has_garm:
        is_garm = ki >= own_steps
        cond = jnp.logical_and(is_garm, bi >= uncond_rows) \
            if uncond_rows > 0 else is_garm
        garm_edge = m_garm % block_kv != 0

        if not garm_edge:
            @pl.when(cond)
            def _garm():
                process(kg_ref[0], vg_ref[0], (ki - own_steps) * block_kv,
                        m_garm, masked=False)
        else:
            @pl.when(jnp.logical_and(cond, ki < n_kv - 1))
            def _garm_full():
                process(kg_ref[0], vg_ref[0], (ki - own_steps) * block_kv,
                        m_garm, masked=False)

            @pl.when(jnp.logical_and(cond, ki == n_kv - 1))
            def _garm_edge():
                process(kg_ref[0], vg_ref[0], (ki - own_steps) * block_kv,
                        m_garm, masked=True)

    @pl.when(ki == n_kv - 1)
    def _finalize():
        outs = []
        for h in range(hpb):
            m_ref, l_ref, acc_ref = scratch[3 * h:3 * h + 3]
            l = jnp.maximum(l_ref[:, 0][:, None], 1e-30)
            outs.append(acc_ref[:] / l)
        o_ref[0] = (outs[0] if hpb == 1
                    else jnp.concatenate(outs, axis=1)).astype(o_ref.dtype)


def _gemm_ref_xla(qkv, kv_ref, heads: int, scale: float, sink_tokens: int,
                  uncond_rows: int):
    """XLA oracle for the GEMM-layout attention (used for the backward pass
    and as the test reference): materializes the zero sink explicitly."""
    b, n, three_hd = qkv.shape
    hd = three_hd // 3
    d = hd // heads
    q = qkv[..., :hd].reshape(b, n, heads, d)
    k = qkv[..., hd:2 * hd].reshape(b, n, heads, d)
    v = qkv[..., 2 * hd:].reshape(b, n, heads, d)
    if kv_ref is not None:
        m = kv_ref.shape[1]
        kg = kv_ref[..., :hd].reshape(-1, m, heads, d)
        vg = kv_ref[..., hd:].reshape(-1, m, heads, d)
        if uncond_rows > 0:
            pad = jnp.zeros((uncond_rows, m, heads, d), kg.dtype)
            kg = jnp.concatenate([pad, kg], axis=0)
            vg = jnp.concatenate([pad, vg], axis=0)
        k = jnp.concatenate([k, kg], axis=1)
        v = jnp.concatenate([v, vg], axis=1)
    if sink_tokens > 0:
        z = jnp.zeros((b, sink_tokens, heads, d), k.dtype)
        k = jnp.concatenate([k, z], axis=1)
        v = jnp.concatenate([v, z], axis=1)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), v,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.reshape(b, n, hd)


def _pick_block_c(hd: int, d: int) -> int:
    # 256 (2 column blocks/step at d=64) measured best on v5e: 227.2 ms full
    # tryon fwd vs 229.3 at 128 and 246.6 at 640 (10 unrolled heads starve
    # the software pipeline and blow VMEM with fp32 logit tiles)
    for bc in (256, 128):
        if hd % bc == 0 and bc % d == 0:
            return bc
    return _LANE


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def _flash_gemm_core(qkv, kv_ref, heads, scale, sink_tokens, uncond_rows,
                     block_q, block_kv, block_c, fixed_shift):
    b, n, three_hd = qkv.shape
    hd = three_hd // 3
    d = hd // heads
    bc = block_c or _pick_block_c(hd, d)
    hpb = bc // d                        # heads per column block
    cb = hd // bc                        # column blocks per section
    has_garm = kv_ref is not None
    m_garm = kv_ref.shape[1] if has_garm else 0

    if bc > _LANE:
        # wide column blocks unroll hpb heads of fp32 logit tiles in VMEM:
        # cap the q/kv blocks so hpb * block_q * block_kv * 4B fits
        block_q = min(block_q, 1024)
        block_kv = min(block_kv, 1024)
    block_q = min(block_q, _round_up(n, 128))
    block_kv = min(block_kv, _round_up(max(n, m_garm), 128))
    own_steps = _cdiv(n, block_kv)
    garm_steps = _cdiv(m_garm, block_kv) if has_garm else 0
    n_kv = own_steps + garm_steps
    nq = _cdiv(n, block_q)
    grid = (b, cb, nq, n_kv)

    def qkv_spec(which):
        # which: 0=q, 1=k_own, 2=v_own (column-block offset which*cb).
        # k/v stay STATIONARY during garment steps (clamped index => the
        # pipeline skips the re-fetch).
        def imap(bi, ci, qi, ki, _which=which):
            if _which == 0:
                return (bi, qi, ci)
            row = jnp.minimum(ki, own_steps - 1)
            return (bi, row, _which * cb + ci)
        blk = block_q if which == 0 else block_kv
        return pl.BlockSpec((1, blk, bc), imap)

    def garm_spec(which):
        # which: 0=k_g, 1=v_g. kv_ref has (b - uncond_rows) rows; uncond
        # rows clamp to row 0 and stay stationary (never computed).
        def imap(bi, ci, qi, ki, _which=which):
            row = jnp.clip(ki - own_steps, 0, max(garm_steps - 1, 0))
            if uncond_rows > 0:
                bg = jnp.maximum(bi - uncond_rows, 0)
                row = jnp.where(bi < uncond_rows, 0, row)
            else:
                bg = bi
            return (bg, row, _which * cb + ci)
        return pl.BlockSpec((1, block_kv, bc), imap)

    import math
    # pre-scaling Q is exact only for power-of-two scales (bf16 mantissa)
    prescale_q = math.frexp(scale)[0] == 0.5
    kernel = functools.partial(
        _flash_kernel_gemm, scale=float(scale), hpb=hpb, d=d, n_own=n,
        m_garm=m_garm, block_kv=block_kv, own_steps=own_steps, n_kv=n_kv,
        uncond_rows=uncond_rows, sink_tokens=sink_tokens, has_garm=has_garm,
        prescale_q=prescale_q, fixed_shift=fixed_shift,
        mxu_lsum=fixed_shift and d < _LANE and _mxu_lsum())

    in_specs = [qkv_spec(0), qkv_spec(1), qkv_spec(2)]
    inputs = [qkv, qkv, qkv]
    if has_garm:
        in_specs += [garm_spec(0), garm_spec(1)]
        inputs += [kv_ref, kv_ref]

    scratch = []
    for _ in range(hpb):
        scratch += [pltpu.VMEM((block_q, _LANE), jnp.float32),   # m
                    pltpu.VMEM((block_q, _LANE), jnp.float32),   # l
                    pltpu.VMEM((block_q, d), jnp.float32)]       # acc

    nbytes = jnp.dtype(qkv.dtype).itemsize
    kv_bytes = (qkv.size + (kv_ref.size if has_garm else 0)) * nbytes
    # the uncond CFG rows never compute or fetch their (all-zero) garment
    # half — count only the LIVE work so MFU reporting and Mosaic's
    # scheduling hints reflect reality
    live_rows = b - uncond_rows
    live_logits = b * n * n + live_rows * n * m_garm
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, bc),
                               lambda bi, ci, qi, ki: (bi, qi, ci)),
        out_shape=jax.ShapeDtypeStruct((b, n, hd), qkv.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # fp32 logits tiles for 2 heads/step exceed the default 16MB
            # scoped-vmem budget at 1024x1536 blocks; v5e has headroom
            vmem_limit_bytes=GEMM_VMEM_LIMIT_MB * 1024 * 1024,
        ) if jax.default_backend() == "tpu" else None,
        cost_estimate=pl.CostEstimate(
            flops=4 * heads * live_logits * d,
            bytes_accessed=kv_bytes + b * n * hd * nbytes,
            transcendentals=heads * live_logits,
        ),
        interpret=(jax.default_backend() != "tpu"),
    )(*inputs)
    return out


def _flash_gemm_fwd(qkv, kv_ref, heads, scale, sink_tokens, uncond_rows,
                    block_q, block_kv, block_c, fixed_shift):
    # DIFFERENTIATED path: force the exact online-max softmax regardless of
    # the fixed-shift default — the backward oracle (_gemm_ref_xla) computes
    # the unclamped softmax, and training logits are not bounded the way
    # converged inference logits are.
    out = _flash_gemm_core(qkv, kv_ref, heads, scale, sink_tokens,
                           uncond_rows, block_q, block_kv, block_c, False)
    return out, (qkv, kv_ref)


def _flash_gemm_bwd(heads, scale, sink_tokens, uncond_rows, block_q,
                    block_kv, block_c, fixed_shift, residuals, g):
    qkv, kv_ref = residuals
    if kv_ref is None:
        _, vjp = jax.vjp(
            lambda q_: _gemm_ref_xla(q_, None, heads, scale, sink_tokens,
                                     uncond_rows), qkv)
        return vjp(g) + (None,)
    _, vjp = jax.vjp(
        lambda q_, r_: _gemm_ref_xla(q_, r_, heads, scale, sink_tokens,
                                     uncond_rows), qkv, kv_ref)
    return vjp(g)


_flash_gemm_core.defvjp(_flash_gemm_fwd, _flash_gemm_bwd)

# tuned on v5e (scripts/ab_step.py): 1536x1536 235.7ms vs 1024x1536 238.9,
# 2048x1024 242.3, 1024x1024 246.6, 512x3072 243.5 (full tryon fwd, b4)
DEFAULT_GEMM_BLOCK_KV = int(os.environ.get("IDMVTON_FLASH_GEMM_BLOCK_KV",
                                           "1536"))
DEFAULT_GEMM_BLOCK_Q = int(os.environ.get("IDMVTON_FLASH_GEMM_BLOCK_Q",
                                          "1536"))
GEMM_VMEM_LIMIT_MB = int(os.environ.get("IDMVTON_FLASH_GEMM_VMEM_MB", "100"))
# 0 = auto (_pick_block_c: widest divisor of H*D, most heads per grid step)
DEFAULT_GEMM_BLOCK_C = int(os.environ.get("IDMVTON_FLASH_GEMM_BLOCK_C",
                                          "0")) or None


def flash_attention_gemm(qkv, kv_ref=None, *, heads: int,
                         scale: Optional[float] = None,
                         sink_tokens: int = 0, uncond_rows: int = 0,
                         block_q: Optional[int] = None,
                         block_kv: Optional[int] = None,
                         block_c: Optional[int] = None):
    """Flash attention directly over fused-QKV GEMM output.

    qkv:    (B, N, 3*H*D) — the to_qkv projection of the OWN tokens only.
    kv_ref: (B - uncond_rows, M, 2*H*D) — optional garment-token K|V
            projection (to_qkv's KV columns applied to the garment feature).
    uncond_rows: leading batch rows (CFG uncond half) whose garment KV is
            identically zero — handled analytically (softmax sink of M zero
            logits), no compute or DMA spent on them.
    sink_tokens: extra all-zero KV tokens for EVERY row (generality/tests).

    Returns (B, N, H*D) merged-head output. Requires H*D % 128 == 0 and
    D in {8,16,32,64,128} dividing 128 (SDXL: D=64 -> head-pair blocks).
    """
    global _FLASH_GEMM_CALLS
    _FLASH_GEMM_CALLS += 1
    b, n, three_hd = qkv.shape
    hd = three_hd // 3
    d = hd // heads
    if kv_ref is not None and uncond_rows > 0:
        assert kv_ref.shape[0] == b - uncond_rows, (kv_ref.shape, b,
                                                    uncond_rows)
    scale = scale if scale is not None else d ** -0.5
    return _flash_gemm_core(qkv, kv_ref, heads, float(scale),
                            int(sink_tokens), int(uncond_rows),
                            block_q or DEFAULT_GEMM_BLOCK_Q,
                            block_kv or DEFAULT_GEMM_BLOCK_KV,
                            block_c if block_c is not None
                            else DEFAULT_GEMM_BLOCK_C, _fixed_shift())


def flash_attention_gemm_supported(inner: int, heads: int) -> bool:
    d = inner // heads
    return inner % _LANE == 0 and d <= _LANE and _LANE % d == 0


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


# ---------------------------------------------------------------------------
# Small-KV cross-attention (text 77 tokens + optional 16 IP tokens).
#
# The XLA path materializes (B, H, N, S) fp32 logits in HBM twice (text and
# IP branches, ~5.6 ms/tryon-fwd at 768x1024). KV fits VMEM whole, so this
# kernel makes ONE pass over the Q GEMM output (B, N, H*D) — no split-heads
# copy — computing both branches per tile and summing
# (IPAttnProcessor2_0 semantics: independent softmaxes,
# ip_adapter/attention_processor.py:1970-1995).
# ---------------------------------------------------------------------------


def _cross_small_kernel(q_ref, k_ref, v_ref, *rest, scale: float, hpb: int,
                        d: int, s_text: int, s_ip: int, ip_scale: float):
    has_ip = s_ip > 0
    if has_ip:
        ki_ref, vi_ref, o_ref = rest[:3]
    else:
        o_ref = rest[0]

    q = q_ref[0]                                     # (BQ, bc)
    outs = []
    for h in range(hpb):
        qh = q[:, h * d:(h + 1) * d]

        def branch(kf, vf, s_real, sc):
            k = kf[0][:, h * d:(h + 1) * d]          # (S_pad, D)
            v = vf[0][:, h * d:(h + 1) * d]
            logits = jax.lax.dot_general(
                qh, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT) * scale  # (BQ, S_pad)
            if s_real != k.shape[0]:
                col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
                logits = jnp.where(col < s_real, logits, _NEG_INF)
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)  # (BQ, D) fp32
            return o * sc

        o = branch(k_ref, v_ref, s_text, 1.0)
        if has_ip:
            o = o + branch(ki_ref, vi_ref, s_ip, ip_scale)
        outs.append(o)
    o_ref[0] = (outs[0] if hpb == 1
                else jnp.concatenate(outs, axis=1)).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _cross_small_core(q, kv, kv_ip, heads, scale, ip_scale, block_q):
    b, n, hd = q.shape
    d = hd // heads
    bc = _LANE                                     # one head pair at d=64
    hpb = bc // d
    cb = hd // bc
    s_text = kv.shape[1]
    s_ip = kv_ip.shape[1] if kv_ip is not None else 0
    st_p = _round_up(s_text, 8)
    si_p = _round_up(max(s_ip, 1), 8)

    block_q = min(block_q, _round_up(n, 128))
    n_p = _round_up(n, block_q)
    qp = jnp.pad(q, ((0, 0), (0, n_p - n), (0, 0))) if n_p != n else q
    kvp = jnp.pad(kv, ((0, 0), (0, st_p - s_text), (0, 0))) \
        if st_p != s_text else kv

    grid = (b, cb, n_p // block_q)
    in_specs = [
        pl.BlockSpec((1, block_q, bc), lambda bi, ci, qi: (bi, qi, ci)),
        pl.BlockSpec((1, st_p, bc), lambda bi, ci, qi: (bi, 0, ci)),
        pl.BlockSpec((1, st_p, bc), lambda bi, ci, qi: (bi, 0, cb + ci)),
    ]
    inputs = [qp, kvp, kvp]
    if s_ip > 0:
        kvip = jnp.pad(kv_ip, ((0, 0), (0, si_p - s_ip), (0, 0))) \
            if si_p != s_ip else kv_ip
        in_specs += [
            pl.BlockSpec((1, si_p, bc), lambda bi, ci, qi: (bi, 0, ci)),
            pl.BlockSpec((1, si_p, bc), lambda bi, ci, qi: (bi, 0, cb + ci)),
        ]
        inputs += [kvip, kvip]

    kernel = functools.partial(
        _cross_small_kernel, scale=float(scale), hpb=hpb, d=d,
        s_text=s_text, s_ip=s_ip, ip_scale=float(ip_scale))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, bc),
                               lambda bi, ci, qi: (bi, qi, ci)),
        out_shape=jax.ShapeDtypeStruct((b, n_p, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_p * (st_p + si_p) * hd,
            bytes_accessed=(qp.size + 2 * kvp.size + b * n_p * hd) * 2,
            transcendentals=b * heads * n_p * (st_p + si_p),
        ),
        interpret=(jax.default_backend() != "tpu"),
    )(*inputs)
    return out[:, :n] if n_p != n else out


def _cross_small_xla(q, kv, kv_ip, heads, scale, ip_scale):
    b, n, hd = q.shape
    d = hd // heads
    qh = q.reshape(b, n, heads, d)

    def branch(kvx):
        s = kvx.shape[1]
        k = kvx[..., :hd].reshape(b, s, heads, d)
        v = kvx[..., hd:].reshape(b, s, heads, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, k,
                            preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), v,
                          preferred_element_type=jnp.float32)

    out = branch(kv)
    if kv_ip is not None:
        out = out + ip_scale * branch(kv_ip)
    return out.astype(q.dtype).reshape(b, n, hd)


def _cross_small_fwd(q, kv, kv_ip, heads, scale, ip_scale, block_q):
    return (_cross_small_core(q, kv, kv_ip, heads, scale, ip_scale, block_q),
            (q, kv, kv_ip))


def _cross_small_bwd(heads, scale, ip_scale, block_q, res, g):
    q, kv, kv_ip = res
    if kv_ip is None:
        _, vjp = jax.vjp(
            lambda q_, kv_: _cross_small_xla(q_, kv_, None, heads, scale,
                                             ip_scale), q, kv)
        return vjp(g) + (None,)
    _, vjp = jax.vjp(
        lambda q_, kv_, ki_: _cross_small_xla(q_, kv_, ki_, heads, scale,
                                              ip_scale), q, kv, kv_ip)
    return vjp(g)


_cross_small_core.defvjp(_cross_small_fwd, _cross_small_bwd)

CROSS_SMALL_BLOCK_Q = int(os.environ.get("IDMVTON_CROSS_BLOCK_Q", "2048"))


def cross_attention_small_kv(q, kv, kv_ip=None, *, heads: int,
                             scale: Optional[float] = None,
                             ip_scale: float = 1.0,
                             block_q: Optional[int] = None):
    """Cross-attention over a VMEM-resident context, GEMM layouts end to end.

    q: (B, N, H*D) — the to_q projection output (merged heads).
    kv: (B, S_text, 2*H*D) — fused to_kv projection of the text context.
    kv_ip: optional (B, S_ip, 2*H*D) — to_kv_ip projection of the IP tokens;
    branches use INDEPENDENT softmaxes summed with ip_scale
    (IPAttnProcessor2_0). Returns (B, N, H*D).
    """
    hd = q.shape[-1]
    d = hd // heads
    scale = scale if scale is not None else d ** -0.5
    return _cross_small_core(q, kv, kv_ip, heads, float(scale),
                             float(ip_scale),
                             block_q or CROSS_SMALL_BLOCK_Q)


def cross_attention_small_kv_supported(inner: int, heads: int,
                                       s_kv: int) -> bool:
    # MEASURED REJECTION (v5e trace, scripts/analyze_trace.py): this kernel
    # runs 9.4 ms/tryon-fwd vs 5.6 ms for the XLA einsum chain it replaces —
    # at 77/16-token KV the per-head GEMMs (K=64, N<=80) are DMA/overhead
    # bound and XLA's fusions win. Kept (with tests) for potential longer-KV
    # use; opt in with IDMVTON_CROSS_KERNEL=1.
    if os.environ.get("IDMVTON_CROSS_KERNEL", "0") != "1":
        return False
    d = inner // heads
    return (inner % _LANE == 0 and d <= _LANE and _LANE % d == 0
            and s_kv <= 1024)
