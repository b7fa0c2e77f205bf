"""Pallas TPU 3x3 convolution (stride 1, SAME) as shifted GEMMs.

XLA's space-to-depth conv lowering runs the UNet's resnet 3x3 convs at
~52-66% MFU on v5e (measured: 0.82 ms for a (4,32,24,1280)->1280 conv whose
MXU floor is 0.46 ms). This kernel keeps the whole (per-batch) padded
activation resident in VMEM and accumulates nine (rows, Cin) x (Cin, bn)
dot_generals — one per tap — shifting the input window with cheap in-VMEM
slices instead of data movement. Reference conv sites: the ResnetBlock2D /
Upsample2D convs inside the four vendored UNet block files
(e.g. src/unet_block_hacked_tryon.py ResnetBlock2D.forward).

Backward recomputes via the XLA convolution (training wraps resnet blocks in
remat; inference never differentiates).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
CONV_VMEM_LIMIT_MB = int(os.environ.get("IDMVTON_CONV_VMEM_MB", "100"))
# rows per output block (bh * W); tuned on v5e (scripts/ab_step.py):
# 4096 -> 203.5 ms full tryon fwd vs 203.9 at 1024, 205.7 at 2048
CONV_ROWS_TARGET = int(os.environ.get("IDMVTON_CONV_ROWS", "4096"))


def _conv3_kernel(x_ref, w_ref, b_ref, o_ref, *, bh: int, wdt: int, c: int):
    hi = pl.program_id(1)
    acc = None
    for dy in range(3):
        for dx in range(3):
            xs = x_ref[0, pl.ds(hi * bh + dy, bh), dx:dx + wdt, :]
            xf = xs.reshape(bh * wdt, c)
            tap = (3 * dy + dx) * c
            wk = w_ref[tap:tap + c, :]
            d = jax.lax.dot_general(
                xf, wk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            acc = d if acc is None else acc + d
    acc = acc + b_ref[0][None, :]
    o_ref[0] = acc.reshape(bh, wdt, -1).astype(o_ref.dtype)


def _padacc() -> bool:
    # Padded-output-accumulator tap formulation (default OFF until measured
    # on-device): each (dy,dx) tap of the baseline kernel slices a
    # (bh, wdt, c) window out of the (wdt+2)-pitch padded activation and
    # reshapes it to GEMM layout — a vector-copy relayout per tap (9 per
    # block, each bh*wdt*c elements). This variant GEMMs over the FULL
    # padded rows (the (bh, wdt+2, c) -> (bh*(wdt+2), c) reshape is
    # pitch-exact, i.e. free) and instead shifts each tap's result by
    # (2-dx) sublanes into a (bh, wdt+4, bn) fp32 accumulator: the padded
    # halo columns are zeros, so out-of-range contributions land in the
    # discarded margin. Costs 2/wdt extra MXU FLOPs (+8% at wdt=24) for
    # zero input relayout. A/B with IDMVTON_CONV_PADACC=1.
    return os.environ.get("IDMVTON_CONV_PADACC", "0") == "1"


def _conv3_kernel_padacc(x_ref, w_ref, b_ref, o_ref, acc_ref, *,
                         bh: int, wdt: int, c: int):
    hi = pl.program_id(1)
    wp = wdt + 2
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for dy in range(3):
        xf = x_ref[0, pl.ds(hi * bh + dy, bh), :, :].reshape(bh * wp, c)
        for dx in range(3):
            tap = (3 * dy + dx) * c
            wk = w_ref[tap:tap + c, :]
            d = jax.lax.dot_general(
                xf, wk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            off = 2 - dx
            acc_ref[:, off:off + wp, :] = (
                acc_ref[:, off:off + wp, :] + d.reshape(bh, wp, -1))
    out = acc_ref[:, 2:2 + wdt, :] + b_ref[0][None, None, :]
    o_ref[0] = out.astype(o_ref.dtype)


def _pick_bh(h: int, wdt: int, target: int) -> int:
    best = 1
    for bh in range(1, h + 1):
        if h % bh == 0 and bh * wdt <= target:
            best = bh
    return best


# widest output block (lanes per grid step) considered; the per-shape
# picker below narrows until the VMEM budget fits. Measured: bn width is
# perf-NEUTRAL for the in-budget shapes (1280 vs 640 identical busy), but
# a fixed global cap either evicts the biggest convs to XLA (cap too wide:
# +7 ms) or rejects valid geometries — shape-aware is strictly safer.
CONV_BN_MAX = int(os.environ.get("IDMVTON_CONV_BN_MAX", "1280"))


def _bn_candidates(n: int):
    if n <= CONV_BN_MAX:
        yield n
    for bn in range(min(CONV_BN_MAX, n), 0, -_LANE):
        if bn % _LANE == 0 and n % bn == 0:
            yield bn


def _whole_act_need(h, wdt, cin, bn, bh, es):
    x_bytes = (h + 2) * (wdt + 2) * cin * es
    w_bytes = 9 * cin * bn * es
    o_bytes = bh * wdt * bn * es
    # padacc's explicit scratch is (bh, wdt+4, bn) fp32; the baseline's
    # implicit register accumulator is bh*wdt*bn fp32 — budget the larger
    acc_bytes = bh * (wdt + 4) * bn * 4
    return 2 * (x_bytes + w_bytes + o_bytes) + acc_bytes


def _vmem_budget() -> int:
    return int(0.85 * CONV_VMEM_LIMIT_MB) * 1024 * 1024


def _pick_bn(n: int, *, h=None, wdt=None, cin=None, es=2) -> int:
    """Widest output block; when the activation geometry is given, the
    widest that also fits the scoped-VMEM budget."""
    for bn in _bn_candidates(n):
        if h is None:
            return bn
        bh = _pick_bh(h, wdt, CONV_ROWS_TARGET)
        if _whole_act_need(h, wdt, cin, bn, bh, es) < _vmem_budget():
            return bn
    return 0


def _conv3_forward(x, w, b, rows_target):
    bsz, h, wdt, cin = x.shape
    cout = w.shape[-1]
    bh = _pick_bh(h, wdt, rows_target)
    bn = _pick_bn(cout, h=h, wdt=wdt, cin=cin,
                  es=jnp.dtype(x.dtype).itemsize)
    if bn == 0:
        # nothing fits the scoped-VMEM budget for this geometry (callers going
        # through layers.conv2d guard via conv3x3_supported, but the public
        # conv3x3 entry point must not ZeroDivisionError at trace time)
        return _conv3_xla(x, w, b)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wf = w.reshape(9 * cin, cout)
    bias = (jnp.zeros((cout,), jnp.float32) if b is None
            else b.astype(jnp.float32)).reshape(1, cout)

    grid = (bsz, h // bh, cout // bn)
    padacc = _padacc()
    kernel = (functools.partial(_conv3_kernel_padacc, bh=bh, wdt=wdt, c=cin)
              if padacc
              else functools.partial(_conv3_kernel, bh=bh, wdt=wdt, c=cin))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h + 2, wdt + 2, cin),
                         lambda bi, hi, j: (bi, 0, 0, 0)),
            pl.BlockSpec((9 * cin, bn), lambda bi, hi, j: (0, j)),
            pl.BlockSpec((1, bn), lambda bi, hi, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, bh, wdt, bn),
                               lambda bi, hi, j: (bi, hi, 0, j)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wdt, cout), x.dtype),
        scratch_shapes=([pltpu.VMEM((bh, wdt + 4, bn), jnp.float32)]
                        if padacc else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=CONV_VMEM_LIMIT_MB * 1024 * 1024,
        ) if jax.default_backend() == "tpu" else None,
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * bsz * h * wdt * cin * cout,
            bytes_accessed=(xp.size + wf.size * bsz * (h // bh)) * 2
            + bsz * h * wdt * cout * 2,
            transcendentals=0,
        ),
        interpret=(jax.default_backend() != "tpu"),
    )(xp, wf, bias)
    return out


def _conv3_hblock_kernel(x_hbm, w_ref, b_ref, o_ref, xs_ref, sem, *,
                         bh: int, wdt: int, c: int, h: int, nb: int):
    # x_hbm: full (B, H, W, C) array left in HBM; each (bi, hi) window of
    # bh+2 halo rows is DMA'd into the xs scratch exactly once (at j == 0) —
    # no host-side pad/gather materialization (a measured ~65 ms of copies
    # at VAE scale). W borders and out-of-range H edge rows are zeroed.
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    j = pl.program_id(2)

    # W interior lives at column base 8 (DMA sublane offsets must be
    # 8-aligned on Mosaic); taps read at base-1+dx, which is fine for
    # unaligned VMEM *reads*
    base = 8

    @pl.when(j == 0)
    def _load():
        zcol = jnp.zeros((bh + 2, 1, c), xs_ref.dtype)
        xs_ref[:, base - 1:base] = zcol
        xs_ref[:, base + wdt:base + wdt + 1] = zcol
        zrow = jnp.zeros((1, wdt, c), xs_ref.dtype)
        if nb == 1:
            pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(0, h)],
                xs_ref.at[pl.ds(1, h), base:base + wdt], sem).start()
            xs_ref[0:1, base:base + wdt] = zrow
            xs_ref[h + 1:h + 2, base:base + wdt] = zrow
            pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(0, h)],
                xs_ref.at[pl.ds(1, h), base:base + wdt], sem).wait()
        else:
            @pl.when(hi == 0)
            def _first():
                pltpu.make_async_copy(
                    x_hbm.at[bi, pl.ds(0, bh + 1)],
                    xs_ref.at[pl.ds(1, bh + 1), base:base + wdt],
                    sem).start()
                xs_ref[0:1, base:base + wdt] = zrow
                pltpu.make_async_copy(
                    x_hbm.at[bi, pl.ds(0, bh + 1)],
                    xs_ref.at[pl.ds(1, bh + 1), base:base + wdt],
                    sem).wait()

            @pl.when(hi == nb - 1)
            def _last():
                pltpu.make_async_copy(
                    x_hbm.at[bi, pl.ds(h - bh - 1, bh + 1)],
                    xs_ref.at[pl.ds(0, bh + 1), base:base + wdt],
                    sem).start()
                xs_ref[bh + 1:bh + 2, base:base + wdt] = zrow
                pltpu.make_async_copy(
                    x_hbm.at[bi, pl.ds(h - bh - 1, bh + 1)],
                    xs_ref.at[pl.ds(0, bh + 1), base:base + wdt],
                    sem).wait()

            @pl.when(jnp.logical_and(hi > 0, hi < nb - 1))
            def _interior():
                cp = pltpu.make_async_copy(
                    x_hbm.at[bi, pl.ds(hi * bh - 1, bh + 2)],
                    xs_ref.at[pl.ds(0, bh + 2), base:base + wdt], sem)
                cp.start()
                cp.wait()

    acc = None
    for dy in range(3):
        for dx in range(3):
            xs = xs_ref[dy:dy + bh, base - 1 + dx:base - 1 + dx + wdt, :]
            xf = xs.reshape(bh * wdt, c)
            tap = (3 * dy + dx) * c
            wk = w_ref[tap:tap + c, :]
            d = jax.lax.dot_general(
                xf, wk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            acc = d if acc is None else acc + d
    acc = acc + b_ref[0][None, :]
    o_ref[0] = acc.reshape(bh, wdt, -1).astype(o_ref.dtype)


def _pick_bh_hblock(h: int, wdt: int) -> int:
    # target ~8k GEMM rows per block: large MXU tiles, VMEM well under budget
    return _pick_bh(h, wdt, 8192)


def _conv3_hblock_forward(x, w, b):
    """Row-blocked variant for activations too large to keep whole in VMEM
    (the 768x1024-scale VAE encoder/decoder convs — XLA ran those at 29%
    MFU, 238 ms of a 298 ms decode; this kernel measures 95% MFU)."""
    bsz, h, wdt, cin = x.shape
    cout = w.shape[-1]
    bh = _pick_bh_hblock(h, wdt)
    nb = h // bh
    bn = _pick_bn(cout)
    wf = w.reshape(9 * cin, cout)
    bias = (jnp.zeros((cout,), jnp.float32) if b is None
            else b.astype(jnp.float32)).reshape(1, cout)

    grid = (bsz, nb, cout // bn)
    out = pl.pallas_call(
        functools.partial(_conv3_hblock_kernel, bh=bh, wdt=wdt, c=cin,
                          h=h, nb=nb),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9 * cin, bn), lambda bi, hi, j: (0, j)),
            pl.BlockSpec((1, bn), lambda bi, hi, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, bh, wdt, bn),
                               lambda bi, hi, j: (bi, hi, 0, j)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wdt, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((bh + 2, wdt + 16, cin), x.dtype),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=CONV_VMEM_LIMIT_MB * 1024 * 1024,
        ) if jax.default_backend() == "tpu" else None,
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * bsz * h * wdt * cin * cout,
            bytes_accessed=x.size * 2 + bsz * h * wdt * cout * 2,
            transcendentals=0,
        ),
        interpret=(jax.default_backend() != "tpu"),
    )(x, wf, bias)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _conv3_hblock_core(x, w, b):
    return _conv3_hblock_forward(x, w, b)


def _conv3_hblock_fwd(x, w, b):
    return _conv3_hblock_forward(x, w, b), (x, w, b)


def _conv3_hblock_bwd(res, g):
    x, w, b = res
    if b is None:
        _, vjp = jax.vjp(lambda x_, w_: _conv3_xla(x_, w_, None), x, w)
        return vjp(g) + (None,)
    _, vjp = jax.vjp(_conv3_xla, x, w, b)
    return vjp(g)


_conv3_hblock_core.defvjp(_conv3_hblock_fwd, _conv3_hblock_bwd)


def conv3x3_hblock(x, w, b=None):
    """Row-blocked conv3x3 for large activations (see _conv3_hblock_forward).
    x (B, H, W, Cin), w (3, 3, Cin, Cout) HWIO, stride 1, SAME."""
    return _conv3_hblock_core(x, w, b)


def conv3x3_hblock_supported(x, w) -> bool:
    if w.shape[:2] != (3, 3):
        return False
    b, h, wdt, cin = x.shape
    cout = w.shape[-1]
    bn = _pick_bn(cout)
    # cin % 128: the kernel DMAs HBM slices of the raw (B, H, W, Cin) input,
    # and Mosaic requires HBM memref slices 128-aligned along the lane
    # (channel) dim — cin 320/960 (SDXL UNet levels) fail to compile
    if cin < _LANE or cin % _LANE != 0 or cout < _LANE or bn <= 0 or wdt < 8:
        return False
    es = jnp.dtype(x.dtype).itemsize     # fp32 inputs are 2x the bf16 budget
    bh = _pick_bh_hblock(h, wdt)
    # single window scratch (the input stays in HBM; no double buffering)
    win_bytes = (bh + 2) * (wdt + 16) * cin * es
    o_bytes = bh * wdt * bn * es
    acc_bytes = bh * wdt * bn * 4
    w_bytes = 9 * cin * bn * es
    need = win_bytes + 2 * (w_bytes + o_bytes) + acc_bytes
    return need < int(0.85 * CONV_VMEM_LIMIT_MB) * 1024 * 1024


def _conv3_xla(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(x.dtype)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _conv3_core(x, w, b, rows_target):
    return _conv3_forward(x, w, b, rows_target)


def _conv3_fwd(x, w, b, rows_target):
    return _conv3_forward(x, w, b, rows_target), (x, w, b)


def _conv3_bwd(rows_target, res, g):
    x, w, b = res
    if b is None:
        _, vjp = jax.vjp(lambda x_, w_: _conv3_xla(x_, w_, None), x, w)
        return vjp(g) + (None,)
    _, vjp = jax.vjp(_conv3_xla, x, w, b)
    return vjp(g)


_conv3_core.defvjp(_conv3_fwd, _conv3_bwd)


def conv3x3(x, w, b=None, *, rows_target: Optional[int] = None):
    """x (B, H, W, Cin), w (3, 3, Cin, Cout) HWIO, stride 1, SAME."""
    return _conv3_core(x, w, b, rows_target or CONV_ROWS_TARGET)


def conv3x3_supported(x, w) -> bool:
    if w.shape[:2] != (3, 3):
        return False
    b, h, wdt, cin = x.shape
    cout = w.shape[-1]
    # cout < 128 (e.g. the 4-channel conv_out) would run GEMMs at <=1/32
    # lane utilization — XLA's layout tricks do better there.
    # _pick_bn with geometry narrows the output block until the scoped-VMEM
    # budget fits (2x double-buffered activation/weight/output + fp32 acc;
    # measured: a (6,512,384,128->256) VAE-decode conv OOMed the 100M
    # scoped limit, and fp32 inputs need 2x the bf16 estimate)
    if cin < _LANE or cout < _LANE or wdt < 8:
        return False
    es = jnp.dtype(x.dtype).itemsize
    return _pick_bn(cout, h=h, wdt=wdt, cin=cin, es=es) > 0
