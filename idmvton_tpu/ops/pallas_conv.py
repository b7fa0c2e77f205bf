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
# rows per output block (bh * W); tuned for MXU-efficient GEMM heights
CONV_ROWS_TARGET = int(os.environ.get("IDMVTON_CONV_ROWS", "2048"))


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


def _pick_bh(h: int, wdt: int, target: int) -> int:
    best = 1
    for bh in range(1, h + 1):
        if h % bh == 0 and bh * wdt <= target:
            best = bh
    return best


def _pick_bn(n: int) -> int:
    if n <= 640:
        return n
    best = 0
    for mult in range(1, 6):
        bn = mult * _LANE
        if n % bn == 0:
            best = bn
    return best


def _conv3_forward(x, w, b, rows_target):
    bsz, h, wdt, cin = x.shape
    cout = w.shape[-1]
    bh = _pick_bh(h, wdt, rows_target)
    bn = _pick_bn(cout)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wf = w.reshape(9 * cin, cout)
    bias = (jnp.zeros((cout,), jnp.float32) if b is None
            else b.astype(jnp.float32)).reshape(1, cout)

    grid = (bsz, h // bh, cout // bn)
    out = pl.pallas_call(
        functools.partial(_conv3_kernel, bh=bh, wdt=wdt, c=cin),
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
    bn = _pick_bn(cout)
    if cin < _LANE or bn <= 0 or wdt < 8:
        return False
    # scoped-VMEM budget with Mosaic's double buffering: 2x the whole padded
    # per-batch activation block + 2x weight/bias/output blocks + the fp32
    # accumulator (measured: a (6,512,384,128->256) VAE-decode conv hits
    # 105.8M and OOMs the 100M scoped limit — UNet shapes stay <25M)
    bh = _pick_bh(h, wdt, CONV_ROWS_TARGET)
    x_bytes = (h + 2) * (wdt + 2) * cin * 2
    w_bytes = 9 * cin * bn * 2
    o_bytes = bh * wdt * bn * 2
    acc_bytes = bh * wdt * bn * 4
    need = 2 * (x_bytes + w_bytes + o_bytes) + acc_bytes
    return need < int(0.85 * CONV_VMEM_LIMIT_MB) * 1024 * 1024
