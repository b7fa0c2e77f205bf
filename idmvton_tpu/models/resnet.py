"""ResnetBlock2D + up/down sampling (diffusers ResnetBlock2D semantics,
NHWC layout). reference: diffusers primitives used throughout
src/unet_block_hacked_*.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from idmvton_tpu.models.layers import (
    init_conv, init_linear, init_norm, conv2d, linear, group_norm,
)


def init_resnet_block(key, in_ch: int, out_ch: int, *, temb_dim: Optional[int],
                      num_groups: int = 32, dtype=jnp.bfloat16):
    ks = jax.random.split(key, 4)
    p = {
        "norm1": init_norm(in_ch),
        "conv1": init_conv(ks[0], in_ch, out_ch, 3, dtype=dtype),
        "norm2": init_norm(out_ch),
        "conv2": init_conv(ks[1], out_ch, out_ch, 3, dtype=dtype),
    }
    if temb_dim is not None:
        p["time_emb_proj"] = init_linear(ks[2], temb_dim, out_ch, dtype=dtype)
    if in_ch != out_ch:
        p["conv_shortcut"] = init_conv(ks[3], in_ch, out_ch, 1, dtype=dtype)
    return p


def resnet_block(params, x, temb=None, *, num_groups: int = 32, impl=None):
    h = group_norm(params["norm1"], x, num_groups=num_groups, act="silu",
                   impl=impl)
    h = conv2d(params["conv1"], h, impl=impl)
    if temb is not None and "time_emb_proj" in params:
        t = linear(params["time_emb_proj"], jax.nn.silu(temb.astype(jnp.float32)).astype(h.dtype))
        h = h + t[:, None, None, :]
    h = group_norm(params["norm2"], h, num_groups=num_groups, act="silu",
                   impl=impl)
    h = conv2d(params["conv2"], h, impl=impl)
    if "conv_shortcut" in params:
        x = conv2d(params["conv_shortcut"], x, impl=impl)
    return x + h


def init_downsample(key, ch: int, dtype=jnp.bfloat16):
    return {"conv": init_conv(key, ch, ch, 3, dtype=dtype)}


def downsample2d(params, x, *, impl=None):
    # diffusers Downsample2D: stride-2 conv with asymmetric (0,1) padding
    return conv2d(params["conv"], x, stride=2, padding=((0, 1), (0, 1)),
                  impl=impl)


def init_upsample(key, ch: int, out_ch: Optional[int] = None, dtype=jnp.bfloat16):
    return {"conv": init_conv(key, ch, out_ch or ch, 3, dtype=dtype)}


def upsample2d(params, x, out_hw: Optional[tuple] = None, *, impl=None):
    """Nearest 2x upsample (or to explicit ``out_hw`` — diffusers forwards the
    skip connection's size so odd input dims round-trip, Upsample2D semantics)."""
    b, h, w, c = x.shape
    th, tw = out_hw if out_hw is not None else (h * 2, w * 2)
    x = jax.image.resize(x, (b, th, tw, c), method="nearest")
    return conv2d(params["conv"], x, impl=impl)
