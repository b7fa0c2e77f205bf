"""AutoencoderKL (SDXL VAE) — encoder/decoder with mid-block single-head
attention, NHWC. reference usage: src/tryon_pipeline.py:911 _encode_vae_image,
:1868-1880 fp32 decode; scaling factor applied by callers.

The reference must force-upcast its fp16 VAE decode to fp32
(tryon_pipeline.py:1868); on TPU we default to bf16 compute with an fp32
decode option (VAEConfig.force_upcast) validated by the SSIM gate.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from idmvton_tpu.core.config import VAEConfig
from idmvton_tpu.models.layers import (
    init_conv, init_linear, init_norm, conv2d, linear, group_norm,
)
from idmvton_tpu.models.resnet import (
    init_resnet_block, resnet_block, init_downsample, downsample2d,
    init_upsample, upsample2d,
)
from idmvton_tpu.ops.attention import sdpa


def _init_vae_attn(key, ch: int, dtype):
    ks = jax.random.split(key, 4)
    return {
        "norm": init_norm(ch),
        "to_q": init_linear(ks[0], ch, ch, dtype=dtype),
        "to_k": init_linear(ks[1], ch, ch, dtype=dtype),
        "to_v": init_linear(ks[2], ch, ch, dtype=dtype),
        "to_out": init_linear(ks[3], ch, ch, dtype=dtype),
    }


def _vae_attn(params, x, *, num_groups: int):
    b, h, w, c = x.shape
    res = x
    hs = group_norm(params["norm"], x, num_groups=num_groups, eps=1e-6)
    hs = hs.reshape(b, h * w, c)
    q = linear(params["to_q"], hs)[:, :, None, :]   # single head
    k = linear(params["to_k"], hs)[:, :, None, :]
    v = linear(params["to_v"], hs)[:, :, None, :]
    out = sdpa(q, k, v, impl="xla")[:, :, 0, :]
    out = linear(params["to_out"], out)
    return res + out.reshape(b, h, w, c)


def init_vae(key, cfg: VAEConfig, dtype=jnp.bfloat16):
    keys = iter(jax.random.split(key, 512))
    nk = lambda: next(keys)
    chans = [cfg.base_channels * m for m in cfg.channel_mults]
    ng = cfg.norm_num_groups

    def res(in_ch, out_ch):
        return init_resnet_block(nk(), in_ch, out_ch, temb_dim=None,
                                 num_groups=ng, dtype=dtype)

    # encoder
    enc = {"conv_in": init_conv(nk(), cfg.in_channels, chans[0], 3, dtype=dtype),
           "down_blocks": []}
    in_ch = chans[0]
    for lvl, out_ch in enumerate(chans):
        blk = {"resnets": [res(in_ch if i == 0 else out_ch, out_ch)
                           for i in range(cfg.layers_per_block)]}
        if lvl < len(chans) - 1:
            blk["downsample"] = init_downsample(nk(), out_ch, dtype=dtype)
        enc["down_blocks"].append(blk)
        in_ch = out_ch
    enc["mid"] = {"resnets": [res(chans[-1], chans[-1]), res(chans[-1], chans[-1])],
                  "attn": _init_vae_attn(nk(), chans[-1], dtype)}
    enc["norm_out"] = init_norm(chans[-1])
    enc["conv_out"] = init_conv(nk(), chans[-1], 2 * cfg.latent_channels, 3,
                                dtype=dtype)

    # decoder
    dec = {"conv_in": init_conv(nk(), cfg.latent_channels, chans[-1], 3, dtype=dtype),
           "mid": {"resnets": [res(chans[-1], chans[-1]), res(chans[-1], chans[-1])],
                   "attn": _init_vae_attn(nk(), chans[-1], dtype)},
           "up_blocks": []}
    rev = list(reversed(chans))
    in_ch = rev[0]
    for lvl, out_ch in enumerate(rev):
        blk = {"resnets": [res(in_ch if i == 0 else out_ch, out_ch)
                           for i in range(cfg.layers_per_block + 1)]}
        if lvl < len(chans) - 1:
            blk["upsample"] = init_upsample(nk(), out_ch, dtype=dtype)
        dec["up_blocks"].append(blk)
        in_ch = out_ch
    dec["norm_out"] = init_norm(chans[0])
    dec["conv_out"] = init_conv(nk(), chans[0], cfg.in_channels, 3, dtype=dtype)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": init_conv(nk(), 2 * cfg.latent_channels,
                                2 * cfg.latent_channels, 1, dtype=dtype),
        "post_quant_conv": init_conv(nk(), cfg.latent_channels,
                                     cfg.latent_channels, 1, dtype=dtype),
    }


def vae_encode_moments(params, cfg: VAEConfig, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: (B, H, W, 3) in [-1, 1]. Returns (mean, logvar), each (B, H/8, W/8, 4)."""
    ng = cfg.norm_num_groups
    enc = params["encoder"]
    h = conv2d(enc["conv_in"], x)
    for blk in enc["down_blocks"]:
        for r in blk["resnets"]:
            h = resnet_block(r, h, None, num_groups=ng)
        if "downsample" in blk:
            h = downsample2d(blk["downsample"], h)
    mid = enc["mid"]
    h = resnet_block(mid["resnets"][0], h, None, num_groups=ng)
    h = _vae_attn(mid["attn"], h, num_groups=ng)
    h = resnet_block(mid["resnets"][1], h, None, num_groups=ng)
    h = group_norm(enc["norm_out"], h, num_groups=ng, act="silu")
    h = conv2d(enc["conv_out"], h)
    h = conv2d(params["quant_conv"], h)
    mean, logvar = jnp.split(h, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def vae_encode(params, cfg: VAEConfig, x, rng=None, *, sample: bool = True,
               scale: bool = True):
    """Encode to scaled latents. Deterministic (mode) when sample=False or rng
    is None — the reference samples at train and inference via the generator
    (tryon_pipeline.py:911-932)."""
    mean, logvar = vae_encode_moments(params, cfg, x)
    z = mean
    if sample and rng is not None:
        std = jnp.exp(0.5 * logvar.astype(jnp.float32))
        z = mean + (std * jax.random.normal(rng, mean.shape, jnp.float32)).astype(mean.dtype)
    if scale:
        z = z * jnp.asarray(cfg.scaling_factor, z.dtype)
    return z


def vae_decode(params, cfg: VAEConfig, z, *, scaled_input: bool = True):
    """z: (B, h, w, 4) scaled latents -> (B, 8h, 8w, 3) in [-1, 1]."""
    if scaled_input:
        z = z / jnp.asarray(cfg.scaling_factor, z.dtype)
    if cfg.force_upcast:
        z = z.astype(jnp.float32)
    ng = cfg.norm_num_groups
    dec = params["decoder"]
    h = conv2d(params["post_quant_conv"], z)
    h = conv2d(dec["conv_in"], h)
    mid = dec["mid"]
    h = resnet_block(mid["resnets"][0], h, None, num_groups=ng)
    h = _vae_attn(mid["attn"], h, num_groups=ng)
    h = resnet_block(mid["resnets"][1], h, None, num_groups=ng)
    for blk in dec["up_blocks"]:
        for r in blk["resnets"]:
            h = resnet_block(r, h, None, num_groups=ng)
        if "upsample" in blk:
            h = upsample2d(blk["upsample"], h)
    h = group_norm(dec["norm_out"], h, num_groups=ng, act="silu")
    return conv2d(dec["conv_out"], h)
