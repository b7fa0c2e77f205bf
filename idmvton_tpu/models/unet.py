"""One parametric SDXL UNet2DCondition covering TryonNet, GarmentNet and
vanilla SDXL — replacing the reference's four duplicated files
(src/unet_hacked_tryon.py + unet_block_hacked_tryon.py ~4.9k LoC and
src/unet_hacked_garmnet.py + unet_block_hacked_garmnet.py ~4.9k LoC differ
only in whether transformer blocks emit or consume garment features).

forward contract (mirrors UNet2DConditionModel.forward,
reference tryon: src/unet_hacked_tryon.py:1006, garmnet: src/unet_hacked_garmnet.py:917):

  unet_apply(params, cfg, sample, timesteps, context,
             added_cond=(pooled_text, time_ids) | None,
             garment_features=tuple | None)
    -> (noise_pred | None, emitted_features_tuple)

- consume mode expects ``cfg.num_garment_features`` features ordered by
  execution (down -> mid -> up), exactly the order emit mode produces them —
  the same invariant the reference maintains with its running index.
- emit mode (GarmentNet) skips the trailing plain up-block and conv_out
  (reference: src/unet_hacked_garmnet.py:1255-1284 returns right after the
  cross-attn up blocks) and returns (None, features).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from idmvton_tpu.core.config import UNetConfig
from idmvton_tpu.models.layers import (
    init_conv, init_linear, init_norm, conv2d, linear, group_norm,
    timestep_embedding,
)
from idmvton_tpu.models.resnet import (
    init_resnet_block, resnet_block, init_downsample, downsample2d,
    init_upsample, upsample2d,
)
from idmvton_tpu.models.transformer import init_transformer2d, transformer2d


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_unet(key, cfg: UNetConfig, dtype=jnp.bfloat16):
    chans = cfg.block_out_channels
    temb_dim = chans[0] * cfg.time_embed_dim_mult
    head_dim = cfg.attention_head_dim
    keys = iter(jax.random.split(key, 4096))
    nk = lambda: next(keys)

    params = {
        "conv_in": init_conv(nk(), cfg.in_channels, chans[0], 3, dtype=dtype),
        "time_embedding": {
            "linear_1": init_linear(nk(), chans[0], temb_dim, dtype=dtype),
            "linear_2": init_linear(nk(), temb_dim, temb_dim, dtype=dtype),
        },
    }
    if cfg.addition_embed:
        params["add_embedding"] = {
            "linear_1": init_linear(nk(), cfg.projection_class_embeddings_input_dim,
                                    temb_dim, dtype=dtype),
            "linear_2": init_linear(nk(), temb_dim, temb_dim, dtype=dtype),
        }

    def make_t2d(ch, depth):
        return init_transformer2d(
            nk(), ch, depth=depth, heads=ch // head_dim, head_dim=head_dim,
            context_dim=cfg.cross_attention_dim, ip_adapter=cfg.ip_adapter,
            dtype=dtype)

    # down blocks
    down_blocks = []
    in_ch = chans[0]
    for lvl, btype in enumerate(cfg.down_block_types):
        out_ch = chans[lvl]
        blk = {"resnets": []}
        if btype == "attn":
            blk["attentions"] = []
        for i in range(cfg.layers_per_block):
            blk["resnets"].append(init_resnet_block(
                nk(), in_ch if i == 0 else out_ch, out_ch,
                temb_dim=temb_dim, num_groups=cfg.norm_num_groups, dtype=dtype))
            if btype == "attn":
                blk["attentions"].append(make_t2d(out_ch, cfg.transformer_depth[lvl]))
        if lvl < cfg.num_levels - 1:
            blk["downsample"] = init_downsample(nk(), out_ch, dtype=dtype)
        down_blocks.append(blk)
        in_ch = out_ch
    params["down_blocks"] = down_blocks

    # mid block
    mid_ch = chans[-1]
    params["mid_block"] = {
        "resnets": [
            init_resnet_block(nk(), mid_ch, mid_ch, temb_dim=temb_dim,
                              num_groups=cfg.norm_num_groups, dtype=dtype),
            init_resnet_block(nk(), mid_ch, mid_ch, temb_dim=temb_dim,
                              num_groups=cfg.norm_num_groups, dtype=dtype),
        ],
        "attentions": [make_t2d(mid_ch, cfg.transformer_depth[-1])],
    }

    # up blocks (reversed channel order; each consumes layers_per_block+1 skips)
    up_blocks = []
    rev = list(reversed(chans))
    for i, btype in enumerate(cfg.up_block_types):
        lvl = cfg.num_levels - 1 - i
        if cfg.skip_final_output and btype == "plain":
            # GarmentNet never runs its trailing plain up blocks (the forward
            # breaks at the same condition below); the reference checkpoint
            # still SHIPS those weights (unet_hacked_garmnet.py defines all
            # blocks), but allocating dead HBM for them hurts on TPU — the
            # converter skips the same keys (converter.py::_unet_schema)
            break
        out_ch = rev[i]
        prev_out = rev[max(i - 1, 0)]
        in_skip = rev[min(i + 1, cfg.num_levels - 1)]
        blk = {"resnets": []}
        if btype == "attn":
            blk["attentions"] = []
        for j in range(cfg.layers_per_block + 1):
            res_skip = in_skip if j == cfg.layers_per_block else out_ch
            res_in = prev_out if j == 0 else out_ch
            blk["resnets"].append(init_resnet_block(
                nk(), res_in + res_skip, out_ch, temb_dim=temb_dim,
                num_groups=cfg.norm_num_groups, dtype=dtype))
            if btype == "attn":
                blk["attentions"].append(make_t2d(out_ch, cfg.transformer_depth[lvl]))
        if i < cfg.num_levels - 1:
            blk["upsample"] = init_upsample(nk(), out_ch, dtype=dtype)
        up_blocks.append(blk)
    params["up_blocks"] = up_blocks

    if not cfg.skip_final_output:
        params["conv_norm_out"] = init_norm(chans[0])
        params["conv_out"] = init_conv(nk(), chans[0], cfg.out_channels, 3,
                                       dtype=dtype)
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _time_embed(params, cfg: UNetConfig, timesteps, added_cond, dtype):
    temb = timestep_embedding(timesteps, cfg.block_out_channels[0]).astype(dtype)
    te = params["time_embedding"]
    temb = linear(te["linear_2"],
                  jax.nn.silu(linear(te["linear_1"], temb).astype(jnp.float32)).astype(dtype))
    if cfg.addition_embed and added_cond is not None:
        # SDXL "text_time": 6 micro-cond ids -> sinusoidal 256 each, concat
        # pooled text embed -> 2-layer MLP (reference: src/unet_hacked_tryon.py
        # addition_embed_type == "text_time" path).
        pooled_text, time_ids = added_cond
        b = time_ids.shape[0]
        tid = timestep_embedding(time_ids.reshape(-1), cfg.addition_time_embed_dim)
        tid = tid.reshape(b, -1).astype(dtype)
        add_in = jnp.concatenate([pooled_text.astype(dtype), tid], axis=-1)
        ae = params["add_embedding"]
        aug = linear(ae["linear_2"],
                     jax.nn.silu(linear(ae["linear_1"], add_in).astype(jnp.float32)).astype(dtype))
        temb = temb + aug
    return temb


def _maybe_remat(fn, enabled: bool):
    return jax.checkpoint(fn) if enabled else fn


def unet_apply(params, cfg: UNetConfig, sample, timesteps, context, *,
               added_cond=None,
               garment_features: Optional[Tuple[jnp.ndarray, ...]] = None,
               garment_uncond_zero: bool = False,
               impl: Optional[str] = None,
               remat: bool = False):
    """sample: (B, H, W, in_channels) NHWC; timesteps: (B,) or scalar;
    context: (B, S, cross_attention_dim) text [+ ip] tokens.

    garment_uncond_zero: CFG layout — garment_features carry only the cond
    half (B/2 rows); the leading B/2 rows attend to all-zero garment KV,
    which the attention computes analytically instead of materializing the
    reference's zeros-concat (src/tryon_pipeline.py:1787)."""
    dtype = sample.dtype
    mode = cfg.garment_mode
    if mode == "consume":
        assert garment_features is not None and \
            len(garment_features) == cfg.num_garment_features, \
            (len(garment_features or ()), cfg.num_garment_features)
        if garment_uncond_zero:
            assert 2 * garment_features[0].shape[0] == sample.shape[0], \
                (garment_features[0].shape, sample.shape)
    if jnp.ndim(timesteps) == 0:
        timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

    temb = _time_embed(params, cfg, timesteps, added_cond, dtype)
    head_dim = cfg.attention_head_dim
    ng = cfg.norm_num_groups

    feat_idx = 0  # trace-time counter over the static feature tuple
    emitted = []

    def run_t2d(t2d_params, h, depth):
        nonlocal feat_idx
        gf = None
        if mode == "consume":
            gf = tuple(garment_features[feat_idx:feat_idx + depth])
            feat_idx += depth
        heads = h.shape[-1] // head_dim
        fn = partial(transformer2d, heads=heads, num_groups=ng,
                     garment_mode=mode,
                     garment_uncond_zero=garment_uncond_zero,
                     ip_num_tokens=cfg.ip_num_tokens if cfg.ip_adapter else 0,
                     ip_scale=cfg.ip_scale, impl=impl)
        h, em = _maybe_remat(
            lambda p, x, c, g: fn(p, x, c, garment_feats=g), remat
        )(t2d_params, h, context, gf)
        if mode == "emit":
            emitted.extend(em)
        return h

    run_res = _maybe_remat(
        lambda p, x, t: resnet_block(p, x, t, num_groups=ng, impl=impl),
        remat)

    h = conv2d(params["conv_in"], sample, impl=impl)
    res_stack = [h]

    # down
    for lvl, blk in enumerate(params["down_blocks"]):
        btype = cfg.down_block_types[lvl]
        for i, res in enumerate(blk["resnets"]):
            h = run_res(res, h, temb)
            if btype == "attn":
                h = run_t2d(blk["attentions"][i], h, cfg.transformer_depth[lvl])
            res_stack.append(h)
        if "downsample" in blk:
            h = downsample2d(blk["downsample"], h, impl=impl)
            res_stack.append(h)

    # mid
    mid = params["mid_block"]
    h = run_res(mid["resnets"][0], h, temb)
    h = run_t2d(mid["attentions"][0], h, cfg.transformer_depth[-1])
    h = run_res(mid["resnets"][1], h, temb)

    # up
    for i, blk in enumerate(params["up_blocks"]):
        lvl = cfg.num_levels - 1 - i
        btype = cfg.up_block_types[i]
        if cfg.skip_final_output and btype == "plain":
            # GarmentNet stops after the cross-attn up blocks
            break
        for j, res in enumerate(blk["resnets"]):
            skip = res_stack.pop()
            h = jnp.concatenate([h, skip], axis=-1)
            h = run_res(res, h, temb)
            if btype == "attn":
                h = run_t2d(blk["attentions"][j], h, cfg.transformer_depth[lvl])
        if "upsample" in blk:
            target = res_stack[-1].shape[1:3] if res_stack else None
            h = upsample2d(blk["upsample"], h, out_hw=target, impl=impl)

    if cfg.skip_final_output:
        return None, tuple(emitted)

    h = group_norm(params["conv_norm_out"], h, num_groups=ng, act="silu",
                   impl=impl)
    h = conv2d(params["conv_out"], h, impl=impl)
    return h, tuple(emitted)
