"""PyTorch/diffusers/transformers checkpoint <-> idmvton_tpu param trees.

The reference loads five weight families (inference.py:232-274): two UNets
(diffusers layout; the tryon one carries IP-Adapter processor weights), the
VAE, two CLIP text towers, CLIP ViT-H, and the Perceiver Resampler
(ip-adapter-plus `image_proj`, train_xl.py:336-357). This module converts all
of them to/from our NHWC/row-major-linear functional trees.

Layout transforms:
- conv:   torch (O, I, kh, kw)  <-> ours (kh, kw, I, O)
- linear: torch (O, I)          <-> ours (I, O)
- norm:   weight -> scale

Each ``convert_*`` walks OUR param-tree structure and derives the
corresponding reference key, so every leaf is covered or a KeyError names
exactly what is missing. ``export_*`` are the inverses (used by tests to
round-trip and by the trainer to save diffusers-compatible checkpoints).

TryonNet conv_in surgery: the reference expands the 9-channel SDXL-inpainting
conv_in to 13 channels with zero-init extra channels (train_xl.py:359-373);
``convert_unet(..., allow_conv_in_expand=True)`` replicates that when handed
raw SDXL-inpainting weights.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import numpy as np
import jax.numpy as jnp

from idmvton_tpu.core.config import (
    UNetConfig, VAEConfig, CLIPTextConfig, CLIPVisionConfig, ResamplerConfig,
)

Array = np.ndarray
StateDict = Dict[str, Array]


# ---------------------------------------------------------------------------
# state-dict IO
# ---------------------------------------------------------------------------


def load_state_dict(path: str) -> StateDict:
    """Load a torch .bin/.pth/.pt (pickle) or .safetensors file to numpy."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return dict(load_file(path))
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    flat = {}

    def walk(prefix, d):
        for k, v in d.items():
            key = f"{prefix}{k}"
            if hasattr(v, "numpy"):
                flat[key] = v.float().numpy()
            elif isinstance(v, dict):
                walk(key + ".", v)
    walk("", obj)
    return flat


# ---------------------------------------------------------------------------
# leaf transforms
# ---------------------------------------------------------------------------


def _t_conv(w: Array) -> Array:
    return np.transpose(w, (2, 3, 1, 0))


def _t_conv_inv(w: Array) -> Array:
    return np.transpose(w, (3, 2, 0, 1))


def _t_lin(w: Array) -> Array:
    return np.transpose(w)


class _Mapper:
    """Accumulates (our_path -> ref_key, transform) assignments."""

    def __init__(self, sd: Optional[StateDict], dtype):
        self.sd = sd
        self.dtype = dtype
        self.used = set()
        self.exported: StateDict = {}

    def take(self, key: str, transform: Callable[[Array], Array] = lambda x: x):
        if key not in self.sd:
            raise KeyError(f"missing weight: {key}")
        self.used.add(key)
        return jnp.asarray(transform(np.asarray(self.sd[key])), self.dtype)

    # building blocks (convert direction)
    def conv(self, key):
        p = {"kernel": self.take(key + ".weight", _t_conv)}
        if key + ".bias" in self.sd:
            p["bias"] = self.take(key + ".bias")
            self.used.add(key + ".bias")
        return p

    def linear(self, key, bias=True):
        p = {"kernel": self.take(key + ".weight", _t_lin)}
        if bias:
            p["bias"] = self.take(key + ".bias")
        return p

    def norm(self, key):
        return {"scale": self.take(key + ".weight").astype(jnp.float32),
                "bias": self.take(key + ".bias").astype(jnp.float32)}


class _Exporter:
    def __init__(self, params):
        self.params = params
        self.out: StateDict = {}

    def conv(self, p, key):
        self.out[key + ".weight"] = _t_conv_inv(np.asarray(p["kernel"], np.float32))
        if "bias" in p:
            self.out[key + ".bias"] = np.asarray(p["bias"], np.float32)

    def linear(self, p, key):
        self.out[key + ".weight"] = np.asarray(p["kernel"], np.float32).T
        if "bias" in p:
            self.out[key + ".bias"] = np.asarray(p["bias"], np.float32)

    def norm(self, p, key):
        self.out[key + ".weight"] = np.asarray(p["scale"], np.float32)
        self.out[key + ".bias"] = np.asarray(p["bias"], np.float32)


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------


def _unet_schema(cfg: UNetConfig):
    """Yields (kind, our_path_tuple, diffusers_key) for every UNet submodule.

    kind in {conv, linear, norm, attn(q/k/v/out[/ip]), ff}.
    """
    entries = []

    def resnet(our, ref, has_temb=True, has_shortcut=False):
        entries.append(("norm", our + ("norm1",), ref + ".norm1"))
        entries.append(("conv", our + ("conv1",), ref + ".conv1"))
        entries.append(("norm", our + ("norm2",), ref + ".norm2"))
        entries.append(("conv", our + ("conv2",), ref + ".conv2"))
        if has_temb:
            entries.append(("linear", our + ("time_emb_proj",), ref + ".time_emb_proj"))
        if has_shortcut:
            entries.append(("conv", our + ("conv_shortcut",), ref + ".conv_shortcut"))

    def transformer(our, ref, depth):
        entries.append(("norm", our + ("norm",), ref + ".norm"))
        entries.append(("linear", our + ("proj_in",), ref + ".proj_in"))
        entries.append(("linear", our + ("proj_out",), ref + ".proj_out"))
        for k in range(depth):
            b_our = our + ("blocks", k)
            b_ref = f"{ref}.transformer_blocks.{k}"
            entries.append(("norm", b_our + ("norm1",), b_ref + ".norm1"))
            entries.append(("norm", b_our + ("norm2",), b_ref + ".norm2"))
            entries.append(("norm", b_our + ("norm3",), b_ref + ".norm3"))
            # our projections are GEMM-fused (models/attention.py); the
            # diffusers layout keeps separate to_q/to_k/to_v
            entries.append(("linear_fused", b_our + ("attn1", "to_qkv"),
                            [f"{b_ref}.attn1.to_q", f"{b_ref}.attn1.to_k",
                             f"{b_ref}.attn1.to_v"]))
            entries.append(("linear_nobias", b_our + ("attn2", "to_q"),
                            b_ref + ".attn2.to_q"))
            entries.append(("linear_fused", b_our + ("attn2", "to_kv"),
                            [f"{b_ref}.attn2.to_k", f"{b_ref}.attn2.to_v"]))
            entries.append(("linear", b_our + ("attn1", "to_out"),
                            b_ref + ".attn1.to_out.0"))
            entries.append(("linear", b_our + ("attn2", "to_out"),
                            b_ref + ".attn2.to_out.0"))
            if cfg.ip_adapter:
                entries.append(("linear_fused", b_our + ("attn2", "to_kv_ip"),
                                [f"{b_ref}.attn2.processor.to_k_ip",
                                 f"{b_ref}.attn2.processor.to_v_ip"]))
            entries.append(("linear", b_our + ("ff", "proj_in"),
                            b_ref + ".ff.net.0.proj"))
            entries.append(("linear", b_our + ("ff", "proj_out"),
                            b_ref + ".ff.net.2"))

    entries.append(("conv", ("conv_in",), "conv_in"))
    entries.append(("linear", ("time_embedding", "linear_1"), "time_embedding.linear_1"))
    entries.append(("linear", ("time_embedding", "linear_2"), "time_embedding.linear_2"))
    if cfg.addition_embed:
        entries.append(("linear", ("add_embedding", "linear_1"), "add_embedding.linear_1"))
        entries.append(("linear", ("add_embedding", "linear_2"), "add_embedding.linear_2"))

    chans = cfg.block_out_channels
    in_ch = chans[0]
    for lvl, btype in enumerate(cfg.down_block_types):
        out_ch = chans[lvl]
        for j in range(cfg.layers_per_block):
            resnet(("down_blocks", lvl, "resnets", j),
                   f"down_blocks.{lvl}.resnets.{j}",
                   has_shortcut=(j == 0 and in_ch != out_ch))
            if btype == "attn":
                transformer(("down_blocks", lvl, "attentions", j),
                            f"down_blocks.{lvl}.attentions.{j}",
                            cfg.transformer_depth[lvl])
        if lvl < cfg.num_levels - 1:
            entries.append(("conv", ("down_blocks", lvl, "downsample", "conv"),
                            f"down_blocks.{lvl}.downsamplers.0.conv"))
        in_ch = out_ch

    resnet(("mid_block", "resnets", 0), "mid_block.resnets.0")
    resnet(("mid_block", "resnets", 1), "mid_block.resnets.1")
    transformer(("mid_block", "attentions", 0), "mid_block.attentions.0",
                cfg.transformer_depth[-1])

    rev = list(reversed(chans))
    for i, btype in enumerate(cfg.up_block_types):
        lvl = cfg.num_levels - 1 - i
        if cfg.skip_final_output and btype == "plain":
            break
        for j in range(cfg.layers_per_block + 1):
            resnet(("up_blocks", i, "resnets", j),
                   f"up_blocks.{i}.resnets.{j}", has_shortcut=True)
            if btype == "attn":
                transformer(("up_blocks", i, "attentions", j),
                            f"up_blocks.{i}.attentions.{j}",
                            cfg.transformer_depth[lvl])
        if i < cfg.num_levels - 1:
            entries.append(("conv", ("up_blocks", i, "upsample", "conv"),
                            f"up_blocks.{i}.upsamplers.0.conv"))

    if not cfg.skip_final_output:
        entries.append(("norm", ("conv_norm_out",), "conv_norm_out"))
        entries.append(("conv", ("conv_out",), "conv_out"))
    return entries


def _set_path(tree, path, value):
    node = tree
    for i, p in enumerate(path[:-1]):
        nxt = path[i + 1]
        if isinstance(p, int):
            while len(node) <= p:
                node.append({})
            node = node[p]
        else:
            if p not in node:
                node[p] = [] if isinstance(nxt, int) else {}
            node = node[p]
    node[path[-1]] = value


def _get_path(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def _build_tree(entries, m: _Mapper, *, conv_in_expand_to: Optional[int] = None):
    tree: dict = {}
    for kind, our, ref in entries:
        if kind == "conv":
            val = m.conv(ref)
            if our == ("conv_in",) and conv_in_expand_to is not None:
                k = np.asarray(val["kernel"], np.float32)
                cur = k.shape[2]
                if cur < conv_in_expand_to:
                    # zero-init extra input channels (train_xl.py:359-373)
                    pad = np.zeros(
                        (k.shape[0], k.shape[1], conv_in_expand_to - cur,
                         k.shape[3]), np.float32)
                    val["kernel"] = jnp.asarray(
                        np.concatenate([k, pad], axis=2), m.dtype)
        elif kind == "linear":
            val = m.linear(ref)
        elif kind == "linear_nobias":
            val = m.linear(ref, bias=False)
        elif kind == "linear_fused":
            ws = [np.asarray(m.take(k + ".weight", _t_lin)) for k in ref]
            val = {"kernel": jnp.asarray(np.concatenate(ws, axis=1), m.dtype)}
        elif kind == "norm":
            val = m.norm(ref)
        else:
            raise ValueError(kind)
        _set_path(tree, our, val)
    return tree


def schema_keys(entries, available) -> set:
    """The exact state-dict keys _build_tree would consume for ``entries``
    (metadata only — lets manifest tests validate full-size key sets without
    materializing 10 GB of zeros)."""
    keys = set()
    for kind, _our, ref in entries:
        if kind == "conv":
            keys.add(ref + ".weight")
            if ref + ".bias" in available:
                keys.add(ref + ".bias")
        elif kind in ("linear", "norm"):
            keys.update((ref + ".weight", ref + ".bias"))
        elif kind == "linear_nobias":
            keys.add(ref + ".weight")
        elif kind == "linear_fused":
            keys.update(r + ".weight" for r in ref)
        else:
            raise ValueError(kind)
    return keys


def check_consumed(sd: StateDict, used, *, ignore_prefixes=(),
                   ignore_suffixes=("num_batches_tracked",)) -> None:
    """Raise if the converter left any state-dict key unconsumed (manifest
    tests; VERDICT r1 item 7 — a misnamed key must fail CI, not deployment)."""
    leftover = sorted(
        k for k in sd
        if k not in used
        and not any(k.startswith(p) for p in ignore_prefixes)
        and not any(k.endswith(s) for s in ignore_suffixes))
    if leftover:
        raise ValueError(
            f"{len(leftover)} unconsumed weights, e.g. {leftover[:8]}")


def convert_unet(sd: StateDict, cfg: UNetConfig, dtype=jnp.bfloat16, *,
                 allow_conv_in_expand: bool = True, strict: bool = False) -> dict:
    m = _Mapper(sd, dtype)
    expand = cfg.in_channels if allow_conv_in_expand else None
    tree = _build_tree(_unet_schema(cfg), m, conv_in_expand_to=expand)
    if strict:
        # the trained tryon UNet ckpt embeds the resampler + ip-adapter KV
        # weights; those are consumed by convert_resampler / the ip-proc path
        check_consumed(sd, m.used, ignore_prefixes=(
            "encoder_hid_proj.",), ignore_suffixes=(
            "num_batches_tracked", "to_k_ip.weight", "to_v_ip.weight"))
    return tree


def export_unet(params: dict, cfg: UNetConfig) -> StateDict:
    e = _Exporter(params)
    for kind, our, ref in _unet_schema(cfg):
        p = _get_path(params, our)
        if kind == "conv":
            e.conv(p, ref)
        elif kind in ("linear", "linear_nobias"):
            e.linear(p, ref)
        elif kind == "linear_fused":
            parts = np.split(np.asarray(p["kernel"], np.float32), len(ref),
                             axis=1)
            for key, w in zip(ref, parts):
                e.out[key + ".weight"] = w.T
        else:
            e.norm(p, ref)
    return e.out


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------


def _vae_schema(cfg: VAEConfig):
    entries = []

    def resnet(our, ref, has_shortcut):
        entries.append(("norm", our + ("norm1",), ref + ".norm1"))
        entries.append(("conv", our + ("conv1",), ref + ".conv1"))
        entries.append(("norm", our + ("norm2",), ref + ".norm2"))
        entries.append(("conv", our + ("conv2",), ref + ".conv2"))
        if has_shortcut:
            entries.append(("conv", our + ("conv_shortcut",), ref + ".conv_shortcut"))

    def attn(our, ref):
        entries.append(("norm", our + ("norm",), ref + ".group_norm"))
        entries.append(("linear", our + ("to_q",), ref + ".to_q"))
        entries.append(("linear", our + ("to_k",), ref + ".to_k"))
        entries.append(("linear", our + ("to_v",), ref + ".to_v"))
        entries.append(("linear", our + ("to_out",), ref + ".to_out.0"))

    chans = [cfg.base_channels * mlt for mlt in cfg.channel_mults]
    entries.append(("conv", ("encoder", "conv_in"), "encoder.conv_in"))
    in_ch = chans[0]
    for lvl, out_ch in enumerate(chans):
        for j in range(cfg.layers_per_block):
            resnet(("encoder", "down_blocks", lvl, "resnets", j),
                   f"encoder.down_blocks.{lvl}.resnets.{j}",
                   has_shortcut=(j == 0 and in_ch != out_ch))
        if lvl < len(chans) - 1:
            entries.append(("conv",
                            ("encoder", "down_blocks", lvl, "downsample", "conv"),
                            f"encoder.down_blocks.{lvl}.downsamplers.0.conv"))
        in_ch = out_ch
    resnet(("encoder", "mid", "resnets", 0), "encoder.mid_block.resnets.0", False)
    resnet(("encoder", "mid", "resnets", 1), "encoder.mid_block.resnets.1", False)
    attn(("encoder", "mid", "attn"), "encoder.mid_block.attentions.0")
    entries.append(("norm", ("encoder", "norm_out"), "encoder.conv_norm_out"))
    entries.append(("conv", ("encoder", "conv_out"), "encoder.conv_out"))

    entries.append(("conv", ("decoder", "conv_in"), "decoder.conv_in"))
    resnet(("decoder", "mid", "resnets", 0), "decoder.mid_block.resnets.0", False)
    resnet(("decoder", "mid", "resnets", 1), "decoder.mid_block.resnets.1", False)
    attn(("decoder", "mid", "attn"), "decoder.mid_block.attentions.0")
    rev = list(reversed(chans))
    in_ch = rev[0]
    for lvl, out_ch in enumerate(rev):
        for j in range(cfg.layers_per_block + 1):
            resnet(("decoder", "up_blocks", lvl, "resnets", j),
                   f"decoder.up_blocks.{lvl}.resnets.{j}",
                   has_shortcut=(j == 0 and in_ch != out_ch))
        if lvl < len(chans) - 1:
            entries.append(("conv",
                            ("decoder", "up_blocks", lvl, "upsample", "conv"),
                            f"decoder.up_blocks.{lvl}.upsamplers.0.conv"))
        in_ch = out_ch
    entries.append(("norm", ("decoder", "norm_out"), "decoder.conv_norm_out"))
    entries.append(("conv", ("decoder", "conv_out"), "decoder.conv_out"))
    entries.append(("conv", ("quant_conv",), "quant_conv"))
    entries.append(("conv", ("post_quant_conv",), "post_quant_conv"))
    return entries


def convert_vae(sd: StateDict, cfg: VAEConfig, dtype=jnp.bfloat16, *,
                strict: bool = False) -> dict:
    m = _Mapper(sd, dtype)
    tree = _build_tree(_vae_schema(cfg), m)
    if strict:
        check_consumed(sd, m.used)
    return tree


def export_vae(params: dict, cfg: VAEConfig) -> StateDict:
    e = _Exporter(params)
    for kind, our, ref in _vae_schema(cfg):
        p = _get_path(params, our)
        {"conv": e.conv, "linear": e.linear, "norm": e.norm}[kind](p, ref)
    return e.out


# ---------------------------------------------------------------------------
# CLIP text / vision
# ---------------------------------------------------------------------------


def _clip_layers_schema(n, prefix, our_prefix=()):
    entries = []
    for i in range(n):
        our = our_prefix + ("layers", i)
        ref = f"{prefix}.encoder.layers.{i}"
        entries.append(("norm", our + ("ln1",), ref + ".layer_norm1"))
        entries.append(("norm", our + ("ln2",), ref + ".layer_norm2"))
        for a, b in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                     ("out", "out_proj")):
            entries.append(("linear", our + ("attn", a), f"{ref}.self_attn.{b}"))
        entries.append(("linear", our + ("mlp", "fc1"), ref + ".mlp.fc1"))
        entries.append(("linear", our + ("mlp", "fc2"), ref + ".mlp.fc2"))
    return entries


def convert_clip_text(sd: StateDict, cfg: CLIPTextConfig,
                      dtype=jnp.bfloat16, *, strict: bool = False) -> dict:
    m = _Mapper(sd, dtype)
    p = "text_model"
    tree = _build_tree(_clip_layers_schema(cfg.num_layers, p), m)
    tree["token_embedding"] = {
        "embedding": m.take(f"{p}.embeddings.token_embedding.weight")}
    tree["position_embedding"] = {
        "embedding": m.take(f"{p}.embeddings.position_embedding.weight")}
    tree["final_ln"] = m.norm(f"{p}.final_layer_norm")
    if cfg.use_final_projection:
        tree["text_projection"] = {"kernel": m.take("text_projection.weight", _t_lin)}
    if strict:
        # position_ids is a constant buffer in HF ckpts, not a weight
        check_consumed(sd, m.used, ignore_suffixes=("position_ids",))
    return tree


def export_clip_text(params: dict, cfg: CLIPTextConfig) -> StateDict:
    e = _Exporter(params)
    p = "text_model"
    for kind, our, ref in _clip_layers_schema(cfg.num_layers, p):
        q = _get_path(params, our)
        {"linear": e.linear, "norm": e.norm}[kind](q, ref)
    e.out[f"{p}.embeddings.token_embedding.weight"] = np.asarray(
        params["token_embedding"]["embedding"], np.float32)
    e.out[f"{p}.embeddings.position_embedding.weight"] = np.asarray(
        params["position_embedding"]["embedding"], np.float32)
    e.norm(params["final_ln"], f"{p}.final_layer_norm")
    if cfg.use_final_projection:
        e.out["text_projection.weight"] = np.asarray(
            params["text_projection"]["kernel"], np.float32).T
    return e.out


def convert_clip_vision(sd: StateDict, cfg: CLIPVisionConfig,
                        dtype=jnp.bfloat16, *, strict: bool = False) -> dict:
    m = _Mapper(sd, dtype)
    p = "vision_model"
    tree = _build_tree(_clip_layers_schema(cfg.num_layers, p), m)
    tree["patch_embedding"] = {
        "kernel": m.take(f"{p}.embeddings.patch_embedding.weight", _t_conv)}
    tree["class_embedding"] = m.take(f"{p}.embeddings.class_embedding")
    tree["position_embedding"] = {
        "embedding": m.take(f"{p}.embeddings.position_embedding.weight")}
    # HF ships the misspelled "pre_layrnorm"
    pre = f"{p}.pre_layrnorm" if f"{p}.pre_layrnorm.weight" in sd else f"{p}.pre_layernorm"
    tree["pre_ln"] = m.norm(pre)
    tree["post_ln"] = m.norm(f"{p}.post_layernorm")
    tree["visual_projection"] = {"kernel": m.take("visual_projection.weight", _t_lin)}
    if strict:
        check_consumed(sd, m.used, ignore_prefixes=("logit_scale",))
    return tree


def export_clip_vision(params: dict, cfg: CLIPVisionConfig) -> StateDict:
    e = _Exporter(params)
    p = "vision_model"
    for kind, our, ref in _clip_layers_schema(cfg.num_layers, p):
        q = _get_path(params, our)
        {"linear": e.linear, "norm": e.norm}[kind](q, ref)
    e.out[f"{p}.embeddings.patch_embedding.weight"] = _t_conv_inv(
        np.asarray(params["patch_embedding"]["kernel"], np.float32))
    e.out[f"{p}.embeddings.class_embedding"] = np.asarray(
        params["class_embedding"], np.float32)
    e.out[f"{p}.embeddings.position_embedding.weight"] = np.asarray(
        params["position_embedding"]["embedding"], np.float32)
    e.norm(params["pre_ln"], f"{p}.pre_layrnorm")
    e.norm(params["post_ln"], f"{p}.post_layernorm")
    e.out["visual_projection.weight"] = np.asarray(
        params["visual_projection"]["kernel"], np.float32).T
    return e.out


# ---------------------------------------------------------------------------
# Perceiver Resampler (ip-adapter-plus image_proj)
# ---------------------------------------------------------------------------


def convert_resampler(sd: StateDict, cfg: ResamplerConfig,
                      dtype=jnp.bfloat16, prefix: str = "", *,
                      strict: bool = False) -> dict:
    """ip-adapter-plus `image_proj` weights (reference: ip_adapter/resampler.py
    module layout; loaded at train_xl.py:343-357). ``prefix`` e.g.
    "image_proj_model." when reading the raw ip-adapter bin."""
    m = _Mapper(sd, dtype)
    t = lambda k: prefix + k
    tree = {
        "latents": m.take(t("latents"))[0] if np.asarray(sd[t("latents")]).ndim == 3
        else m.take(t("latents")),
        "proj_in": m.linear(t("proj_in")),
        "proj_out": m.linear(t("proj_out")),
        "norm_out": m.norm(t("norm_out")),
        "layers": [],
    }
    for i in range(cfg.depth):
        tree["layers"].append({
            # layers.{i}.0 = PerceiverAttention(norm1=x-norm, norm2=latents-norm)
            "ln_x": m.norm(t(f"layers.{i}.0.norm1")),
            "ln_latents": m.norm(t(f"layers.{i}.0.norm2")),
            "to_q": m.linear(t(f"layers.{i}.0.to_q"), bias=False),
            "to_kv": m.linear(t(f"layers.{i}.0.to_kv"), bias=False),
            "to_out": m.linear(t(f"layers.{i}.0.to_out"), bias=False),
            # layers.{i}.1 = Sequential(LayerNorm, Linear, GELU, Linear)
            "ff_ln": m.norm(t(f"layers.{i}.1.0")),
            "ff_in": m.linear(t(f"layers.{i}.1.1"), bias=False),
            "ff_out": m.linear(t(f"layers.{i}.1.3"), bias=False),
        })
    if strict:
        check_consumed(sd, m.used)
    return tree


def export_resampler(params: dict, cfg: ResamplerConfig,
                     prefix: str = "") -> StateDict:
    e = _Exporter(params)
    t = lambda k: prefix + k
    e.out[t("latents")] = np.asarray(params["latents"], np.float32)[None]
    e.linear(params["proj_in"], t("proj_in"))
    e.linear(params["proj_out"], t("proj_out"))
    e.norm(params["norm_out"], t("norm_out"))
    for i, lyr in enumerate(params["layers"]):
        e.norm(lyr["ln_x"], t(f"layers.{i}.0.norm1"))
        e.norm(lyr["ln_latents"], t(f"layers.{i}.0.norm2"))
        e.linear(lyr["to_q"], t(f"layers.{i}.0.to_q"))
        e.linear(lyr["to_kv"], t(f"layers.{i}.0.to_kv"))
        e.linear(lyr["to_out"], t(f"layers.{i}.0.to_out"))
        e.norm(lyr["ff_ln"], t(f"layers.{i}.1.0"))
        e.linear(lyr["ff_in"], t(f"layers.{i}.1.1"))
        e.linear(lyr["ff_out"], t(f"layers.{i}.1.3"))
    return e.out
