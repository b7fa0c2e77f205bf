"""CLIP text towers (CLIP-L + OpenCLIP bigG) and CLIP ViT-H vision tower.

SDXL consumes hidden_states[-2] (the penultimate layer output) of both text
encoders concatenated to a 2048-d context, plus bigG's pooled projection
(reference: src/tryon_pipeline.py:609-645 encode_prompt). IP-Adapter-plus
consumes hidden_states[-2] of ViT-H (reference: src/tryon_pipeline.py:460-484
encode_image).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from idmvton_tpu.core.config import CLIPTextConfig, CLIPVisionConfig
from idmvton_tpu.models.layers import (
    init_linear, init_norm, init_embedding, init_conv,
    linear, layer_norm, embedding_lookup, conv2d, ACTIVATIONS,
)
from idmvton_tpu.ops.attention import sdpa


# ---------------------------------------------------------------------------
# shared transformer encoder layer (pre-LN, biased qkv)
# ---------------------------------------------------------------------------


def _init_encoder_layer(key, hidden: int, intermediate: int, dtype):
    ks = jax.random.split(key, 6)
    return {
        "ln1": init_norm(hidden),
        "attn": {
            "q": init_linear(ks[0], hidden, hidden, dtype=dtype),
            "k": init_linear(ks[1], hidden, hidden, dtype=dtype),
            "v": init_linear(ks[2], hidden, hidden, dtype=dtype),
            "out": init_linear(ks[3], hidden, hidden, dtype=dtype),
        },
        "ln2": init_norm(hidden),
        "mlp": {
            "fc1": init_linear(ks[4], hidden, intermediate, dtype=dtype),
            "fc2": init_linear(ks[5], intermediate, hidden, dtype=dtype),
        },
    }


def _encoder_layer(params, x, *, num_heads: int, act, causal: bool):
    h = layer_norm(params["ln1"], x)
    b, s, c = h.shape
    hd = c // num_heads
    q = linear(params["attn"]["q"], h).reshape(b, s, num_heads, hd)
    k = linear(params["attn"]["k"], h).reshape(b, s, num_heads, hd)
    v = linear(params["attn"]["v"], h).reshape(b, s, num_heads, hd)
    if causal:
        # CLIP text towers are causal; short fixed S=77 so masked XLA softmax
        # is already optimal.
        scale = hd ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        mask = jnp.tril(jnp.ones((s, s), bool))
        logits = jnp.where(mask, logits.astype(jnp.float32), -1e9)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                          preferred_element_type=jnp.float32).astype(x.dtype)
    else:
        attn = sdpa(q, k, v, impl="xla")
    x = x + linear(params["attn"]["out"], attn.reshape(b, s, c))
    h = layer_norm(params["ln2"], x)
    h = linear(params["mlp"]["fc1"], h)
    h = act(h.astype(jnp.float32)).astype(x.dtype)
    x = x + linear(params["mlp"]["fc2"], h)
    return x


# ---------------------------------------------------------------------------
# text tower
# ---------------------------------------------------------------------------


def init_clip_text(key, cfg: CLIPTextConfig, dtype=jnp.bfloat16):
    keys = iter(jax.random.split(key, cfg.num_layers + 4))
    nk = lambda: next(keys)
    p = {
        "token_embedding": init_embedding(nk(), cfg.vocab_size, cfg.hidden_size,
                                          dtype=dtype),
        "position_embedding": init_embedding(nk(), cfg.max_position_embeddings,
                                             cfg.hidden_size, dtype=dtype),
        "layers": [_init_encoder_layer(nk(), cfg.hidden_size,
                                       cfg.intermediate_size, dtype)
                   for _ in range(cfg.num_layers)],
        "final_ln": init_norm(cfg.hidden_size),
    }
    if cfg.use_final_projection:
        p["text_projection"] = init_linear(nk(), cfg.hidden_size,
                                           cfg.projection_dim, bias=False,
                                           dtype=dtype)
    return p


def clip_text_apply(params, cfg: CLIPTextConfig, input_ids, *,
                    clip_skip: int = None, stack_fn=None):
    """input_ids: (B, 77) int32. Returns dict with:
    - penultimate: hidden_states[-2] (B, 77, hidden) — what SDXL consumes
    - pooled: eos-token pooled projection (B, projection_dim) if configured

    clip_skip=k selects hidden_states[-(k+2)] instead (k extra final layers
    skipped), matching the reference encode_prompt's clip_skip branch
    (src/tryon_pipeline.py:637-641); None/0 is the default penultimate.
    Pooled output is unaffected (it always comes off the full tower).

    stack_fn: optional override for the encoder-layer stack —
    stack_fn(x, capture_before) -> (final_hidden, captured_hidden). Used by
    clip_text_apply_pp so the embedding / final-LN / pooling ends live in
    exactly one place.
    """
    skip = clip_skip or 0
    if not 0 <= skip < cfg.num_layers:
        raise ValueError(f"clip_skip={clip_skip} out of range for "
                         f"{cfg.num_layers}-layer tower")
    act = ACTIVATIONS[cfg.hidden_act]
    x = embedding_lookup(params["token_embedding"], input_ids)
    pos = params["position_embedding"]["embedding"][: input_ids.shape[1]]
    x = x + pos[None].astype(x.dtype)
    cap_idx = cfg.num_layers - 1 - skip
    if stack_fn is not None:
        x, penultimate = stack_fn(x, cap_idx)
    else:
        penultimate = None
        for i, lyr in enumerate(params["layers"]):
            if i == cap_idx:
                penultimate = x
            x = _encoder_layer(lyr, x, num_heads=cfg.num_heads, act=act,
                               causal=True)
    last = layer_norm(params["final_ln"], x)
    out = {"penultimate": penultimate, "last_hidden": last}
    if cfg.use_final_projection:
        # pool at the eos token = argmax of ids (eos has the largest id in the
        # CLIP vocab), matching CLIPTextModelWithProjection
        eos_idx = jnp.argmax(input_ids, axis=-1)
        pooled = jnp.take_along_axis(last, eos_idx[:, None, None], axis=1)[:, 0]
        out["pooled"] = linear(params["text_projection"], pooled)
    return out


def clip_text_apply_pp(params, cfg: CLIPTextConfig, input_ids, *, mesh,
                       n_micro: int = 2, clip_skip: int = None, staged=None):
    """Pipeline-parallel clip_text_apply: the L identical encoder layers are
    split into mesh-'model'-axis stages and microbatches flow through a
    GPipe schedule (parallel/pp.py). Numerically identical outputs to
    clip_text_apply — the penultimate/clip_skip seam is taken with
    gpipe's capture_before, and the embedding / final-LN / eos-pool ends
    stay replicated (they are <1% of tower FLOPs).

    Beyond-reference scaling path (the reference runs its towers
    single-device, src/tryon_pipeline.py:609-645). To actually realize the
    1/S-weights-per-chip residency, pre-stage ONCE at load time —
    ``staged = shard_stages(params["layers"], mesh)`` — pass it here and
    drop the replicated ``params["layers"]``; staging inside every call
    (the staged=None convenience path) keeps the replicated copy live and
    re-stacks per forward.
    """
    from idmvton_tpu.parallel.pp import gpipe, shard_stages

    if staged is None:
        staged = shard_stages(params["layers"], mesh)
    act = ACTIVATIONS[cfg.hidden_act]
    layer_fn = lambda lyr, h: _encoder_layer(
        lyr, h, num_heads=cfg.num_heads, act=act, causal=True)
    stack_fn = lambda x, cap: gpipe(layer_fn, staged, x, mesh=mesh,
                                    n_micro=n_micro, capture_before=cap)
    return clip_text_apply(params, cfg, input_ids, clip_skip=clip_skip,
                           stack_fn=stack_fn)


# ---------------------------------------------------------------------------
# vision tower (ViT-H/14)
# ---------------------------------------------------------------------------


def init_clip_vision(key, cfg: CLIPVisionConfig, dtype=jnp.bfloat16):
    keys = iter(jax.random.split(key, cfg.num_layers + 6))
    nk = lambda: next(keys)
    num_patches = (cfg.image_size // cfg.patch_size) ** 2
    p = {
        "patch_embedding": init_conv(nk(), 3, cfg.hidden_size, cfg.patch_size,
                                     bias=False, dtype=dtype),
        "class_embedding": jnp.zeros((cfg.hidden_size,), dtype),
        "position_embedding": init_embedding(nk(), num_patches + 1,
                                             cfg.hidden_size, dtype=dtype),
        "pre_ln": init_norm(cfg.hidden_size),
        "layers": [_init_encoder_layer(nk(), cfg.hidden_size,
                                       cfg.intermediate_size, dtype)
                   for _ in range(cfg.num_layers)],
        "post_ln": init_norm(cfg.hidden_size),
        "visual_projection": init_linear(nk(), cfg.hidden_size,
                                         cfg.projection_dim, bias=False,
                                         dtype=dtype),
    }
    return p


def clip_vision_apply(params, cfg: CLIPVisionConfig, pixel_values, *,
                      stack_fn=None):
    """pixel_values: (B, H, W, 3), CLIP-normalized. Returns dict with:
    - penultimate: hidden_states[-2] (B, 1+P, hidden) — IP-Adapter-plus input
    - image_embeds: projected CLS embedding (B, projection_dim)

    stack_fn: optional layer-stack override (see clip_text_apply) — the
    clip_vision_apply_pp seam.
    """
    act = ACTIVATIONS[cfg.hidden_act]
    h = conv2d(params["patch_embedding"], pixel_values,
               stride=cfg.patch_size, padding="VALID")
    b, ph, pw, c = h.shape
    h = h.reshape(b, ph * pw, c)
    cls = jnp.broadcast_to(params["class_embedding"].astype(h.dtype), (b, 1, c))
    h = jnp.concatenate([cls, h], axis=1)
    h = h + params["position_embedding"]["embedding"][None, : h.shape[1]].astype(h.dtype)
    h = layer_norm(params["pre_ln"], h)
    if stack_fn is not None:
        h, penultimate = stack_fn(h, cfg.num_layers - 1)
    else:
        penultimate = None
        for i, lyr in enumerate(params["layers"]):
            if i == cfg.num_layers - 1:
                penultimate = h
            h = _encoder_layer(lyr, h, num_heads=cfg.num_heads, act=act,
                               causal=False)
    pooled = layer_norm(params["post_ln"], h[:, 0])
    return {
        "penultimate": penultimate,
        "image_embeds": linear(params["visual_projection"], pooled),
    }


def clip_vision_apply_pp(params, cfg: CLIPVisionConfig, pixel_values, *,
                         mesh, n_micro: int = 2, staged=None):
    """Pipeline-parallel clip_vision_apply (parallel/pp.py) — same GPipe
    split as clip_text_apply_pp; ViT-H's 32 identical non-causal layers
    are the largest frozen-tower stack in the system. Numerically identical
    outputs to clip_vision_apply; patch/class/position embedding and the
    post-LN/projection ends stay replicated. Pre-stage once at load time
    (pass ``staged``) to hold only 1/S of the layer weights per chip."""
    from idmvton_tpu.parallel.pp import gpipe, shard_stages

    if staged is None:
        staged = shard_stages(params["layers"], mesh)
    act = ACTIVATIONS[cfg.hidden_act]
    layer_fn = lambda lyr, x: _encoder_layer(
        lyr, x, num_heads=cfg.num_heads, act=act, causal=False)
    stack_fn = lambda x, cap: gpipe(layer_fn, staged, x, mesh=mesh,
                                    n_micro=n_micro, capture_before=cap)
    return clip_vision_apply(params, cfg, pixel_values, stack_fn=stack_fn)
