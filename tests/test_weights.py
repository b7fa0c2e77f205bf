"""Weight converter round-trip tests: our init -> diffusers-layout state dict
-> convert back must reproduce the tree exactly, and converted params must be
drop-in usable by the forward functions."""

import jax
import jax.numpy as jnp
import numpy as np

from idmvton_tpu.core.config import (
    UNetConfig, VAEConfig, CLIPTextConfig, CLIPVisionConfig, ResamplerConfig,
)
from idmvton_tpu.models.unet import init_unet, unet_apply
from idmvton_tpu.models.vae import init_vae
from idmvton_tpu.models.clip import init_clip_text, init_clip_vision
from idmvton_tpu.models.resampler import init_resampler
from idmvton_tpu.weights.converter import (
    convert_unet, export_unet, convert_vae, export_vae,
    convert_clip_text, export_clip_text, convert_clip_vision,
    export_clip_vision, convert_resampler, export_resampler,
)

DTYPE = jnp.float32


def _trees_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb, (ta, tb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_unet_roundtrip():
    cfg = UNetConfig.tiny("consume")
    p = init_unet(jax.random.PRNGKey(0), cfg, dtype=DTYPE)
    sd = export_unet(p, cfg)
    # state dict uses the diffusers/IDM-VTON naming
    assert "down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_q.weight" in sd
    assert "down_blocks.1.attentions.0.transformer_blocks.0.attn2.processor.to_k_ip.weight" in sd
    assert "mid_block.attentions.0.proj_in.weight" in sd
    p2 = convert_unet(sd, cfg, dtype=DTYPE)
    _trees_equal(p, p2)


def test_unet_conv_in_surgery():
    """SDXL-inpainting 9ch conv_in expands to 13ch zero-init extra channels
    (reference: train_xl.py:359-373)."""
    cfg9 = UNetConfig.tiny("consume", in_channels=9)
    p9 = init_unet(jax.random.PRNGKey(0), cfg9, dtype=DTYPE)
    sd = export_unet(p9, cfg9)
    cfg13 = UNetConfig.tiny("consume", in_channels=13)
    p13 = convert_unet(sd, cfg13, dtype=DTYPE)
    k = np.asarray(p13["conv_in"]["kernel"])
    assert k.shape[2] == 13
    np.testing.assert_allclose(k[:, :, :9], np.asarray(p9["conv_in"]["kernel"]))
    assert np.all(k[:, :, 9:] == 0)


def test_vae_roundtrip():
    cfg = VAEConfig.tiny()
    p = init_vae(jax.random.PRNGKey(0), cfg, dtype=DTYPE)
    sd = export_vae(p, cfg)
    assert "encoder.mid_block.attentions.0.group_norm.weight" in sd
    assert "decoder.up_blocks.0.resnets.0.conv1.weight" in sd
    _trees_equal(p, convert_vae(sd, cfg, dtype=DTYPE))


def test_clip_text_roundtrip():
    cfg = CLIPTextConfig.tiny(use_final_projection=True)
    p = init_clip_text(jax.random.PRNGKey(0), cfg, dtype=DTYPE)
    sd = export_clip_text(p, cfg)
    assert "text_model.encoder.layers.0.self_attn.q_proj.weight" in sd
    assert "text_projection.weight" in sd
    _trees_equal(p, convert_clip_text(sd, cfg, dtype=DTYPE))


def test_clip_vision_roundtrip():
    cfg = CLIPVisionConfig.tiny()
    p = init_clip_vision(jax.random.PRNGKey(0), cfg, dtype=DTYPE)
    sd = export_clip_vision(p, cfg)
    assert "vision_model.embeddings.patch_embedding.weight" in sd
    _trees_equal(p, convert_clip_vision(sd, cfg, dtype=DTYPE))


def test_resampler_roundtrip():
    cfg = ResamplerConfig.tiny()
    p = init_resampler(jax.random.PRNGKey(0), cfg, dtype=DTYPE)
    sd = export_resampler(p, cfg, prefix="image_proj_model.")
    assert "image_proj_model.layers.0.0.to_kv.weight" in sd
    _trees_equal(p, convert_resampler(sd, cfg, dtype=DTYPE,
                                      prefix="image_proj_model."))


def test_converted_unet_runs():
    cfg = UNetConfig.tiny("emit")
    p = init_unet(jax.random.PRNGKey(0), cfg, dtype=DTYPE)
    p2 = convert_unet(export_unet(p, cfg), cfg, dtype=DTYPE)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4), DTYPE)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 7, cfg.cross_attention_dim), DTYPE)
    _, f1 = unet_apply(p, cfg, x, jnp.int32(3), ctx)
    _, f2 = unet_apply(p2, cfg, x, jnp.int32(3), ctx)
    for a, b in zip(f1, f2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
