"""Shape/dtype/consistency unit tests for the model zoo on tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idmvton_tpu.core.config import (
    UNetConfig, VAEConfig, CLIPTextConfig, CLIPVisionConfig, ResamplerConfig,
)
from idmvton_tpu.models.unet import init_unet, unet_apply
from idmvton_tpu.models.vae import init_vae, vae_encode, vae_decode
from idmvton_tpu.models.clip import (
    init_clip_text, clip_text_apply, init_clip_vision, clip_vision_apply,
)
from idmvton_tpu.models.resampler import init_resampler, resampler_apply

KEY = jax.random.PRNGKey(0)
DTYPE = jnp.float32


def test_unet_config_feature_count():
    assert UNetConfig.sdxl_tryon().num_garment_features == 70
    assert UNetConfig.sdxl_garment().num_garment_features == 70
    tiny_e = UNetConfig.tiny("emit")
    tiny_c = UNetConfig.tiny("consume")
    assert tiny_e.num_garment_features == tiny_c.num_garment_features


def test_garment_emit_consume_roundtrip():
    """GarmentNet emits features; TryonNet consumes them — shapes must line up
    in execution order (the invariant the reference maintains via a mutable
    index, src/unet_hacked_tryon.py:1254)."""
    cfg_e = UNetConfig.tiny("emit")
    cfg_c = UNetConfig.tiny("consume")
    p_e = init_unet(jax.random.PRNGKey(1), cfg_e, dtype=DTYPE)
    p_c = init_unet(jax.random.PRNGKey(2), cfg_c, dtype=DTYPE)

    b, h, w = 2, 16, 16
    garm_lat = jax.random.normal(jax.random.PRNGKey(3), (b, h, w, 4), DTYPE)
    ctx_g = jax.random.normal(jax.random.PRNGKey(4), (b, 7, cfg_e.cross_attention_dim), DTYPE)
    out, feats = unet_apply(p_e, cfg_e, garm_lat, jnp.int32(10), ctx_g)
    assert out is None
    assert len(feats) == cfg_e.num_garment_features
    # feature seq lens must be spatial token counts at the attn levels
    toks = {f.shape[1] for f in feats}
    assert toks == {(h // 2) * (w // 2), (h // 4) * (w // 4)}

    x = jax.random.normal(jax.random.PRNGKey(5), (b, h, w, 13), DTYPE)
    ctx = jax.random.normal(
        jax.random.PRNGKey(6), (b, 7 + cfg_c.ip_num_tokens, cfg_c.cross_attention_dim), DTYPE)
    pooled = jax.random.normal(jax.random.PRNGKey(7), (b, 64), DTYPE)
    time_ids = jnp.ones((b, 6), DTYPE)
    pred, _ = unet_apply(p_c, cfg_c, x, jnp.int32(10), ctx,
                         added_cond=(pooled, time_ids), garment_features=feats)
    assert pred.shape == (b, h, w, 4)
    assert jnp.isfinite(pred).all()


def test_unet_remat_matches():
    cfg = UNetConfig.tiny("none", in_channels=4, ip_adapter=False)
    p = init_unet(jax.random.PRNGKey(1), cfg, dtype=DTYPE)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 4), DTYPE)
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 7, cfg.cross_attention_dim), DTYPE)
    pooled = jnp.zeros((1, 64), DTYPE)
    tid = jnp.ones((1, 6), DTYPE)
    a, _ = unet_apply(p, cfg, x, jnp.int32(500), ctx, added_cond=(pooled, tid))
    b_, _ = unet_apply(p, cfg, x, jnp.int32(500), ctx, added_cond=(pooled, tid),
                       remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_vae_roundtrip_shapes():
    cfg = VAEConfig.tiny()
    p = init_vae(jax.random.PRNGKey(0), cfg, dtype=DTYPE)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3), DTYPE)
    z = vae_encode(p, cfg, x, rng=jax.random.PRNGKey(2))
    assert z.shape == (1, 8, 8, 4)
    y = vae_decode(p, cfg, z)
    assert y.shape == x.shape
    assert jnp.isfinite(y).all()
    # deterministic encode == mode
    z1 = vae_encode(p, cfg, x, sample=False)
    z2 = vae_encode(p, cfg, x, sample=False)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))


def test_clip_text_shapes_and_pooling():
    cfg = CLIPTextConfig.tiny(use_final_projection=True)
    p = init_clip_text(jax.random.PRNGKey(0), cfg, dtype=DTYPE)
    ids = jnp.array([[5, 9, 999, 3, 0, 0, 0]], jnp.int32)  # eos=999 at pos 2
    out = clip_text_apply(p, cfg, ids)
    assert out["penultimate"].shape == (1, 7, cfg.hidden_size)
    assert out["pooled"].shape == (1, cfg.projection_dim)
    # causality: changing a later token must not affect earlier positions
    ids2 = ids.at[0, 3].set(7)
    out2 = clip_text_apply(p, cfg, ids2)
    np.testing.assert_allclose(np.asarray(out["penultimate"][0, :3]),
                               np.asarray(out2["penultimate"][0, :3]),
                               atol=1e-5)


def test_clip_vision_shapes():
    cfg = CLIPVisionConfig.tiny()
    p = init_clip_vision(jax.random.PRNGKey(0), cfg, dtype=DTYPE)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 3), DTYPE)
    out = clip_vision_apply(p, cfg, x)
    assert out["penultimate"].shape == (2, 1 + 4, cfg.hidden_size)
    assert out["image_embeds"].shape == (2, cfg.projection_dim)


def test_resampler_shapes():
    cfg = ResamplerConfig.tiny()
    p = init_resampler(jax.random.PRNGKey(0), cfg, dtype=DTYPE)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, cfg.embedding_dim), DTYPE)
    out = resampler_apply(p, cfg, x)
    assert out.shape == (2, cfg.num_queries, cfg.output_dim)
    assert jnp.isfinite(out).all()


def test_vae_decode_bf16_close_to_fp32():
    """bf16-native decode (TPU default) vs force_upcast fp32: pixel delta
    well under the uint8 quantization step (VAEConfig.force_upcast note)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from idmvton_tpu.core.config import VAEConfig
    from idmvton_tpu.models.vae import init_vae, vae_decode

    cfg = VAEConfig.tiny()
    params = init_vae(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, cfg.latent_channels),
                          jnp.bfloat16)
    lo = vae_decode(params, dataclasses.replace(cfg, force_upcast=False), z)
    hi = vae_decode(params, dataclasses.replace(cfg, force_upcast=True),
                    z.astype(jnp.float32))
    diff = np.abs(np.asarray(lo, np.float32) - np.asarray(hi, np.float32))
    assert diff.max() < 1.0 / 16, diff.max()
