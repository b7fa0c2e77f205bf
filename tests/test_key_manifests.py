"""Key-manifest tests: converters must consume the REAL reference state-dict
key sets (names + shapes), without any weights present.

Fixtures in tests/fixtures/manifests/*.json were captured by
scripts/dump_key_manifests.py from the torch model definitions vendored in
/root/reference (openpose model.py, humanparsing AugmentCE2P.py,
ip_adapter/resampler.py) — the same graphs the published checkpoints were
trained with. A misnamed or skipped key in a converter fails here, in CI,
instead of at deployment (VERDICT r1, item 7).
"""

import json
import os

import numpy as np
import pytest

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "manifests")


def _load(name):
    with open(os.path.join(FIXDIR, name + ".json")) as f:
        return json.load(f)


def _zeros_sd(manifest):
    return {k: np.zeros(shape, np.float32) for k, shape in manifest.items()}


def _leaf_count(tree):
    import jax
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(tree))


def _manifest_count(manifest):
    return sum(int(np.prod(s)) if s else 1 for s in manifest.values())


def test_openpose_manifest_consumed():
    man = _load("openpose_body")
    from idmvton_tpu.preprocess.openpose import convert_openpose
    tree = convert_openpose(_zeros_sd(man), strict=True)
    assert _leaf_count(tree) == _manifest_count(man)


@pytest.mark.parametrize("name,classes", [("schp_atr", 18), ("schp_lip", 20)])
def test_schp_manifest_consumed(name, classes):
    man = _load(name)
    from idmvton_tpu.preprocess.schp import convert_schp
    tree = convert_schp(_zeros_sd(man), num_classes=classes, strict=True)
    assert _leaf_count(tree) == _manifest_count(man)


def test_schp_manifest_consumed_with_wrappers():
    # published SCHP ckpts wrap keys as state_dict['module.'+k] and include
    # num_batches_tracked buffers — the converter must strip/ignore both
    man = _load("schp_atr")
    sd = {"module." + k: np.zeros(s, np.float32) for k, s in man.items()}
    sd["module.bn1.num_batches_tracked"] = np.zeros((), np.int64)
    from idmvton_tpu.preprocess.schp import convert_schp
    convert_schp(sd, num_classes=18, strict=True)


def test_resampler_manifest_consumed():
    man = _load("resampler_plus_vith")
    from idmvton_tpu.core.config import ResamplerConfig
    from idmvton_tpu.weights.converter import convert_resampler
    tree = convert_resampler(_zeros_sd(man), ResamplerConfig.sdxl_plus(),
                             strict=True)
    assert _leaf_count(tree) == _manifest_count(man)


def test_misnamed_key_fails():
    man = _load("openpose_body")
    sd = _zeros_sd(man)
    sd["model0.conv_extra.weight"] = np.zeros((3, 3, 3, 3), np.float32)
    from idmvton_tpu.preprocess.openpose import convert_openpose
    with pytest.raises(ValueError, match="unconsumed"):
        convert_openpose(sd, strict=True)


def test_unet_export_matches_own_import_strict():
    """convert_unet(strict=True) over an export_unet state dict: every
    exported key consumed, every schema key present (tiny config)."""
    import jax
    import jax.numpy as jnp
    from idmvton_tpu.core.config import UNetConfig
    from idmvton_tpu.models.unet import init_unet
    from idmvton_tpu.weights.converter import convert_unet, export_unet

    cfg = UNetConfig.tiny()
    params = init_unet(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    sd = export_unet(params, cfg)
    convert_unet(sd, cfg, dtype=jnp.float32, strict=True)


def _manifest_count_no_buffers(manifest):
    return sum(int(np.prod(s)) if s else 1 for k, s in manifest.items()
               if not k.endswith("position_ids"))


def test_clip_l_text_manifest_consumed():
    man = _load("clip_l_text")
    from idmvton_tpu.core.config import CLIPTextConfig
    from idmvton_tpu.weights.converter import convert_clip_text
    tree = convert_clip_text(_zeros_sd(man), CLIPTextConfig.clip_l(),
                             dtype=np.float32, strict=True)
    assert _leaf_count(tree) == _manifest_count_no_buffers(man)


def test_clip_bigg_text_manifest_consumed():
    man = _load("clip_bigg_text")
    from idmvton_tpu.core.config import CLIPTextConfig
    from idmvton_tpu.weights.converter import convert_clip_text
    tree = convert_clip_text(_zeros_sd(man), CLIPTextConfig.clip_bigg(),
                             dtype=np.float32, strict=True)
    assert _leaf_count(tree) == _manifest_count_no_buffers(man)


def test_clip_vith_vision_manifest_consumed():
    man = _load("clip_vith_vision")
    from idmvton_tpu.core.config import CLIPVisionConfig
    from idmvton_tpu.weights.converter import convert_clip_vision
    tree = convert_clip_vision(_zeros_sd(man), CLIPVisionConfig.vit_h(),
                               dtype=np.float32, strict=True)
    assert _leaf_count(tree) == _manifest_count_no_buffers(man)


def test_unet_sdxl_tryon_grammar_manifest():
    """Full-size SDXL tryon UNet grammar manifest (independent transcription,
    scripts/gen_grammar_manifests.py) vs the converter schema: the schema
    consumes exactly the manifest's keys (metadata-only — materializing the
    2.6B-param state dict is too heavy for CI; the value path is covered by
    test_unet_export_matches_own_import_strict on the tiny config)."""
    man = _load("unet_sdxl_tryon")
    from idmvton_tpu.core.config import UNetConfig
    from idmvton_tpu.weights.converter import _unet_schema, schema_keys
    want = schema_keys(_unet_schema(UNetConfig.sdxl_tryon()), man)
    missing = sorted(want - set(man))
    extra = sorted(set(man) - want)
    assert not missing, missing[:8]
    assert not extra, extra[:8]
    # spot shapes at the surgery/fusion-critical sites
    assert man["conv_in.weight"] == [320, 13, 3, 3]
    assert man["mid_block.attentions.0.transformer_blocks.9.ff.net.0.proj"
               ".weight"] == [10240, 1280]
    assert man["down_blocks.1.attentions.0.transformer_blocks.0.attn2"
               ".processor.to_k_ip.weight"] == [640, 2048]
    assert man["up_blocks.0.resnets.2.conv1.weight"] == [1280, 1920, 3, 3]
    assert man["add_embedding.linear_1.weight"] == [1280, 2816]


def test_unet_sdxl_garment_grammar_manifest():
    """GarmentNet consumes the base-SDXL manifest; the runtime-unused tail
    (add_embedding — reference runs unet_encoder without added_cond_kwargs,
    train_xl.py:324-325 — and the final plain up-block + conv_out,
    src/unet_hacked_garmnet.py:1255-1284) is the documented ignore set."""
    man = _load("unet_sdxl_base")
    from idmvton_tpu.core.config import UNetConfig
    from idmvton_tpu.weights.converter import _unet_schema, schema_keys
    want = schema_keys(_unet_schema(UNetConfig.sdxl_garment()), man)
    missing = sorted(want - set(man))
    assert not missing, missing[:8]
    ignored = ("add_embedding.", "up_blocks.2.", "conv_norm_out.",
               "conv_out.")
    extra = sorted(k for k in set(man) - want
                   if not k.startswith(ignored))
    assert not extra, extra[:8]
    assert man["conv_in.weight"] == [320, 4, 3, 3]


def test_vae_sdxl_grammar_manifest():
    man = _load("vae_sdxl")
    from idmvton_tpu.core.config import VAEConfig
    from idmvton_tpu.weights.converter import _vae_schema, schema_keys
    want = schema_keys(_vae_schema(VAEConfig()), man)
    missing = sorted(want - set(man))
    extra = sorted(set(man) - want)
    assert not missing, missing[:8]
    assert not extra, extra[:8]
    assert man["decoder.up_blocks.3.resnets.0.conv1.weight"] == [128, 256, 3, 3]


def test_densepose_manifest_consumed():
    """R50-FPN DensePose grammar manifest (decoder on — DECODER_ON defaults
    True, densepose/config.py:191) vs convert_densepose strict."""
    man = _load("densepose_r50fpn")
    from idmvton_tpu.preprocess.densepose.convert import convert_densepose
    tree = convert_densepose(_zeros_sd(man), strict=True)
    # decoder present and correctly shaped
    assert len(tree["decoder"]["scale_heads"]) == 4
    assert [len(h) for h in tree["decoder"]["scale_heads"]] == [1, 1, 2, 3]


def test_densepose_decoder_forward_shapes():
    import jax
    import jax.numpy as jnp
    from idmvton_tpu.preprocess.densepose.rcnn import (
        DensePoseConfig, init_densepose_rcnn, _decoder_apply)
    cfg = DensePoseConfig()
    params = init_densepose_rcnn(jax.random.PRNGKey(0), cfg)
    ps = [jnp.zeros((1, 64 // 2 ** i, 48 // 2 ** i, 256), jnp.float32)
          for i in range(4)]
    out = _decoder_apply(params, ps, cfg)
    assert out.shape == (1, 64, 48, 256)
