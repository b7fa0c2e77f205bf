"""Dump state-dict *key manifests* (names + shapes only, no weights) for the
reference model zoo, as CI fixtures for the weight converters.

VERDICT r1 item 7: converters were only round-trip-tested against their own
exports; a misnamed key would surface only at deployment. These manifests are
captured from the actual torch model definitions vendored in /root/reference
(instantiated on CPU, no checkpoints needed):

- openpose  : preprocess/openpose/annotator/openpose/model.py bodypose_model
- schp_atr  : preprocess/humanparsing/networks/AugmentCE2P.py resnet101(18)
- schp_lip  : same, num_classes=20 (published SCHP ckpts wrap them in
              {'state_dict': {'module.'+k: v}} — the manifest records the
              bare module keys; convert_schp strips the wrappers)
- resampler : ip_adapter/resampler.py Resampler with the exact config used by
              src/unet_hacked_tryon.py:476-485 (dim=1280, depth=4, dim_head=64,
              heads=20, num_queries=16, embedding_dim=1280 [ViT-H hidden],
              output_dim=2048, ff_mult=4)

Usage: PYTHONPATH=/root/repo python scripts/dump_key_manifests.py
Writes tests/fixtures/manifests/<name>.json  {key: [dims...]}.

The InPlaceABNSync modules (humanparsing/modules) ship a CUDA extension; for
shape capture we stub them with a param-compatible BatchNorm surrogate
(weight/bias/running_mean/running_var — modules/bn.py:45-51).
"""

import json
import os
import sys
import types

import torch
import torch.nn as nn

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "manifests")


def manifest(module: nn.Module) -> dict:
    return {k: list(v.shape) for k, v in module.state_dict().items()
            if not k.endswith("num_batches_tracked")}


def dump(name: str, m: dict) -> None:
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, name + ".json")
    with open(path, "w") as f:
        json.dump(m, f, indent=0, sort_keys=True)
    print(f"{name}: {len(m)} keys -> {path}")


def _stub_module(name, **attrs):
    m = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _import_file(name, path):
    import importlib.util
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def dump_openpose():
    # import model.py directly (its package __init__ drags in torchvision /
    # skimage runtime deps the manifest doesn't need)
    mod = _import_file("op_model", os.path.join(
        REF, "preprocess/openpose/annotator/openpose/model.py"))
    bodypose_model = mod.bodypose_model
    dump("openpose_body", manifest(bodypose_model()))


class _ABNStub(nn.Module):
    """Param-compatible stand-in for InPlaceABNSync (modules/bn.py:45-51)."""

    def __init__(self, num_features, **kw):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(num_features))
        self.bias = nn.Parameter(torch.zeros(num_features))
        self.register_buffer("running_mean", torch.zeros(num_features))
        self.register_buffer("running_var", torch.ones(num_features))

    def forward(self, x):
        return x


def dump_schp():
    stub = types.ModuleType("modules")
    stub.InPlaceABNSync = _ABNStub
    stub.InPlaceABN = _ABNStub
    sys.modules["modules"] = stub
    sys.path.insert(0, os.path.join(REF, "preprocess/humanparsing"))
    from networks.AugmentCE2P import resnet101
    # pretrained=None skips the imagenet-url load (AugmentCE2P.py:384-390)
    dump("schp_atr", manifest(resnet101(num_classes=18, pretrained=None)))
    dump("schp_lip", manifest(resnet101(num_classes=20, pretrained=None)))


def dump_resampler():
    Resampler = _import_file(
        "ref_resampler", os.path.join(REF, "ip_adapter/resampler.py")
    ).Resampler
    m = Resampler(dim=1280, depth=4, dim_head=64, heads=20, num_queries=16,
                  embedding_dim=1280, output_dim=2048, ff_mult=4)
    dump("resampler_plus_vith", manifest(m))


def dump_clip():
    """CLIP tower manifests straight from HF transformers (installed) with
    the SDXL / IDM-VTON configs: text_encoder = CLIP-L (CLIPTextModel),
    text_encoder_2 = OpenCLIP bigG (CLIPTextModelWithProjection,
    inference.py:232-274 model zoo), image_encoder = ViT-H
    (CLIPVisionModelWithProjection, ckpt/image_encoder/config.json)."""
    import transformers

    l_cfg = transformers.CLIPTextConfig(
        vocab_size=49408, hidden_size=768, intermediate_size=3072,
        num_hidden_layers=12, num_attention_heads=12,
        max_position_embeddings=77, hidden_act="quick_gelu",
        projection_dim=768)
    dump("clip_l_text", manifest(transformers.CLIPTextModel(l_cfg)))

    g_cfg = transformers.CLIPTextConfig(
        vocab_size=49408, hidden_size=1280, intermediate_size=5120,
        num_hidden_layers=32, num_attention_heads=20,
        max_position_embeddings=77, hidden_act="gelu",
        projection_dim=1280)
    dump("clip_bigg_text",
         manifest(transformers.CLIPTextModelWithProjection(g_cfg)))

    v_cfg = transformers.CLIPVisionConfig(
        hidden_size=1280, intermediate_size=5120, num_hidden_layers=32,
        num_attention_heads=16, image_size=224, patch_size=14,
        hidden_act="gelu", projection_dim=1024)
    dump("clip_vith_vision",
         manifest(transformers.CLIPVisionModelWithProjection(v_cfg)))


if __name__ == "__main__":
    dump_openpose()
    dump_schp()
    dump_resampler()
    dump_clip()
