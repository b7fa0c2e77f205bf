"""Executable-reference parity: run the PyTorch reference (file-direct
imports from /root/reference) as the ORACLE against the JAX rebuild.

Round-2 verdict: key-shape manifests + hand transcriptions cannot catch a
transposed weight or a wrong eps. These tests construct the reference
modules with RANDOM weights, push them through the real converters, and
compare numerics — so any layout/eps/activation mistake fails CI.

Oracles exercised (all imports dodge broken package __init__s via
file-direct importlib loads, stubbing only modules the tested code paths
never touch):
- gradio_demo/utils_mask.py:54 get_mask_location        (bit-exact)
- preprocess/openpose/annotator/openpose/model.py:24    (numeric, random w)
- preprocess/openpose/annotator/openpose/body.py:29     (decode, stub CNN)
- ip_adapter/resampler.py:129 Resampler                 (numeric, random w)
- transformers CLIP text/vision towers                  (numeric, random w)
- preprocess/humanparsing/parsing_api.py:109-179        (bit-exact postproc)
"""

import importlib
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available")

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# loaders
# ---------------------------------------------------------------------------


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    # a real __spec__ so importlib.util.find_spec on the stub doesn't raise
    # (transformers probes torchvision availability that way)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def load_ref_file(relpath, name, stubs=()):
    """Import a single reference file, bypassing its package __init__."""
    for s in stubs:
        sys.modules.setdefault(s.__name__, s)
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_mask():
    return load_ref_file("gradio_demo/utils_mask.py", "ref_utils_mask")


@pytest.fixture(scope="module")
def ref_openpose_pkg():
    """The openpose annotator as a real package so body.py's relative
    imports resolve; torchvision (unused by the body path) is stubbed."""
    sys.modules.setdefault(
        "torchvision", _stub_module("torchvision", transforms=None))
    pkg = types.ModuleType("ref_openpose")
    pkg.__path__ = [os.path.join(REF, "preprocess/openpose/annotator/openpose")]
    sys.modules["ref_openpose"] = pkg
    model = importlib.import_module("ref_openpose.model")
    body = importlib.import_module("ref_openpose.body")
    util = importlib.import_module("ref_openpose.util")
    return types.SimpleNamespace(model=model, body=body, util=util)


@pytest.fixture(scope="module")
def ref_parsing():
    """parsing_api.py with stubs for the dataset/transform imports its
    postproc functions (hole_fill/refine_hole, :109-128) never touch."""
    stubs = (
        _stub_module("torchvision", transforms=None),
        _stub_module("torchvision.transforms", Compose=None, ToTensor=None,
                     Normalize=None),
        _stub_module("datasets"),
        _stub_module("datasets.simple_extractor_dataset",
                     SimpleFolderDataset=None),
        _stub_module("utils"),
        _stub_module("utils.transforms", transform_logits=None),
    )
    try:
        return load_ref_file("preprocess/humanparsing/parsing_api.py",
                             "ref_parsing_api", stubs=stubs)
    finally:
        # don't shadow real top-level modules for later tests
        for name in ("datasets", "datasets.simple_extractor_dataset",
                     "utils", "utils.transforms"):
            if isinstance(sys.modules.get(name), types.ModuleType) and \
                    not getattr(sys.modules[name], "__file__", None):
                del sys.modules[name]


def torch_sd_to_np(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# 1. agnostic mask: bit-exact vs gradio_demo/utils_mask.py:54
# ---------------------------------------------------------------------------


def _random_parse(rng, width=384, height=512, n_blobs=14):
    """Random rectangles of random labels 0..18 — adversarial layouts."""
    p = np.zeros((height, width), np.uint8)
    for _ in range(n_blobs):
        lbl = rng.integers(1, 19)
        x0, y0 = rng.integers(0, width - 20), rng.integers(0, height - 20)
        w, h = rng.integers(10, 150), rng.integers(10, 200)
        p[y0:y0 + h, x0:x0 + w] = lbl
    return p


def _random_keypoints(rng):
    kp = rng.uniform(5, 370, size=(18, 2)).astype(np.float32)
    kp[:, 1] = rng.uniform(5, 500, size=18)
    return {"pose_keypoints_2d": kp.reshape(-1).tolist()}


@pytest.mark.parametrize("model_type,category", [
    ("hd", "upper_body"), ("dc", "upper_body"),
    ("dc", "lower_body"), ("dc", "dresses"),
])
def test_mask_location_bitexact(ref_mask, model_type, category):
    from PIL import Image
    from idmvton_tpu.preprocess.agnostic_mask import get_mask_location

    rng = np.random.default_rng(hash((model_type, category)) % 2**32)
    for trial in range(4):
        parse = _random_parse(rng)
        kp = _random_keypoints(rng)
        if trial == 1:  # undetected wrists branch (utils_mask.py:128,135)
            k = np.asarray(kp["pose_keypoints_2d"]).reshape(-1, 2)
            k[4] = k[7] = [0.5, 0.5]
            kp = {"pose_keypoints_2d": k.reshape(-1).tolist()}
        pil = Image.fromarray(parse)
        want_mask, want_gray = ref_mask.get_mask_location(
            model_type, category, pil, kp)
        got_mask, got_gray = get_mask_location(model_type, category, pil, kp)
        np.testing.assert_array_equal(np.asarray(got_mask),
                                      np.asarray(want_mask),
                                      err_msg=f"mask trial {trial}")
        np.testing.assert_array_equal(np.asarray(got_gray),
                                      np.asarray(want_gray),
                                      err_msg=f"gray trial {trial}")


# ---------------------------------------------------------------------------
# 2. OpenPose CNN: numeric parity on random converted weights
# ---------------------------------------------------------------------------


def test_openpose_cnn_numeric_parity(ref_openpose_pkg):
    import jax.numpy as jnp
    from idmvton_tpu.preprocess.openpose import convert_openpose, openpose_apply

    torch.manual_seed(0)
    net = ref_openpose_pkg.model.bodypose_model().eval()
    params = convert_openpose(torch_sd_to_np(net), dtype=jnp.float32,
                              strict=True)

    x = np.random.default_rng(1).uniform(-0.5, 0.5, (1, 3, 64, 48)).astype(
        np.float32)
    with torch.no_grad():
        ref_paf, ref_heat = net(torch.from_numpy(x))
    paf, heat = openpose_apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(paf),
                               ref_paf.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(heat),
                               ref_heat.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# 3. OpenPose decode: vs body.py:29 __call__ with a stubbed CNN
# ---------------------------------------------------------------------------


def _synthetic_pose_maps(h8, w8):
    """Stride-8 heatmap/PAF for one clean synthetic person: gaussian blobs
    at known joints, coherent unit-vector PAFs along each limb."""
    from idmvton_tpu.preprocess import openpose as op

    joints = {  # part (1-based like _LIMB_SEQ) -> (x, y) at stride-8 scale
        1: (11, 4), 2: (11, 6), 3: (8, 6), 4: (7, 10), 5: (6, 14),
        6: (14, 6), 7: (15, 10), 8: (16, 14), 9: (9, 13), 10: (9, 17),
        11: (9, 21), 12: (13, 13), 13: (13, 17), 14: (13, 21),
        15: (10, 3), 16: (12, 3), 17: (9, 4), 18: (13, 4),
    }
    yy, xx = np.mgrid[0:h8, 0:w8].astype(np.float32)
    heat = np.zeros((h8, w8, 19), np.float32)
    for part, (jx, jy) in joints.items():
        # fractional centers: the 8x-upsampled argmax is then unique (integer
        # centers land exactly between output pixels -> plateau ties whose
        # resolution is interpolation-noise, not decoder behavior)
        cx, cy = jx + 0.23, jy - 0.17
        heat[:, :, part - 1] = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / 3.0)
    paf = np.zeros((h8, w8, 38), np.float32)
    for limb_i, (pa, pb) in enumerate(op._LIMB_SEQ):
        ca, cb = op._PAF_IDX[limb_i]
        ax, ay = joints[pa]
        bx, by = joints[pb]
        v = np.asarray([bx - ax, by - ay], np.float32)
        v /= max(np.linalg.norm(v), 1e-6)
        # a tube of width ~1.5 around the limb segment
        t = np.clip(((xx - ax) * (bx - ax) + (yy - ay) * (by - ay))
                    / max((bx - ax) ** 2 + (by - ay) ** 2, 1e-6), 0, 1)
        px, py = ax + t * (bx - ax), ay + t * (by - ay)
        d2 = (xx - px) ** 2 + (yy - py) ** 2
        tube = (d2 < 2.25).astype(np.float32)
        paf[:, :, ca - 19] += tube * v[0]
        paf[:, :, cb - 19] += tube * v[1]
    return heat, paf


def test_openpose_decode_parity(ref_openpose_pkg):
    from idmvton_tpu.preprocess.openpose import (
        find_peaks, match_limbs, assemble_people)

    h, w = 184, 184  # scale = 0.5*368/184 = 1.0: no image resize in body.py
    h8, w8 = h // 8, w // 8
    heat8, paf8 = _synthetic_pose_maps(h8, w8)

    class _StubNet:
        def __call__(self, data):
            return (torch.from_numpy(paf8.transpose(2, 0, 1)[None]),
                    torch.from_numpy(heat8.transpose(2, 0, 1)[None]))

    body = ref_openpose_pkg.body.Body.__new__(ref_openpose_pkg.body.Body)
    body.model = _StubNet()
    ori = np.full((h, w, 3), 128, np.uint8)
    ref_candidate, ref_subset = body(ori)

    # my decoder consumes image-resolution maps; produce them with the
    # reference's own resize chain (body.py:60-68) so ONLY the decode differs
    util = ref_openpose_pkg.util
    heat = util.smart_resize(util.smart_resize_k(heat8, fx=8, fy=8), (h, w))
    paf = util.smart_resize(util.smart_resize_k(paf8, fx=8, fy=8), (h, w))
    peaks = find_peaks(heat)
    conns = match_limbs(paf, peaks, img_h=h)
    subset, candidate = assemble_people(peaks, conns)

    np.testing.assert_allclose(candidate, ref_candidate, atol=1e-5)
    assert subset.shape == ref_subset.shape
    order = np.argsort(subset[:, -2])
    ref_order = np.argsort(ref_subset[:, -2])
    np.testing.assert_allclose(subset[order], ref_subset[ref_order], atol=1e-4)
    # the synthetic person is fully assembled
    assert subset.shape[0] == 1 and int(subset[0, -1]) == 18


# ---------------------------------------------------------------------------
# 4. Resampler: numeric parity vs ip_adapter/resampler.py:129
# ---------------------------------------------------------------------------


def test_resampler_numeric_parity():
    import jax.numpy as jnp
    from idmvton_tpu.core.config import ResamplerConfig
    from idmvton_tpu.models.resampler import resampler_apply
    from idmvton_tpu.weights.converter import convert_resampler

    rs = load_ref_file("ip_adapter/resampler.py", "ref_resampler")
    cfg = ResamplerConfig.tiny()
    torch.manual_seed(0)
    net = rs.Resampler(dim=cfg.dim, depth=cfg.depth, dim_head=cfg.dim_head,
                       heads=cfg.heads, num_queries=cfg.num_queries,
                       embedding_dim=cfg.embedding_dim,
                       output_dim=cfg.output_dim, ff_mult=cfg.ff_mult).eval()
    params = convert_resampler(torch_sd_to_np(net), cfg, dtype=jnp.float32,
                               strict=True)

    x = np.random.default_rng(2).normal(size=(2, 9, cfg.embedding_dim)
                                        ).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()
    got = np.asarray(resampler_apply(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# 5. CLIP towers: numeric parity vs transformers (random weights)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("act,project", [("quick_gelu", False),
                                         ("gelu", True)])
def test_clip_text_parity_vs_transformers(act, project):
    import jax.numpy as jnp
    tr = pytest.importorskip("transformers")
    from idmvton_tpu.core.config import CLIPTextConfig
    from idmvton_tpu.models.clip import clip_text_apply
    from idmvton_tpu.weights.converter import convert_clip_text

    cfg = CLIPTextConfig.tiny(hidden_act=act, use_final_projection=project)
    hf_cfg = tr.CLIPTextConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        projection_dim=cfg.projection_dim, hidden_act=act,
        eos_token_id=cfg.vocab_size - 1, bos_token_id=cfg.vocab_size - 2)
    torch.manual_seed(0)
    cls = tr.CLIPTextModelWithProjection if project else tr.CLIPTextModel
    net = cls(hf_cfg).eval()
    params = convert_clip_text(torch_sd_to_np(net), cfg, dtype=jnp.float32,
                               strict=True)

    rng = np.random.default_rng(3)
    ids = rng.integers(0, cfg.vocab_size - 2, size=(2, 77))
    ids[0, 9] = ids[1, 30] = cfg.vocab_size - 1  # eos = max id, once per row
    with torch.no_grad():
        out = net(torch.from_numpy(ids), output_hidden_states=True)
    got = clip_text_apply(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got["penultimate"]),
                               out.hidden_states[-2].numpy(),
                               atol=1e-4, rtol=1e-3)
    if project:
        np.testing.assert_allclose(np.asarray(got["pooled"]),
                                   out.text_embeds.numpy(),
                                   atol=1e-4, rtol=1e-3)


def test_clip_vision_parity_vs_transformers():
    import jax.numpy as jnp
    tr = pytest.importorskip("transformers")
    from idmvton_tpu.core.config import CLIPVisionConfig
    from idmvton_tpu.models.clip import clip_vision_apply
    from idmvton_tpu.weights.converter import convert_clip_vision

    cfg = CLIPVisionConfig.tiny()
    hf_cfg = tr.CLIPVisionConfig(
        hidden_size=cfg.hidden_size, intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        projection_dim=cfg.projection_dim, hidden_act=cfg.hidden_act)
    torch.manual_seed(0)
    net = tr.CLIPVisionModelWithProjection(hf_cfg).eval()
    params = convert_clip_vision(torch_sd_to_np(net), cfg, dtype=jnp.float32,
                                 strict=True)

    px = np.random.default_rng(4).normal(
        size=(2, 3, cfg.image_size, cfg.image_size)).astype(np.float32)
    with torch.no_grad():
        out = net(torch.from_numpy(px), output_hidden_states=True)
    got = clip_vision_apply(params, cfg, jnp.asarray(px.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got["penultimate"]),
                               out.hidden_states[-2].numpy(),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got["image_embeds"]),
                               out.image_embeds.numpy(),
                               atol=1e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# 6. SCHP postproc: bit-exact vs parsing_api.py:109-179
# ---------------------------------------------------------------------------


def _ref_refine_cloth(api, parsing):
    """The reference composition at parsing_api.py:142-156, using the
    reference's OWN hole_fill/refine_hole as the oracle."""
    pr = np.pad(parsing, pad_width=1, mode="constant", constant_values=0)
    arm_mask = ((pr == 14).astype(np.float32)
                + (pr == 15).astype(np.float32))
    upper_cloth_mask = (pr == 4).astype(np.float32) + arm_mask
    img = np.where(upper_cloth_mask, 255, 0)
    dst = api.hole_fill(img.astype(np.uint8))
    filled = dst / 255 * 4
    woarm = np.where(filled == 4, filled, pr)
    refine_hole_mask = api.refine_hole(filled.astype(np.uint8),
                                       pr.astype(np.uint8),
                                       arm_mask.astype(np.uint8))
    return np.where(refine_hole_mask, pr, woarm)[1:-1, 1:-1]


def test_schp_postproc_bitexact(ref_parsing):
    from idmvton_tpu.preprocess.schp import refine_cloth, add_neck

    rng = np.random.default_rng(5)
    for trial in range(4):
        parsing = _random_parse(rng, width=256, height=256, n_blobs=18)
        # ensure cloth-with-hole and arm structures exist
        parsing[40:120, 40:160] = 4
        parsing[60:100, 80:120] = 0        # a >2000 px hole in the cloth
        parsing[40:200, 20:40] = 14
        parsing[40:200, 160:180] = 15
        parsing[130:150, 100:110] = 0      # a small hole (gets filled)
        want = _ref_refine_cloth(ref_parsing, parsing.astype(np.int64))
        got = refine_cloth(parsing.astype(np.int64))
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")

        lip = _random_parse(rng, width=256, height=256, n_blobs=8)
        # neck = ATR 11 minus LIP 13 (parsing_api.py:176-179)
        neck_want = np.where(
            np.logical_and(np.logical_not((lip == 13).astype(np.float32)),
                           (want == 11).astype(np.float32)), 18, want)
        np.testing.assert_array_equal(add_neck(want, lip), neck_want)


# ---------------------------------------------------------------------------
# 7. Core mechanism: executed-reference BasicTransformerBlock (tryon/garmnet)
#    + IPAttnProcessor2_0 via the diffusers shim (tests/_diffusers_shim.py)
#
# Oracles: src/attentionhacked_tryon.py:334-348 (garment KV concat + slice),
# src/attentionhacked_garmnet.py:321-322 (pre-attn feature capture),
# ip_adapter/attention_processor.py:1907-2010 (decoupled IP cross-attn).
# ---------------------------------------------------------------------------


DIM, HEADS, HEAD_DIM, CTX_DIM, IP_TOKENS = 64, 4, 16, 96, 4


@pytest.fixture(scope="module")
def ref_attention_mods():
    import _diffusers_shim
    _diffusers_shim.install()
    tryon = load_ref_file("src/attentionhacked_tryon.py", "ref_attn_tryon")
    garm = load_ref_file("src/attentionhacked_garmnet.py", "ref_attn_garmnet")
    ip = load_ref_file("ip_adapter/attention_processor.py", "ref_ip_attnproc")
    return types.SimpleNamespace(tryon=tryon, garm=garm, ip=ip)


def _randomize(module, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)
    return module.eval()


def _lin_t(mod):
    return np.asarray(mod.weight.detach().numpy().T)


def _norm_np(mod):
    return {"scale": mod.weight.detach().numpy(),
            "bias": mod.bias.detach().numpy()}


def _block_params_from_torch(blk, ip_proc=None):
    """Map a reference BasicTransformerBlock state into our fused param tree
    (same split/concat the production converter applies,
    weights/converter.py::_unet_schema)."""
    import jax.numpy as jnp
    a1, a2 = blk.attn1, blk.attn2
    p = {
        "norm1": _norm_np(blk.norm1),
        "attn1": {
            "to_qkv": {"kernel": np.concatenate(
                [_lin_t(a1.to_q), _lin_t(a1.to_k), _lin_t(a1.to_v)], axis=1)},
            "to_out": {"kernel": _lin_t(a1.to_out[0]),
                       "bias": a1.to_out[0].bias.detach().numpy()},
        },
        "norm2": _norm_np(blk.norm2),
        "attn2": {
            "to_q": {"kernel": _lin_t(a2.to_q)},
            "to_kv": {"kernel": np.concatenate(
                [_lin_t(a2.to_k), _lin_t(a2.to_v)], axis=1)},
            "to_out": {"kernel": _lin_t(a2.to_out[0]),
                       "bias": a2.to_out[0].bias.detach().numpy()},
        },
        "norm3": _norm_np(blk.norm3),
        "ff": {
            "proj_in": {"kernel": _lin_t(blk.ff.net[0].proj),
                        "bias": blk.ff.net[0].proj.bias.detach().numpy()},
            "proj_out": {"kernel": _lin_t(blk.ff.net[2]),
                         "bias": blk.ff.net[2].bias.detach().numpy()},
        },
    }
    if ip_proc is not None:
        p["attn2"]["to_kv_ip"] = {"kernel": np.concatenate(
            [_lin_t(ip_proc.to_k_ip), _lin_t(ip_proc.to_v_ip)], axis=1)}
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), p)


import jax  # noqa: E402  (used by the tree_map above)


def _block_inputs(seed, batch=2, n=33, m=17):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(batch, n, DIM)).astype(np.float32)
    ctx = rng.normal(size=(batch, 7, CTX_DIM)).astype(np.float32)
    g = rng.normal(size=(batch, m, DIM)).astype(np.float32)
    return x, ctx, g


def test_garmnet_block_parity(ref_attention_mods):
    """Emit mode: output AND the captured garment feature match the executed
    reference block (attentionhacked_garmnet.py:321-322, :406)."""
    import jax.numpy as jnp
    from idmvton_tpu.models.attention import transformer_block

    blk = _randomize(ref_attention_mods.garm.BasicTransformerBlock(
        DIM, HEADS, HEAD_DIM, cross_attention_dim=CTX_DIM), seed=11)
    params = _block_params_from_torch(blk)
    x, ctx, _ = _block_inputs(21)

    with torch.no_grad():
        want, feats = blk(torch.from_numpy(x),
                          encoder_hidden_states=torch.from_numpy(ctx))
    got, emitted = transformer_block(params, jnp.asarray(x), jnp.asarray(ctx),
                                     heads=HEADS, garment_mode="emit",
                                     impl="xla")
    assert len(feats) == 1
    np.testing.assert_allclose(np.asarray(emitted), feats[0].numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               atol=5e-5, rtol=1e-4)


def test_tryon_block_parity(ref_attention_mods):
    """Consume mode: our Q(N)xKV(N+M) reformulation matches the executed
    reference concat->attn->slice (attentionhacked_tryon.py:334-348)."""
    import jax.numpy as jnp
    from idmvton_tpu.models.attention import transformer_block

    blk = _randomize(ref_attention_mods.tryon.BasicTransformerBlock(
        DIM, HEADS, HEAD_DIM, cross_attention_dim=CTX_DIM), seed=12)
    params = _block_params_from_torch(blk)
    x, ctx, g = _block_inputs(22)

    with torch.no_grad():
        want, idx = blk(torch.from_numpy(x),
                        encoder_hidden_states=torch.from_numpy(ctx),
                        garment_features=[torch.from_numpy(g)],
                        curr_garment_feat_idx=0)
    assert idx == 1  # the reference's mutable cursor advanced one feature
    got, emitted = transformer_block(params, jnp.asarray(x), jnp.asarray(ctx),
                                     heads=HEADS, garment_mode="consume",
                                     garment_feat=jnp.asarray(g), impl="xla")
    assert emitted is None
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               atol=5e-5, rtol=1e-4)


def test_ip_attn_processor_parity(ref_attention_mods):
    """Decoupled IP cross-attention vs the executed IPAttnProcessor2_0
    (ip_adapter/attention_processor.py:1907-2010): two softmaxes summed with
    the ip scale, NOT one softmax over the concatenated context."""
    import jax.numpy as jnp
    from idmvton_tpu.models.attention import cross_attention

    shim = sys.modules["diffusers.models.attention_processor"]
    attn = shim.Attention(query_dim=DIM, cross_attention_dim=CTX_DIM,
                          heads=HEADS, dim_head=HEAD_DIM)
    proc = ref_attention_mods.ip.IPAttnProcessor2_0(
        hidden_size=DIM, cross_attention_dim=CTX_DIM, scale=0.625,
        num_tokens=IP_TOKENS)
    _randomize(attn, seed=13)
    _randomize(proc, seed=14)
    attn.set_processor(proc)

    rng = np.random.default_rng(23)
    x = rng.normal(size=(2, 33, DIM)).astype(np.float32)
    ctx = rng.normal(size=(2, 7 + IP_TOKENS, CTX_DIM)).astype(np.float32)
    with torch.no_grad():
        want = attn(torch.from_numpy(x),
                    encoder_hidden_states=torch.from_numpy(ctx)).numpy()

    params = {
        "to_q": {"kernel": jnp.asarray(_lin_t(attn.to_q), jnp.float32)},
        "to_kv": {"kernel": jnp.asarray(np.concatenate(
            [_lin_t(attn.to_k), _lin_t(attn.to_v)], axis=1), jnp.float32)},
        "to_kv_ip": {"kernel": jnp.asarray(np.concatenate(
            [_lin_t(proc.to_k_ip), _lin_t(proc.to_v_ip)], axis=1), jnp.float32)},
        "to_out": {"kernel": jnp.asarray(_lin_t(attn.to_out[0]), jnp.float32),
                   "bias": jnp.asarray(attn.to_out[0].bias.detach().numpy(),
                                       jnp.float32)},
    }
    got = cross_attention(params, jnp.asarray(x), jnp.asarray(ctx),
                          heads=HEADS, ip_num_tokens=IP_TOKENS,
                          ip_scale=0.625, impl="xla")
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5, rtol=1e-4)


def test_tryon_block_with_ip_parity(ref_attention_mods):
    """Full hot path in one oracle: garment-concat self-attn + decoupled IP
    cross-attn + GEGLU FF, executed end-to-end through the reference block
    with IPAttnProcessor2_0 installed on attn2 (the production wiring,
    src/unet_hacked_tryon.py + ip_adapter)."""
    import jax.numpy as jnp
    from idmvton_tpu.models.attention import transformer_block

    blk = _randomize(ref_attention_mods.tryon.BasicTransformerBlock(
        DIM, HEADS, HEAD_DIM, cross_attention_dim=CTX_DIM), seed=15)
    proc = _randomize(ref_attention_mods.ip.IPAttnProcessor2_0(
        hidden_size=DIM, cross_attention_dim=CTX_DIM, scale=0.5,
        num_tokens=IP_TOKENS), seed=16)
    blk.attn2.set_processor(proc)
    params = _block_params_from_torch(blk, ip_proc=proc)

    rng = np.random.default_rng(24)
    x = rng.normal(size=(2, 33, DIM)).astype(np.float32)
    ctx = rng.normal(size=(2, 7 + IP_TOKENS, CTX_DIM)).astype(np.float32)
    g = rng.normal(size=(2, 17, DIM)).astype(np.float32)
    with torch.no_grad():
        want, idx = blk(torch.from_numpy(x),
                        encoder_hidden_states=torch.from_numpy(ctx),
                        garment_features=[torch.from_numpy(g)],
                        curr_garment_feat_idx=0)
    assert idx == 1
    got, _ = transformer_block(params, jnp.asarray(x), jnp.asarray(ctx),
                               heads=HEADS, garment_mode="consume",
                               garment_feat=jnp.asarray(g),
                               ip_num_tokens=IP_TOKENS, ip_scale=0.5,
                               impl="xla")
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               atol=5e-5, rtol=1e-4)
