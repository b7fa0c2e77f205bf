"""Parity-drift guard: every kwarg of the reference pipeline's __call__
(/root/reference/src/tryon_pipeline.py:1254) must be either accepted by our
pipeline API under a documented name, or on the explicit documented-absent
list (MIGRATION.md §6). If the mapping table in MIGRATION/PARITY ever rots,
this test names the unmapped kwarg."""

import inspect
import re

from idmvton_tpu.pipeline.tryon import TryonPipeline
from idmvton_tpu.preprocess import inpaint_crop  # padding_mask_crop helpers

REF = "/root/reference/src/tryon_pipeline.py"

# reference kwarg -> where it lives here (same-name entries omitted;
# every value is asserted to exist as a parameter of the named callable
# or explained by a non-empty rationale string)
RENAMED = {
    "prompt": "prompt_ids_l",          # token-id seam (per-encoder ids)
    "prompt_2": "prompt_ids_g",
    "negative_prompt": "neg_ids_l",
    "negative_prompt_2": "neg_ids_g",
    "text_embeds_cloth": "cloth_prompt_embeds",
    "image": "person",
    "mask_image": "mask",
    "pose_img": "pose",
    "ip_adapter_image": "ip_pixels",
    "num_inference_steps": "num_steps",
    "generator": "rng",                # explicit jax.random key
    "latents": "latents_in",
}
# handled by a mechanism rather than a same-shape kwarg
MECHANISM = {
    "height": "shape-derived: H/W come from the input image tensors "
              "(static shapes; reference defaults to unet sample size)",
    "width": "shape-derived (see height)",
    "original_size": "micro_conditioning dict -> make_time_ids",
    "target_size": "micro_conditioning dict -> make_time_ids",
    "crops_coords_top_left": "micro_conditioning dict -> make_time_ids",
    "negative_original_size": "micro_conditioning dict -> make_time_ids",
    "negative_target_size": "micro_conditioning dict -> make_time_ids",
    "negative_crops_coords_top_left": "micro_conditioning -> make_time_ids",
    "aesthetic_score": "micro_conditioning dict -> make_time_ids",
    "negative_aesthetic_score": "micro_conditioning dict -> make_time_ids",
    "callback_on_step_end_tensor_inputs": "callback receives the step state "
                                          "dict directly (stepwise_generate)",
    "padding_mask_crop": "host-side pre/post helpers "
                         "preprocess/inpaint_crop.py (crop region + paste-"
                         "back around the jitted pipeline)",
}
# intentionally absent, with the reason (mirrors MIGRATION.md §6)
ABSENT = {
    "cross_attention_kwargs": "inert LoRA-scale plumbing with the served "
                              "processors; no reference entry point passes it",
    "return_dict": "diffusers container convention; plain arrays here",
    "pooled_prompt_embeds_c": "dead in the reference hot loop: accepted but "
                              "only used by the commented-out unet_encoder "
                              "call (tryon_pipeline.py:1788-1790)",
}


def _reference_call_kwargs():
    src = open(REF).read()
    sig = re.search(r"def __call__\((.*?)\):", src, re.S).group(1)
    names = re.findall(r"^\s*(\w+)\s*[:=,]", sig, re.M)
    return sorted(set(names) - {"self"})


def test_reference_call_kwargs_all_mapped():
    ours = set()
    for fn in (TryonPipeline.generate, TryonPipeline.stepwise_generate,
               TryonPipeline.encode_conditioning, TryonPipeline.denoise):
        ours |= set(inspect.signature(fn).parameters)

    unmapped = []
    for kw in _reference_call_kwargs():
        if kw in ours:
            continue
        if kw in RENAMED:
            assert RENAMED[kw] in ours, (kw, RENAMED[kw])
            continue
        if kw in MECHANISM or kw in ABSENT:
            continue
        unmapped.append(kw)
    assert not unmapped, f"reference __call__ kwargs with no mapping: {unmapped}"


def test_padding_mask_crop_helpers_exist():
    assert callable(inpaint_crop.get_crop_region)


def test_mapping_tables_are_disjoint_and_nonstale():
    ref = set(_reference_call_kwargs())
    for table in (RENAMED, MECHANISM, ABSENT):
        stale = set(table) - ref
        assert not stale, f"mapping entries no longer in the reference: {stale}"
    overlap = (set(RENAMED) & set(MECHANISM)) | (set(RENAMED) & set(ABSENT)) \
        | (set(MECHANISM) & set(ABSENT))
    assert not overlap, overlap
