"""Dump golden-parity fixtures FROM THE PYTORCH REFERENCE (yisol/IDM-VTON).

Run this where the reference repo + its weights + torch-CUDA exist (NOT in
the TPU build environment — here it only documents the protocol):

    cd /path/to/IDM-VTON && python /path/to/dump_golden_fixtures.py \
        --ref_repo . --weights yisol/IDM-VTON --data_dir ./viton_hd \
        --out /tmp/golden --steps 30 --seed 42

It produces the IDMVTON_GOLDEN_DIR layout tests/test_golden_parity.py
consumes:

  inputs.npz    person/mask/pose/cloth/ip_pixels (NHWC, [-1,1]) + token ids
  noise.npz     init_noise (B,h,w,4) + step_noise (T,B,h,w,4) — every
                randn_tensor draw the reference makes, captured by patching
                diffusers' randn_tensor (torch RNG cannot be reproduced in
                jax, so the jax side INJECTS these; SURVEY §7)
  expected.npz  reference output images (NHWC, [-1,1])
  golden_config.json  steps/guidance/seed/vae_sample=false

VAE encodes are forced to the posterior MODE on both sides (here by patching
retrieve_latents sample_mode; jax side via vae_sample=False) so the only
stochastic inputs are the captured noises.

Reference call sites this instruments:
  prepare_latents randn_tensor       src/tryon_pipeline.py:889
  DDPMScheduler.step variance noise  diffusers scheduling_ddpm.py (step)
  pipeline __call__                  inference.py:396-412
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def filter_latent_draws(draws, b, lh, lw, steps):
    """Select the init + per-step latent noise draws from the full capture
    stream (other randn_tensor calls — e.g. unrelated shapes — are shape-
    filtered out). Returns (init_noise (B,lh,lw,4), step_noise (T,B,lh,lw,4))
    in NHWC. Draw order per the reference: prepare_latents first
    (src/tryon_pipeline.py:889), then one DDPM variance draw per
    scheduler.step."""
    import numpy as np
    lat_draws = [d for d in draws if d.shape == (b, 4, lh, lw)]
    assert len(lat_draws) == steps + 1, (
        f"expected 1 init + {steps} step draws, got {len(lat_draws)}")
    nhwc = lambda x: np.transpose(x, (0, 2, 3, 1))
    return nhwc(lat_draws[0]), np.stack([nhwc(d) for d in lat_draws[1:]])


def write_fixture_dir(out, *, inputs, init_noise, step_noise, images,
                      num_steps, guidance_scale, seed, diffusers,
                      ssim_threshold=0.99, dtype="bfloat16"):
    """Write the IDMVTON_GOLDEN_DIR layout consumed by
    idmvton_tpu/utils/golden.py::run_golden_gate (images NHWC in [-1, 1]).
    `dtype` is the compute dtype the gate loads the models in."""
    import numpy as np
    os.makedirs(out, exist_ok=True)
    np.savez(os.path.join(out, "inputs.npz"), **inputs)
    np.savez(os.path.join(out, "noise.npz"),
             init_noise=init_noise, step_noise=step_noise)
    np.savez(os.path.join(out, "expected.npz"), images=np.asarray(images))
    json.dump({"num_steps": num_steps, "guidance_scale": guidance_scale,
               "seed": seed, "vae_sample": False, "diffusers": diffusers,
               "ssim_threshold": ssim_threshold, "dtype": dtype},
              open(os.path.join(out, "golden_config.json"), "w"), indent=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref_repo", required=True,
                    help="path to the IDM-VTON reference checkout")
    ap.add_argument("--weights", default="yisol/IDM-VTON",
                    help="HF id or local diffusers tree")
    ap.add_argument("--data_dir", required=True,
                    help="VITON-HD test dir (image/, cloth/, ... layout)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--guidance_scale", type=float, default=2.0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=768)
    args = ap.parse_args()

    sys.path.insert(0, args.ref_repo)
    import numpy as np
    import torch
    import diffusers.utils.torch_utils as dtu
    import diffusers.schedulers.scheduling_ddpm as sched_mod

    # ---- capture every randn_tensor draw, in call order -------------------
    draws = []
    real_randn = dtu.randn_tensor

    def capturing_randn(shape, generator=None, device=None, dtype=None,
                        layout=None):
        t = real_randn(shape, generator=generator, device=device,
                       dtype=dtype, layout=layout)
        draws.append(t.detach().float().cpu().numpy())
        return t

    dtu.randn_tensor = capturing_randn
    sched_mod.randn_tensor = capturing_randn
    import src.tryon_pipeline as tp
    tp.randn_tensor = capturing_randn

    # ---- deterministic VAE encodes (posterior mode) ------------------------
    real_retrieve = tp.retrieve_latents

    def mode_retrieve(encoder_output, generator=None, sample_mode="sample"):
        return real_retrieve(encoder_output, generator=generator,
                             sample_mode="argmax")

    tp.retrieve_latents = mode_retrieve

    # ---- build the reference pipeline (inference.py:232-340) --------------
    from inference import main as _unused  # noqa: F401 (import check only)
    from src.tryon_pipeline import StableDiffusionXLInpaintPipeline
    from src.unet_hacked_tryon import UNet2DConditionModel
    from src.unet_hacked_garmnet import (
        UNet2DConditionModel as UNet2DConditionModel_ref)
    from diffusers import AutoencoderKL, DDPMScheduler
    from transformers import (
        AutoTokenizer, CLIPTextModel, CLIPTextModelWithProjection,
        CLIPVisionModelWithProjection, CLIPImageProcessor)

    device = "cuda" if torch.cuda.is_available() else "cpu"
    w = args.weights
    pipe = StableDiffusionXLInpaintPipeline.from_pretrained(
        w,
        unet=UNet2DConditionModel.from_pretrained(w, subfolder="unet"),
        vae=AutoencoderKL.from_pretrained(w, subfolder="vae"),
        text_encoder=CLIPTextModel.from_pretrained(w, subfolder="text_encoder"),
        text_encoder_2=CLIPTextModelWithProjection.from_pretrained(
            w, subfolder="text_encoder_2"),
        tokenizer=AutoTokenizer.from_pretrained(w, subfolder="tokenizer"),
        tokenizer_2=AutoTokenizer.from_pretrained(w, subfolder="tokenizer_2"),
        image_encoder=CLIPVisionModelWithProjection.from_pretrained(
            w, subfolder="image_encoder"),
        scheduler=DDPMScheduler.from_pretrained(w, subfolder="scheduler"),
        torch_dtype=torch.float32,  # fp32 for a clean numeric anchor
    ).to(device)
    pipe.unet_encoder = UNet2DConditionModel_ref.from_pretrained(
        w, subfolder="unet_encoder").to(device)

    # ---- one VITON-HD sample (inference.py VitonHDTestDataset layout) ------
    from inference import VitonHDTestDataset
    ds = VitonHDTestDataset(dataroot_path=args.data_dir, phase="test",
                            order="paired", size=(args.height, args.width))
    sample = torch.utils.data.default_collate([ds[0]])

    prompt = ["model is wearing " + sample["caption"][0]]
    neg = ["monochrome, lowres, bad anatomy, worst quality, low quality"]
    with torch.inference_mode():
        pe, npe, ppe, nppe = pipe.encode_prompt(
            prompt, num_images_per_prompt=1,
            do_classifier_free_guidance=True, negative_prompt=neg)
        pe_c, _, _, _ = pipe.encode_prompt(
            ["a photo of " + sample["caption_cloth"][0]],
            num_images_per_prompt=1, do_classifier_free_guidance=False,
            negative_prompt=neg)

        from torchvision import transforms
        clip_proc = CLIPImageProcessor()
        ip_img = clip_proc(images=transforms.ToPILImage()(
            (sample["cloth_pure"][0] + 1) / 2), return_tensors="pt").pixel_values

        gen = torch.Generator(device).manual_seed(args.seed)
        draws.clear()
        images = pipe(
            prompt_embeds=pe.to(device), negative_prompt_embeds=npe.to(device),
            pooled_prompt_embeds=ppe.to(device),
            negative_pooled_prompt_embeds=nppe.to(device),
            num_inference_steps=args.steps, generator=gen, strength=1.0,
            pose_img=sample["pose_img"].to(device),
            text_embeds_cloth=pe_c.to(device),
            cloth=sample["cloth_pure"].to(device),
            mask_image=sample["inpaint_mask"].to(device),
            image=(sample["image"].to(device) + 1.0) / 2.0,
            height=args.height, width=args.width,
            guidance_scale=args.guidance_scale,
            ip_adapter_image=ip_img.to(device),
        )[0]

    # draw order: [0] init latents noise (prepare_latents), then one variance
    # noise per scheduler.step. Anything extra (e.g. ip uncond) is shape-
    # filtered: latent draws are (B, 4, h, w).
    b = sample["image"].shape[0]
    lh, lw = args.height // 8, args.width // 8
    init_noise, step_noise = filter_latent_draws(draws, b, lh, lw, args.steps)
    nhwc = lambda x: np.transpose(x, (0, 2, 3, 1))

    tok = pipe.tokenizer, pipe.tokenizer_2

    def ids(texts, t):
        return t(texts, padding="max_length", max_length=77, truncation=True,
                 return_tensors="np").input_ids.astype(np.int32)

    inputs = dict(
        person=nhwc(sample["image"].numpy()),
        mask=nhwc(sample["inpaint_mask"].numpy()),
        pose=nhwc(sample["pose_img"].numpy()),
        cloth=nhwc(sample["cloth_pure"].numpy()),
        ip_pixels=nhwc(ip_img.numpy()),
        prompt_ids_l=ids(prompt, tok[0]), prompt_ids_g=ids(prompt, tok[1]),
        neg_ids_l=ids(neg, tok[0]), neg_ids_g=ids(neg, tok[1]),
        cloth_ids_l=ids(["a photo of " + sample["caption_cloth"][0]], tok[0]),
        cloth_ids_g=ids(["a photo of " + sample["caption_cloth"][0]], tok[1]),
    )
    imgs = np.stack([np.asarray(im, np.float32) / 127.5 - 1.0 for im in images])
    write_fixture_dir(args.out, inputs=inputs, init_noise=init_noise,
                      step_noise=step_noise, images=imgs,
                      num_steps=args.steps,
                      guidance_scale=args.guidance_scale, seed=args.seed,
                      diffusers=True)
    print(f"wrote fixtures to {args.out} ({args.steps + 1} latent noise draws)")


if __name__ == "__main__":
    main()
