"""TryonPipeline: the full try-on generation loop as one jitted program.

Mirrors StableDiffusionXLInpaintPipeline.__call__ semantics
(reference: src/tryon_pipeline.py:1254-1885) re-designed for XLA:

- the 30-step CFG denoise loop is a single ``lax.scan`` (the reference runs a
  python loop with an ``xm.mark_step`` XLA seam per step,
  tryon_pipeline.py:1765-1866,1865),
- all RNG is explicit ``jax.random`` keys (the reference threads a stateful
  torch.Generator),
- text/image encoders, VAE encodes, resampler, denoise scan and fp32 VAE
  decode compile into one program; CFG runs batched 2B through TryonNet while
  GarmentNet runs the cond batch only with a zero uncond half
  (tryon_pipeline.py:1787-1796).

Conditioning layout (13-channel TryonNet input, train_xl.py:359-373):
  [noisy latent 4 | inpaint mask 1 | masked-person latent 4 | DensePose latent 4]
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from idmvton_tpu.core.config import (
    UNetConfig, VAEConfig, CLIPTextConfig, CLIPVisionConfig, ResamplerConfig,
    SchedulerConfig,
)
from idmvton_tpu.diffusion.scheduler import (
    DDPMScheduler, classifier_free_guidance, check_denoising_range,
)
from idmvton_tpu.models.unet import init_unet, unet_apply
from idmvton_tpu.models.vae import init_vae, vae_encode, vae_decode
from idmvton_tpu.models.clip import (
    init_clip_text, clip_text_apply, init_clip_vision, clip_vision_apply,
)
from idmvton_tpu.models.resampler import init_resampler, resampler_apply


@dataclasses.dataclass
class TryonModels:
    """All model configs + param pytrees of the try-on stack.

    Mirrors the 9 components inference.py:232-274 loads (two tokenizers are
    host-side, see data/tokenizer.py).
    """

    unet_cfg: UNetConfig
    unet: dict
    garm_cfg: UNetConfig
    garm: dict
    vae_cfg: VAEConfig
    vae: dict
    clip_l_cfg: CLIPTextConfig
    clip_l: dict
    clip_g_cfg: CLIPTextConfig
    clip_g: dict
    vision_cfg: CLIPVisionConfig
    vision: dict
    resampler_cfg: ResamplerConfig
    resampler: dict

    @staticmethod
    def init(key, *, tiny: bool = False, micro: bool = False,
             dtype=jnp.bfloat16) -> "TryonModels":
        ks = jax.random.split(key, 7)
        if micro:
            # Mechanics-test stack: micro UNets (2 levels / depth 1) with the
            # tiny frozen towers. Same component contract, ~4x smaller
            # trace+compile than tiny on a 1-CPU host.
            cfgs = (UNetConfig.micro("consume"), UNetConfig.micro("emit"),
                    VAEConfig.tiny(), CLIPTextConfig.tiny(),
                    CLIPTextConfig.tiny(hidden_size=32, projection_dim=64,
                                        use_final_projection=True),
                    CLIPVisionConfig.tiny(), ResamplerConfig.tiny())
        elif tiny:
            cfgs = (UNetConfig.tiny("consume"), UNetConfig.tiny("emit"),
                    VAEConfig.tiny(), CLIPTextConfig.tiny(),
                    CLIPTextConfig.tiny(hidden_size=32, projection_dim=64,
                                        use_final_projection=True),
                    CLIPVisionConfig.tiny(), ResamplerConfig.tiny())
        else:
            cfgs = (UNetConfig.sdxl_tryon(), UNetConfig.sdxl_garment(),
                    VAEConfig.sdxl(), CLIPTextConfig.clip_l(),
                    CLIPTextConfig.clip_bigg(), CLIPVisionConfig.vit_h(),
                    ResamplerConfig.sdxl_plus())
        u, g, v, tl, tg, vi, rs = cfgs
        return TryonModels(
            unet_cfg=u, unet=init_unet(ks[0], u, dtype=dtype),
            garm_cfg=g, garm=init_unet(ks[1], g, dtype=dtype),
            vae_cfg=v, vae=init_vae(ks[2], v, dtype=dtype),
            clip_l_cfg=tl, clip_l=init_clip_text(ks[3], tl, dtype=dtype),
            clip_g_cfg=tg, clip_g=init_clip_text(ks[4], tg, dtype=dtype),
            vision_cfg=vi, vision=init_clip_vision(ks[5], vi, dtype=dtype),
            resampler_cfg=rs, resampler=init_resampler(ks[6], rs, dtype=dtype),
        )

    def params(self) -> dict:
        return {"unet": self.unet, "garm": self.garm, "vae": self.vae,
                "clip_l": self.clip_l, "clip_g": self.clip_g,
                "vision": self.vision, "resampler": self.resampler}

    def with_params(self, params: dict) -> "TryonModels":
        return dataclasses.replace(self, **params)


def make_time_ids(img_h: int, img_w: int, batch: int, dtype, *,
                  original_size=None,
                  crops_coords_top_left=(0, 0),
                  target_size=None,
                  negative_original_size=None,
                  negative_crops_coords_top_left=(0, 0),
                  negative_target_size=None,
                  aesthetic_score: float = 6.0,
                  negative_aesthetic_score: float = 2.5,
                  requires_aesthetics_score: bool = False):
    """SDXL micro-conditioning ids, CFG-batched [negative | positive].

    Reference: src/tryon_pipeline.py:1024-1061 (_get_add_time_ids) with the
    __call__ defaults at :1680-1692 (original/target default to the latent
    image size; negative_* default to the positive values). Two reference
    behaviors preserved exactly:
    - requires_aesthetics_score swaps target_size for an aesthetic score
      (5 ids instead of 6 — only valid for refiner-style UNets whose
      add_embedding expects 5 * 256 + pooled);
    - the NEGATIVE ids reuse the POSITIVE crops_coords_top_left in the
      non-aesthetic branch (:1044 — negative_crops_coords_top_left only
      affects the aesthetic branch), quirk and all.

    Returns (2 * batch, 6) (or (2 * batch, 5) with aesthetics)."""
    original_size = tuple(original_size or (img_h, img_w))
    target_size = tuple(target_size or (img_h, img_w))
    negative_original_size = tuple(negative_original_size or original_size)
    negative_target_size = tuple(negative_target_size or target_size)
    crops_coords_top_left = tuple(crops_coords_top_left)
    negative_crops_coords_top_left = tuple(negative_crops_coords_top_left)
    if requires_aesthetics_score:
        pos = original_size + crops_coords_top_left + (aesthetic_score,)
        neg = (negative_original_size + negative_crops_coords_top_left
               + (negative_aesthetic_score,))
    else:
        pos = original_size + crops_coords_top_left + target_size
        neg = (negative_original_size + crops_coords_top_left
               + negative_target_size)
    ids = jnp.concatenate([
        jnp.tile(jnp.asarray(neg, dtype)[None], (batch, 1)),
        jnp.tile(jnp.asarray(pos, dtype)[None], (batch, 1)),
    ], axis=0)
    return ids


def encode_prompt_sdxl(models: TryonModels, params: dict, ids_l, ids_g, *,
                       clip_skip: int = None):
    """SDXL dual text encode: concat penultimate hidden states (768+1280=2048)
    + bigG pooled projection (reference: src/tryon_pipeline.py:609-645).
    clip_skip applies to BOTH towers' hidden-state pick, as in the
    reference's per-tower loop (:637-641); pooled is unaffected."""
    out_l = clip_text_apply(params["clip_l"], models.clip_l_cfg, ids_l,
                            clip_skip=clip_skip)
    out_g = clip_text_apply(params["clip_g"], models.clip_g_cfg, ids_g,
                            clip_skip=clip_skip)
    embeds = jnp.concatenate([out_l["penultimate"], out_g["penultimate"]],
                             axis=-1)
    return embeds, out_g["pooled"]


def replicate_cond(cond: dict, n: int) -> dict:
    """Replicate a conditioning dict for num_images_per_prompt=n (reference
    encode_prompt's repeat_interleave, src/tryon_pipeline.py:710-730, and
    encode_image's :469-479). CFG-batched tensors (leading dim 2B: uncond
    half then cond half) replicate WITHIN each half so the uncond-first
    ordering survives; plain B-batched tensors replicate directly."""
    if n == 1:
        return cond
    b = cond["mask_lat"].shape[0]

    def rep(x):
        if x.shape[0] == 2 * b:  # CFG-batched: [uncond(B); cond(B)]
            u, c = jnp.split(x, 2, axis=0)
            return jnp.concatenate([jnp.repeat(u, n, axis=0),
                                    jnp.repeat(c, n, axis=0)], axis=0)
        return jnp.repeat(x, n, axis=0)

    return {k: rep(v) for k, v in cond.items()}


class TryonPipeline:
    """Functional pipeline: __call__ builds/jits one generate program."""

    def __init__(self, models: TryonModels,
                 scheduler: Optional[DDPMScheduler] = None):
        self.models = models
        self.scheduler = scheduler or DDPMScheduler(SchedulerConfig.sdxl_inference())

    # -- stage 1: all conditioning encodes (text, image, VAE) ---------------

    def encode_conditioning(self, params: dict, rng, *,
                            person, mask, pose, cloth,
                            prompt_ids_l=None, prompt_ids_g=None,
                            neg_ids_l=None, neg_ids_g=None,
                            cloth_ids_l=None, cloth_ids_g=None,
                            ip_pixels=None, vae_sample: bool = True,
                            micro_conditioning: Optional[dict] = None,
                            clip_skip: Optional[int] = None,
                            prompt_embeds=None, pooled_prompt_embeds=None,
                            negative_prompt_embeds=None,
                            negative_pooled_prompt_embeds=None,
                            cloth_prompt_embeds=None,
                            masked_image_latents=None) -> dict:
        """All image inputs (B, H, W, C) in [-1, 1]; mask (B, H, W, 1) in
        {0,1} (1 = inpaint region); ip_pixels (B, 224, 224, 3)
        CLIP-normalized. Returns the static conditioning dict for denoise().

        Precomputed-embedding passthrough (the reference's own served calling
        convention — inference.py:364-397 runs encode_prompt outside and
        passes embeds into __call__, tryon_pipeline.py:1276-1279):
        prompt_embeds (B, S, 2048) + pooled_prompt_embeds (B, 1280) replace
        the prompt_ids_* text-tower pass; negative_* likewise; and
        cloth_prompt_embeds replaces cloth_ids_* (the reference's
        text_embeds_cloth, :1285). Each prompt slot independently takes ids
        OR embeds; embeds require their pooled companion (for the slots that
        use pooled).

        masked_image_latents: precomputed scaled latents of the masked
        person image (B, h, w, 4) — skips that VAE encode (reference
        prepare_mask_latents, tryon_pipeline.py:957-964, __call__ :1260).

        micro_conditioning: optional kwargs for make_time_ids
        (original_size / crops_coords_top_left / target_size, negative
        variants, aesthetic scores — reference __call__ kwargs,
        src/tryon_pipeline.py:1366-1383). Defaults reproduce
        [h, w, 0, 0, h, w].

        Note on prompt_2 parity (reference encode_prompt :511): the two
        token-id arguments per prompt (ids_l for CLIP-L, ids_g for bigG)
        ARE the prompt/prompt_2 seam — tokenize different strings into
        ids_l vs ids_g to reproduce prompt_2 / negative_prompt_2.

        Staging exists so serving can drop encoder weights from HBM before
        the UNet-heavy denoise phase (the whole stack is ~6.7B params —
        13.5 GB bf16 — vs 16 GB on a v5e chip); generate() fuses all stages
        into one program when memory allows.
        """
        m = self.models
        b, img_h, img_w, _ = person.shape
        lat_h, lat_w = img_h // m.vae_cfg.downscale, img_w // m.vae_cfg.downscale
        dtype = person.dtype
        rngs = jax.random.split(rng, 3)

        # ---- text encoders (person prompt + negative + garment prompt),
        # each slot skippable via precomputed embeds (reference convention)
        if prompt_embeds is None:
            prompt_embeds, pooled = encode_prompt_sdxl(
                m, params, prompt_ids_l, prompt_ids_g, clip_skip=clip_skip)
        else:
            if pooled_prompt_embeds is None:
                raise ValueError("prompt_embeds requires pooled_prompt_embeds"
                                 " (reference tryon_pipeline.py:806-811)")
            pooled = pooled_prompt_embeds
        if negative_prompt_embeds is None:
            neg_embeds, neg_pooled = encode_prompt_sdxl(
                m, params, neg_ids_l, neg_ids_g, clip_skip=clip_skip)
        else:
            if negative_pooled_prompt_embeds is None:
                raise ValueError("negative_prompt_embeds requires "
                                 "negative_pooled_prompt_embeds")
            neg_embeds = negative_prompt_embeds
            neg_pooled = negative_pooled_prompt_embeds
        if cloth_prompt_embeds is None:
            cloth_embeds, _ = encode_prompt_sdxl(
                m, params, cloth_ids_l, cloth_ids_g, clip_skip=clip_skip)
        else:
            cloth_embeds = cloth_prompt_embeds

        # ---- IP-Adapter image path: ViT-H penultimate -> resampler, with a
        # zeros-image uncond branch (reference: tryon_pipeline.py:469-482)
        vis = clip_vision_apply(params["vision"], m.vision_cfg, ip_pixels)
        vis_uncond = clip_vision_apply(params["vision"], m.vision_cfg,
                                       jnp.zeros_like(ip_pixels))
        ip_cond = resampler_apply(params["resampler"], m.resampler_cfg,
                                  vis["penultimate"])
        ip_uncond = resampler_apply(params["resampler"], m.resampler_cfg,
                                    vis_uncond["penultimate"])

        # ---- VAE encodes (masked person, pose, cloth); vae_sample=False
        # uses the posterior mode (deterministic — golden-parity fixtures)
        if masked_image_latents is not None:
            masked_lat = masked_image_latents.astype(dtype)
        else:
            masked_person = person * (mask < 0.5).astype(dtype)
            masked_lat = vae_encode(params["vae"], m.vae_cfg, masked_person,
                                    rng=rngs[0], sample=vae_sample)
        pose_lat = vae_encode(params["vae"], m.vae_cfg, pose, rng=rngs[1],
                              sample=vae_sample)
        cloth_lat = vae_encode(params["vae"], m.vae_cfg, cloth, rng=rngs[2],
                               sample=vae_sample)
        mask_lat = jax.image.resize(mask, (b, lat_h, lat_w, 1), "nearest").astype(dtype)

        # ---- CFG-batched static conditioning (uncond first, diffusers order)
        context = jnp.concatenate([
            jnp.concatenate([neg_embeds, ip_uncond], axis=1),
            jnp.concatenate([prompt_embeds, ip_cond], axis=1),
        ], axis=0)
        add_text_embeds = jnp.concatenate([neg_pooled, pooled], axis=0)
        time_ids = make_time_ids(img_h, img_w, b, dtype,
                                 **(micro_conditioning or {}))
        return {
            "context": context,
            "add_text_embeds": add_text_embeds,
            "time_ids": time_ids,
            "mask_lat": mask_lat,
            "masked_lat": masked_lat,
            "pose_lat": pose_lat,
            "cloth_lat": cloth_lat,
            "cloth_embeds": cloth_embeds,
        }

    def staged_encoder(self, *, vae_sample: bool = True,
                       micro_conditioning: Optional[dict] = None,
                       clip_skip: Optional[int] = None):
        """Returns encode(params, rng, inputs_dict) -> cond dict, built from
        per-tower jit programs with batched tower calls (3 prompt sets in one
        text-tower pass, cond+uncond in one vision pass, 3 VAE encodes in
        one pass). Same semantics as encode_conditioning (the VAE sampling
        RNG stream differs); exists
        because one fused encode graph inlines each tower 2-3x and compiles
        ~10x slower through a remote-compile tunnel, and because serving can
        drop each tower's weights from HBM after its pass."""
        m = self.models

        @jax.jit
        def text_fn(p, ids_l, ids_g):
            return encode_prompt_sdxl(m, p, ids_l, ids_g, clip_skip=clip_skip)

        @jax.jit
        def vision_resampler_fn(p, pixels):
            vis = clip_vision_apply(p["vision"], m.vision_cfg, pixels)
            return resampler_apply(p["resampler"], m.resampler_cfg,
                                   vis["penultimate"])

        @jax.jit
        def vae_fn(p, imgs, rng):
            return vae_encode(p["vae"], m.vae_cfg, imgs, rng=rng,
                              sample=vae_sample)

        @functools.partial(jax.jit, static_argnames=("lat_hw",))
        def mask_fn(mask, lat_hw):
            b = mask.shape[0]
            return jax.image.resize(mask, (b, *lat_hw, 1), "nearest")

        def encode(params, rng, inputs):
            person, mask = inputs["person"], inputs["mask"]
            b, img_h, img_w, _ = person.shape
            lat_hw = (img_h // m.vae_cfg.downscale, img_w // m.vae_cfg.downscale)
            dtype = person.dtype
            r_vae, _ = jax.random.split(rng)

            if inputs.get("prompt_embeds") is not None:
                # precomputed-embeds convention (inference.py:364-397): the
                # batched text-tower pass needs all three slots, so embeds
                # here are all-or-nothing (per-slot mixing: use
                # encode_conditioning)
                need = ("pooled_prompt_embeds", "negative_prompt_embeds",
                        "negative_pooled_prompt_embeds", "cloth_prompt_embeds")
                missing = [k for k in need if inputs.get(k) is None]
                if missing:
                    raise ValueError(
                        f"prompt_embeds passthrough via the staged encoder "
                        f"requires all of {need}; missing {missing}")
                prompt_embeds = inputs["prompt_embeds"]
                pooled_p = inputs["pooled_prompt_embeds"]
                neg_embeds = inputs["negative_prompt_embeds"]
                pooled_n = inputs["negative_pooled_prompt_embeds"]
                cloth_embeds = inputs["cloth_prompt_embeds"]
            else:
                ids_l = jnp.concatenate([inputs["prompt_ids_l"],
                                         inputs["neg_ids_l"],
                                         inputs["cloth_ids_l"]], axis=0)
                ids_g = jnp.concatenate([inputs["prompt_ids_g"],
                                         inputs["neg_ids_g"],
                                         inputs["cloth_ids_g"]], axis=0)
                embeds, pooled = text_fn(params, ids_l, ids_g)
                prompt_embeds, neg_embeds, cloth_embeds = jnp.split(embeds, 3)
                pooled_p, pooled_n, _ = jnp.split(pooled, 3)

            ip_pixels = inputs["ip_pixels"]
            ip_tokens = vision_resampler_fn(
                params, jnp.concatenate([jnp.zeros_like(ip_pixels),
                                         ip_pixels], axis=0))
            ip_uncond, ip_cond = jnp.split(ip_tokens, 2)

            masked_lat_in = inputs.get("masked_image_latents")
            if masked_lat_in is not None:
                lats = vae_fn(params, jnp.concatenate(
                    [inputs["pose"], inputs["cloth"]], axis=0), r_vae)
                pose_lat, cloth_lat = jnp.split(lats, 2)
                masked_lat = masked_lat_in.astype(dtype)
            else:
                masked_person = person * (mask < 0.5).astype(dtype)
                lats = vae_fn(params, jnp.concatenate(
                    [masked_person, inputs["pose"], inputs["cloth"]],
                    axis=0), r_vae)
                masked_lat, pose_lat, cloth_lat = jnp.split(lats, 3)
            mask_lat = mask_fn(mask, lat_hw).astype(dtype)

            context = jnp.concatenate([
                jnp.concatenate([neg_embeds, ip_uncond], axis=1),
                jnp.concatenate([prompt_embeds, ip_cond], axis=1)], axis=0)
            return {
                "context": context,
                "add_text_embeds": jnp.concatenate([pooled_n, pooled_p], axis=0),
                "time_ids": make_time_ids(img_h, img_w, b, dtype,
                                          **(micro_conditioning or {})),
                "mask_lat": mask_lat,
                "masked_lat": masked_lat,
                "pose_lat": pose_lat,
                "cloth_lat": cloth_lat,
                "cloth_embeds": cloth_embeds,
            }

        return encode

    # -- stage 2: a single denoise step (the hot-loop body) -----------------

    def garment_features(self, params: dict, cond: dict, t, *,
                         impl: Optional[str] = None):
        """GarmentNet forward on the cond batch only (B). The CFG uncond
        half's zero features (tryon_pipeline.py:1787,1795) are NOT
        materialized — the TryonNet attends with garment_uncond_zero=True,
        which folds the zero KV in analytically (exact same math)."""
        _, feats = unet_apply(params["garm"], self.models.garm_cfg,
                              cond["cloth_lat"], t, cond["cloth_embeds"],
                              impl=impl)
        return feats

    def denoise_step(self, params: dict, cond: dict, latents, t, prev_t,
                     step_rng=None, *, guidance_scale: float = 2.0,
                     guidance_rescale: float = 0.0,
                     feats_cfg=None,
                     step_noise=None,
                     impl: Optional[str] = None):
        """One CFG denoise step: GarmentNet fwd -> TryonNet fwd -> CFG ->
        DDPM step (reference hot loop: tryon_pipeline.py:1765-1866).

        ``feats_cfg``: precomputed garment features (garment_cache="once"
        mode); None recomputes per step like the reference (GarmentNet's
        resnets are time-conditioned, so this is the parity path).
        ``step_noise``: injected DDPM variance noise (golden-parity hook,
        SURVEY §7) — when None it is drawn from ``step_rng``.
        """
        m = self.models
        sched = self.scheduler
        dtype = latents.dtype
        if feats_cfg is None:
            feats_cfg = self.garment_features(params, cond, t, impl=impl)

        lat_in = jnp.concatenate([latents] * 2, axis=0)
        unet_in = jnp.concatenate(
            [lat_in,
             jnp.concatenate([cond["mask_lat"]] * 2, axis=0),
             jnp.concatenate([cond["masked_lat"]] * 2, axis=0),
             jnp.concatenate([cond["pose_lat"]] * 2, axis=0)], axis=-1)
        noise_pred, _ = unet_apply(
            params["unet"], m.unet_cfg, unet_in, t, cond["context"],
            added_cond=(cond["add_text_embeds"], cond["time_ids"]),
            garment_features=feats_cfg, garment_uncond_zero=True, impl=impl)
        uncond, condp = jnp.split(noise_pred, 2, axis=0)
        guided = classifier_free_guidance(uncond, condp, guidance_scale,
                                          guidance_rescale)
        if step_noise is None:
            step_noise = jax.random.normal(step_rng, latents.shape,
                                           jnp.float32).astype(dtype)
        new_latents, _ = sched.step(guided, t, prev_t, latents, step_noise)
        return new_latents

    def denoise(self, params: dict, rng, cond: dict, *,
                latent_shape: Tuple[int, int, int, int],
                num_steps: int = 30, guidance_scale: float = 2.0,
                guidance_rescale: float = 0.0, strength: float = 1.0,
                dtype=None, garment_cache: str = "every_step",
                image_latents=None, inpaint_blend: bool = False,
                init_noise=None, step_noise=None,
                denoising_start: Optional[float] = None,
                denoising_end: Optional[float] = None,
                latents_in=None,
                timesteps=None,
                impl: Optional[str] = None):
        """The 30-step loop as one lax.scan. Returns final latents.

        timesteps: explicit descending timestep list (reference ``timesteps``
        kwarg via retrieve_timesteps, tryon_pipeline.py:264-302,:1561) —
        overrides num_steps' spacing formula; see
        DDPMScheduler.timesteps(custom_timesteps=...).

        garment_cache: "every_step" recomputes GarmentNet per step (reference
        semantics — its resnets are time-conditioned); "once" computes the
        reference features at the mid-schedule timestep and reuses them,
        cutting ~1/3 of the denoise FLOPs (the features' time-dependence is
        weak — cf. PAPERS.md "Decouple, Don't Denoise"; validate quality
        before serving with this on).

        image_latents: scaled VAE latents of the person image; REQUIRED when
        strength < 1 (init = scheduler.add_noise(image_latents, noise, t0),
        no init_noise_sigma scale — reference prepare_latents,
        tryon_pipeline.py:888-894) or when inpaint_blend is on.
        inpaint_blend: the reference's 4-channel-UNet inpaint branch
        (tryon_pipeline.py:1825-1838) — after each step, pin the un-masked
        region to the image latents noised to the NEXT timestep.
        init_noise / step_noise: golden-parity injection hooks (SURVEY §7;
        torch RNG cannot be reproduced cross-framework). init_noise (B,h,w,4)
        replaces the initial draw; step_noise (T,B,h,w,4) replaces the
        per-step DDPM variance draws.

        denoising_start / denoising_end: the SDXL base→refiner seam
        (tryon_pipeline.py:1351-1365). With denoising_start set, strength
        is ignored, NO noise is added (reference `add_noise=False`,
        :1609), and the initial latents are ``latents_in`` (the predecessor
        pipeline's output) or, if absent, ``image_latents`` as-is. With
        denoising_end set, the loop stops early and returns the
        partially-denoised latents for a successor with
        denoising_start = this denoising_end; chaining is bit-exact to the
        unsplit run given the same injected noises. Values outside (0, 1)
        are IGNORED (reference denoising_value_valid,
        tryon_pipeline.py:1586-1589); start >= end raises.
        """
        denoising_start, denoising_end = check_denoising_range(
            denoising_start, denoising_end)
        sched = self.scheduler
        init_rng, steps_rng = jax.random.split(rng)
        dtype = dtype or cond["masked_lat"].dtype
        if init_noise is None:
            init_noise = jax.random.normal(init_rng, latent_shape, jnp.float32)
        init_noise = init_noise.astype(dtype)
        ts, prev_ts = sched.timesteps_and_prev(
            num_steps, strength, denoising_start, denoising_end,
            custom_timesteps=timesteps)
        n_steps = int(ts.shape[0])

        if denoising_start is not None:
            start_lat = latents_in if latents_in is not None else image_latents
            if start_lat is None:
                raise ValueError(
                    "denoising_start requires latents_in (predecessor "
                    "pipeline output) or image_latents (reference "
                    "prepare_latents with add_noise=False, "
                    "tryon_pipeline.py:1609)")
            latents = start_lat.astype(dtype)
        elif strength >= 1.0:
            latents = init_noise * sched.init_noise_sigma
        else:
            if image_latents is None:
                raise ValueError(
                    "strength < 1 requires image_latents (reference "
                    "prepare_latents: init = noised person-image latents, "
                    "tryon_pipeline.py:888-894)")
            latents = sched.add_noise(
                image_latents.astype(dtype), init_noise, ts[0])
        if inpaint_blend and image_latents is None:
            raise ValueError("inpaint_blend requires image_latents")

        if step_noise is None:
            step_rngs = jax.random.split(steps_rng, n_steps)
            step_noise = jax.vmap(
                lambda k: jax.random.normal(k, latent_shape, jnp.float32))(step_rngs)
        step_noise = step_noise.astype(dtype)

        feats_cached = None
        if garment_cache == "once":
            # mid-point of the ACTUAL (possibly strength-truncated) schedule
            feats_cached = self.garment_features(
                params, cond, ts[n_steps // 2], impl=impl)

        # timestep the blend noises TO: the next loop iteration's t
        # (reference: noise_timestep = timesteps[i+1]); -1 marks the last step
        next_ts = jnp.concatenate([ts[1:], jnp.full((1,), -1, ts.dtype)])

        def body(latents, scan_in):
            t, prev_t, next_t, noise_t = scan_in
            latents = self.denoise_step(
                params, cond, latents, t, prev_t,
                guidance_scale=guidance_scale,
                guidance_rescale=guidance_rescale,
                feats_cfg=feats_cached, step_noise=noise_t, impl=impl)
            if inpaint_blend:
                img = image_latents.astype(dtype)
                noised = sched.add_noise(img, init_noise,
                                         jnp.maximum(next_t, 0))
                proper = jnp.where(next_t >= 0, noised, img)
                m = cond["mask_lat"].astype(jnp.float32)
                latents = ((1.0 - m) * proper.astype(jnp.float32)
                           + m * latents.astype(jnp.float32)).astype(dtype)
            return latents, None

        latents, _ = jax.lax.scan(body, latents,
                                  (ts, prev_ts, next_ts, step_noise))
        return latents

    # -- stage 3: decode -----------------------------------------------------

    def decode(self, params: dict, latents):
        images = vae_decode(params["vae"], self.models.vae_cfg, latents)
        return jnp.clip(images, -1.0, 1.0).astype(latents.dtype)

    # -- fused: the whole generation as one pure function (jittable) --------

    def generate(self, params: dict, rng, *,
                 person, mask, pose, cloth,
                 prompt_ids_l=None, prompt_ids_g=None,
                 neg_ids_l=None, neg_ids_g=None,
                 cloth_ids_l=None, cloth_ids_g=None,
                 ip_pixels=None,
                 prompt_embeds=None, pooled_prompt_embeds=None,
                 negative_prompt_embeds=None,
                 negative_pooled_prompt_embeds=None,
                 cloth_prompt_embeds=None,
                 masked_image_latents=None,
                 timesteps=None,
                 eta: float = 0.0,
                 num_steps: int = 30,
                 guidance_scale: float = 2.0,
                 guidance_rescale: float = 0.0,
                 strength: float = 1.0,
                 garment_cache: str = "every_step",
                 inpaint_blend: bool = False,
                 init_noise=None, step_noise=None,
                 vae_sample: bool = True,
                 impl: Optional[str] = None,
                 micro_conditioning: Optional[dict] = None,
                 num_images_per_prompt: int = 1,
                 clip_skip: Optional[int] = None,
                 denoising_start: Optional[float] = None,
                 denoising_end: Optional[float] = None,
                 latents_in=None,
                 output_type: str = "image"):
        """Returns images (B*num_images_per_prompt, H, W, 3) in [-1, 1].

        init_noise / step_noise: golden-parity noise injection (see denoise).
        vae_sample=False: deterministic (posterior-mode) VAE encodes for
        golden fixtures. micro_conditioning: make_time_ids kwargs
        (original_size / crops / target_size etc., reference
        src/tryon_pipeline.py:1366-1383).
        num_images_per_prompt: conditioning replicated per prompt (reference
        :710-730); injected noises must already be (B*n, ...)-shaped.
        clip_skip / denoising_start / denoising_end / latents_in: see
        encode_prompt_sdxl / denoise.
        prompt_embeds/pooled_prompt_embeds/negative_*/cloth_prompt_embeds/
        masked_image_latents: precomputed-conditioning passthrough (see
        encode_conditioning). timesteps: explicit schedule (see denoise).
        eta: accepted for signature parity (tryon_pipeline.py:1273); the
        reference's prepare_extra_step_kwargs (:746) drops it for DDPM
        (eta is DDIM-only), so it is inert here too.
        output_type: "image" (default, VAE-decoded [-1, 1]) or "latent"
        (skip the decode and return the raw latents — the reference's
        output_type='latent' base→refiner handoff,
        src/tryon_pipeline.py:1868-1870; feed them to a successor run's
        ``latents_in`` with denoising_start = this run's denoising_end).
        """
        denoising_start, denoising_end = check_denoising_range(
            denoising_start, denoising_end)
        m = self.models
        b, img_h, img_w, _ = person.shape
        lat_h, lat_w = img_h // m.vae_cfg.downscale, img_w // m.vae_cfg.downscale
        cond_rng, denoise_rng = jax.random.split(rng)
        cond = self.encode_conditioning(
            params, cond_rng, person=person, mask=mask, pose=pose, cloth=cloth,
            prompt_ids_l=prompt_ids_l, prompt_ids_g=prompt_ids_g,
            neg_ids_l=neg_ids_l, neg_ids_g=neg_ids_g,
            cloth_ids_l=cloth_ids_l, cloth_ids_g=cloth_ids_g,
            ip_pixels=ip_pixels, vae_sample=vae_sample,
            micro_conditioning=micro_conditioning, clip_skip=clip_skip,
            prompt_embeds=prompt_embeds,
            pooled_prompt_embeds=pooled_prompt_embeds,
            negative_prompt_embeds=negative_prompt_embeds,
            negative_pooled_prompt_embeds=negative_pooled_prompt_embeds,
            cloth_prompt_embeds=cloth_prompt_embeds,
            masked_image_latents=masked_image_latents)
        cond = replicate_cond(cond, num_images_per_prompt)
        image_latents = None
        if strength < 1.0 or inpaint_blend or denoising_start is not None:
            # sampled person-image latents (reference _encode_vae_image,
            # tryon_pipeline.py:913-933); keyed off the parent rng so the
            # default (strength=1) RNG stream is unchanged
            image_latents = vae_encode(params["vae"], m.vae_cfg, person,
                                       rng=jax.random.fold_in(rng, 7),
                                       sample=vae_sample)
            image_latents = jnp.repeat(image_latents, num_images_per_prompt,
                                       axis=0)
        latents = self.denoise(
            params, denoise_rng, cond,
            latent_shape=(b * num_images_per_prompt, lat_h, lat_w,
                          m.vae_cfg.latent_channels),
            num_steps=num_steps, guidance_scale=guidance_scale,
            guidance_rescale=guidance_rescale, strength=strength,
            dtype=person.dtype, garment_cache=garment_cache,
            image_latents=image_latents, inpaint_blend=inpaint_blend,
            init_noise=init_noise, step_noise=step_noise,
            denoising_start=denoising_start, denoising_end=denoising_end,
            latents_in=latents_in, timesteps=timesteps, impl=impl)
        if output_type == "latent":
            return latents
        return self.decode(params, latents)

    def jit_generate(self, *, num_steps: int = 30, guidance_scale: float = 2.0,
                     guidance_rescale: float = 0.0, strength: float = 1.0,
                     inpaint_blend: bool = False, vae_sample: bool = True,
                     impl: Optional[str] = None, donate: bool = False,
                     micro_conditioning: Optional[dict] = None,
                     num_images_per_prompt: int = 1,
                     clip_skip: Optional[int] = None,
                     denoising_start: Optional[float] = None,
                     denoising_end: Optional[float] = None,
                     output_type: str = "image",
                     timesteps=None):
        """Returns jitted fn(params, rng, **tensor_kwargs) -> images —
        everything (encoders, 30-step scan, decode) in ONE program.
        Accepts optional init_noise=/step_noise= (golden parity),
        latents_in= (denoising_start handoff), and the precomputed-
        conditioning passthrough (prompt_embeds & co, masked_image_latents)
        as tensor kwargs. output_type="latent" skips the decode (refiner
        handoff); timesteps= is the explicit-schedule list (both static,
        see generate)."""
        gen = functools.partial(
            self.generate, num_steps=num_steps, guidance_scale=guidance_scale,
            guidance_rescale=guidance_rescale, strength=strength,
            inpaint_blend=inpaint_blend, vae_sample=vae_sample, impl=impl,
            micro_conditioning=micro_conditioning,
            num_images_per_prompt=num_images_per_prompt, clip_skip=clip_skip,
            denoising_start=denoising_start, denoising_end=denoising_end,
            output_type=output_type,
            timesteps=tuple(timesteps) if timesteps is not None else None)
        return jax.jit(gen)

    def stepwise_generate(self, *, num_steps: int = 30,
                          guidance_scale: float = 2.0,
                          guidance_rescale: float = 0.0,
                          strength: float = 1.0,
                          garment_cache: str = "every_step",
                          inpaint_blend: bool = False,
                          vae_sample: bool = True,
                          impl: Optional[str] = None,
                          micro_conditioning: Optional[dict] = None,
                          num_images_per_prompt: int = 1,
                          clip_skip: Optional[int] = None,
                          denoising_start: Optional[float] = None,
                          denoising_end: Optional[float] = None,
                          callback_on_step_end=None,
                          output_type: str = "image",
                          timesteps=None):
        """Returns fn(params, rng, **tensor_kwargs) -> images built from
        small jitted programs: staged per-tower encode, a python loop over
        the jitted denoise step (donated latents), jitted decode.

        Preferred for serving on one chip: identical math to generate(), but
        each program compiles in ~1-2 min (the fused scan takes far longer
        through a remote-compile path) and conditioning tensors stay small.

        Optional tensor kwargs init_noise= / step_noise= inject the initial
        and per-step DDPM noises (golden-parity hook, SURVEY §7); latents_in=
        is the denoising_start handoff (see denoise). With denoising_start
        set and latents_in omitted, the initial latents are the person-image
        VAE latents UN-noised — same as generate() and the reference's
        prepare_latents(add_noise=False) fallback (tryon_pipeline.py:1609);
        callers chaining a real base→refiner handoff must pass latents_in.
        output_type="latent" skips the decode (refiner handoff, see
        generate).

        callback_on_step_end(pipeline, i, t, {"latents": lat}) runs on the
        HOST after each denoise step, mirroring the reference's hook
        (src/tryon_pipeline.py:1840-1845); a returned dict may override
        "latents". Only available here — the fused generate() traces the
        loop as one lax.scan, where a host callback cannot run.
        """
        m = self.models
        sched = self.scheduler
        encode = self.staged_encoder(vae_sample=vae_sample,
                                     micro_conditioning=micro_conditioning,
                                     clip_skip=clip_skip)
        step = jax.jit(functools.partial(
            self.denoise_step, guidance_scale=guidance_scale,
            guidance_rescale=guidance_rescale, impl=impl),
            donate_argnums=(2,))
        feats_fn = jax.jit(functools.partial(self.garment_features, impl=impl))
        decode = jax.jit(self.decode)
        vae_enc = jax.jit(lambda p, x, r: vae_encode(p["vae"], m.vae_cfg, x,
                                                     rng=r,
                                                     sample=vae_sample))
        blend = jax.jit(lambda lat, img, noise, mask, next_t: (
            (1.0 - mask.astype(jnp.float32))
            * jnp.where(next_t >= 0,
                        sched.add_noise(img, noise, jnp.maximum(next_t, 0)),
                        img).astype(jnp.float32)
            + mask.astype(jnp.float32) * lat.astype(jnp.float32)
        ).astype(lat.dtype))

        import numpy as np
        denoising_start, denoising_end = check_denoising_range(
            denoising_start, denoising_end)
        ts_j, prev_j = sched.timesteps_and_prev(
            num_steps, strength, denoising_start, denoising_end,
            custom_timesteps=timesteps)
        ts, prev_ts = np.asarray(ts_j), np.asarray(prev_j)

        def fn(params, rng, *, init_noise=None, step_noise=None,
               latents_in=None, **inputs):
            b, img_h, img_w, _ = inputs["person"].shape
            n_img = num_images_per_prompt
            lat_h = img_h // m.vae_cfg.downscale
            lat_w = img_w // m.vae_cfg.downscale
            lshape = (b * n_img, lat_h, lat_w, m.vae_cfg.latent_channels)
            dtype = inputs["person"].dtype
            cond_rng, init_rng, steps_rng = jax.random.split(rng, 3)
            cond = replicate_cond(encode(params, cond_rng, inputs), n_img)
            if init_noise is None:
                init_noise = jax.random.normal(init_rng, lshape, jnp.float32)
            init_noise = init_noise.astype(dtype)
            image_lat = None
            if strength < 1.0 or inpaint_blend or denoising_start is not None:
                image_lat = jnp.repeat(
                    vae_enc(params, inputs["person"],
                            jax.random.fold_in(rng, 7)), n_img, axis=0)
            if denoising_start is not None:
                start = latents_in if latents_in is not None else image_lat
                lat = start.astype(dtype)
            elif strength >= 1.0:
                lat = init_noise * sched.init_noise_sigma
            else:
                lat = sched.add_noise(image_lat.astype(dtype), init_noise,
                                      jnp.int32(ts[0]))
            step_rngs = jax.random.split(steps_rng, len(ts))
            feats = None
            if garment_cache == "once":
                feats = feats_fn(params, cond,
                                 jnp.int32(ts[len(ts) // 2]))
            for i in range(len(ts)):
                noise_i = None if step_noise is None else \
                    step_noise[i].astype(dtype)
                lat = step(params, cond, lat, jnp.int32(ts[i]),
                           jnp.int32(prev_ts[i]), step_rngs[i],
                           feats_cfg=feats, step_noise=noise_i)
                if inpaint_blend:
                    next_t = jnp.int32(ts[i + 1] if i + 1 < len(ts) else -1)
                    lat = blend(lat, image_lat.astype(dtype), init_noise,
                                cond["mask_lat"], next_t)
                if callback_on_step_end is not None:
                    cb_out = callback_on_step_end(
                        self, i, int(ts[i]), {"latents": lat}) or {}
                    lat = cb_out.pop("latents", lat)
            if output_type == "latent":
                return lat
            return decode(params, lat)

        return fn
