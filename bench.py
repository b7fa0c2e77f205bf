"""Benchmark: VITON-HD try-on inference at the reference operating point —
768x1024, 30 denoise steps, CFG 2.0, batch 2 (reference: inference.py:53-61,
BASELINE.md) — on one TPU chip, random weights (FLOPs are weight-agnostic).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}

Baseline: the reference publishes no numbers (BASELINE.md); the comparison
point is the BASELINE.json north star "A100-class images/sec/chip". A100
SDXL-inpainting with a second full UNet forward per step at fp16/batch 2 runs
~4 s/image (~0.25 img/s) — used as the denominator.

Structure:
- staged (encode -> denoise -> decode) so encoder tower weights can drop out
  of HBM before the 10.3 GB dual-UNet denoise phase (16 GB v5e);
- the denoise STEP is jitted and python-looped (dispatch overhead is
  negligible at ~0.5 s/step; compiling the full 30-step scan through the
  remote-compile tunnel takes tens of minutes vs ~2 min for the step);
- params come from the fused flat-buffer initializer (utils/fast_init.py).
"""

import json
import os
import sys
import time

import jax

if os.environ.get("BENCH_PLATFORM"):
    # sitecustomize pre-imports jax with the axon TPU platform; env
    # JAX_PLATFORMS alone is too late for this process.
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_IMG_PER_SEC = 0.25  # est. A100-class at this operating point

TINY = os.environ.get("BENCH_TINY") == "1"
BATCH = int(os.environ.get("BENCH_BATCH", "2"))
STEPS = int(os.environ.get("BENCH_STEPS", "30"))
REPS = int(os.environ.get("BENCH_REPS", "2"))
IMPL = os.environ.get("BENCH_IMPL")  # None -> auto (pallas on tpu)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from idmvton_tpu.core.config import (
        SchedulerConfig, UNetConfig, VAEConfig, CLIPTextConfig,
        CLIPVisionConfig, ResamplerConfig,
    )
    from idmvton_tpu.diffusion.scheduler import DDPMScheduler
    from idmvton_tpu.models.unet import init_unet
    from idmvton_tpu.models.vae import init_vae
    from idmvton_tpu.models.clip import init_clip_text, init_clip_vision
    from idmvton_tpu.models.resampler import init_resampler
    from idmvton_tpu.pipeline.tryon import TryonModels, TryonPipeline
    from idmvton_tpu.utils.fast_init import fast_random_params

    dtype = jnp.bfloat16
    if TINY:
        b, img_h, img_w = 2, 64, 64
        models = TryonModels.init(jax.random.PRNGKey(0), tiny=True, dtype=dtype)
        params = models.params()
    else:
        b, img_h, img_w = BATCH, 1024, 768
        cfgs = dict(
            unet_cfg=UNetConfig.sdxl_tryon(), garm_cfg=UNetConfig.sdxl_garment(),
            vae_cfg=VAEConfig.sdxl(), clip_l_cfg=CLIPTextConfig.clip_l(),
            clip_g_cfg=CLIPTextConfig.clip_bigg(),
            vision_cfg=CLIPVisionConfig.vit_h(),
            resampler_cfg=ResamplerConfig.sdxl_plus(),
        )
        inits = dict(
            unet=lambda k: init_unet(k, cfgs["unet_cfg"], dtype=dtype),
            garm=lambda k: init_unet(k, cfgs["garm_cfg"], dtype=dtype),
            vae=lambda k: init_vae(k, cfgs["vae_cfg"], dtype=dtype),
            clip_l=lambda k: init_clip_text(k, cfgs["clip_l_cfg"], dtype=dtype),
            clip_g=lambda k: init_clip_text(k, cfgs["clip_g_cfg"], dtype=dtype),
            vision=lambda k: init_clip_vision(k, cfgs["vision_cfg"], dtype=dtype),
            resampler=lambda k: init_resampler(k, cfgs["resampler_cfg"], dtype=dtype),
        )
        key = jax.random.PRNGKey(0)
        keys = dict(zip(inits, jax.random.split(key, len(inits))))
        params = {}
        for name, fn in inits.items():
            t0 = time.time()
            params[name] = fast_random_params(keys[name], fn)
            jax.block_until_ready(params[name])
            log(f"init {name}: {time.time() - t0:.1f}s")
        models = TryonModels(**cfgs, **params)

    lat_h, lat_w = img_h // 8, img_w // 8
    sched = DDPMScheduler(SchedulerConfig.sdxl_inference())
    pipe = TryonPipeline(models, sched)

    ks = jax.random.split(jax.random.PRNGKey(1), 9)
    vocab = models.clip_l_cfg.vocab_size
    isz = models.vision_cfg.image_size
    seq = 77 if not TINY else 7
    inputs = dict(
        person=jax.random.uniform(ks[0], (b, img_h, img_w, 3), dtype, -1, 1),
        pose=jax.random.uniform(ks[1], (b, img_h, img_w, 3), dtype, -1, 1),
        cloth=jax.random.uniform(ks[2], (b, img_h, img_w, 3), dtype, -1, 1),
        mask=(jax.random.uniform(ks[3], (b, img_h, img_w, 1)) > 0.5).astype(dtype),
        prompt_ids_l=jax.random.randint(ks[4], (b, seq), 0, vocab),
        prompt_ids_g=jax.random.randint(ks[4], (b, seq), 0, vocab),
        neg_ids_l=jax.random.randint(ks[5], (b, seq), 0, vocab),
        neg_ids_g=jax.random.randint(ks[5], (b, seq), 0, vocab),
        cloth_ids_l=jax.random.randint(ks[6], (b, seq), 0, vocab),
        cloth_ids_g=jax.random.randint(ks[6], (b, seq), 0, vocab),
        ip_pixels=jax.random.uniform(ks[7], (b, isz, isz, 3), dtype, -1, 1),
    )

    encode = pipe.staged_encoder()
    step = jax.jit(
        lambda p, cond, lat, t, pt, r: pipe.denoise_step(
            p, cond, lat, t, pt, r, guidance_scale=2.0, impl=IMPL))
    decode = jax.jit(lambda p, lat: pipe.decode(p, lat))

    enc_params = {k: params[k]
                  for k in ("clip_l", "clip_g", "vision", "resampler", "vae")}
    unet_params = {"unet": params["unet"], "garm": params["garm"]}
    vae_params = {"vae": params["vae"]}

    import numpy as np
    ts = np.asarray(sched.timesteps(STEPS))
    prev_ts = np.asarray(sched.prev_timesteps(sched.timesteps(STEPS), STEPS))

    # ---- encode: compile, then time one clean pass, then FREE the encoder
    # towers (~2.8 GB) so the 10.3 GB dual-UNet phase fits in 16 GB HBM
    r_enc = jax.random.PRNGKey(9)
    t0 = time.time()
    cond = jax.block_until_ready(encode(enc_params, r_enc, inputs))
    log(f"encode compile+run: {time.time() - t0:.1f}s")
    t0 = time.time()
    cond = jax.block_until_ready(encode(enc_params, r_enc, inputs))
    t_encode = time.time() - t0
    log(f"encode: {t_encode:.2f}s")
    if not TINY:
        for name in ("clip_l", "clip_g", "vision", "resampler"):
            for leaf in jax.tree_util.tree_leaves(params[name]):
                leaf.delete()

    def run_denoise_decode(rng):
        r_init, r_steps = jax.random.split(rng)
        lat = jax.random.normal(r_init, (b, lat_h, lat_w, 4),
                                jnp.float32).astype(dtype)
        step_rngs = jax.random.split(r_steps, STEPS)
        for i in range(STEPS):
            lat = step(unet_params, cond, lat, jnp.int32(ts[i]),
                       jnp.int32(prev_ts[i]), step_rngs[i])
        img = decode(vae_params, lat)
        jax.block_until_ready(img)
        return img

    t0 = time.time()
    run_denoise_decode(jax.random.PRNGKey(10))
    log(f"denoise+decode compile+first run: {time.time() - t0:.1f}s")

    times = []
    for i in range(REPS):
        t0 = time.time()
        run_denoise_decode(jax.random.PRNGKey(11 + i))
        times.append(time.time() - t0)

    best = min(times) + t_encode
    img_per_sec = b / best
    result = {
        "metric": f"tryon_images_per_sec_per_chip_{img_w}x{img_h}_{STEPS}steps_cfg2_b{b}",
        "value": round(img_per_sec, 4),
        "unit": "img/s",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 3),
    }
    print(json.dumps(result))
    log(f"# times {['%.2f' % t for t in times]}; sec/img {best / b:.2f}; "
        f"backend {jax.default_backend()}")


if __name__ == "__main__":
    main()
