"""VITON-HD batch inference CLI (reference: inference.py main(), :201-426).

Usage:
  python -m idmvton_tpu.cli.infer --data_dir /path/VITON-HD \\
      --output_dir result --unpaired --num_inference_steps 30 \\
      --guidance_scale 2.0 --test_batch_size 2 [--pretrained <ckpt dir>]

Without --pretrained, runs random-init weights (shape/perf validation only).
With --pretrained pointing at an orbax checkpoint (weights/checkpoint.py) or
a diffusers layout (--diffusers), loads real weights.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
import jax
import jax.numpy as jnp


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="idmvton_tpu VITON-HD inference")
    p.add_argument("--data_dir", required=True)
    p.add_argument("--dataset", default="vitonhd", choices=["vitonhd", "dresscode"])
    p.add_argument("--category", default="upper_body",
                   choices=["upper_body", "lower_body", "dresses"],
                   help="DressCode category (reference: inference_dc.py)")
    p.add_argument("--output_dir", default="result")
    p.add_argument("--pretrained", default=None,
                   help="orbax checkpoint dir (or diffusers dir with --diffusers)")
    p.add_argument("--diffusers", action="store_true")
    p.add_argument("--tokenizer_dir", default=None,
                   help="dir with tokenizer/ tokenizer_2/ vocab files")
    p.add_argument("--unpaired", action="store_true")
    p.add_argument("--num_inference_steps", type=int, default=30)
    p.add_argument("--guidance_scale", type=float, default=2.0)
    p.add_argument("--strength", type=float, default=1.0,
                   help="denoise strength; <1 starts from noised person-image "
                        "latents (reference prepare_latents semantics)")
    p.add_argument("--width", type=int, default=768)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--test_batch_size", type=int, default=2)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--limit", type=int, default=None, help="max batches")
    p.add_argument("--tiny", action="store_true",
                   help="tiny random models (smoke tests)")
    return p.parse_args(argv)


def load_models(args, dtype):
    from idmvton_tpu.pipeline.tryon import TryonModels
    if args.pretrained and args.diffusers:
        from idmvton_tpu.weights.checkpoint import from_diffusers
        return from_diffusers(args.pretrained, dtype)
    if args.pretrained:
        from idmvton_tpu.weights.checkpoint import load_pipeline
        return load_pipeline(args.pretrained, dtype)
    return TryonModels.init(jax.random.PRNGKey(0), tiny=args.tiny, dtype=dtype)


def main(argv=None):
    args = parse_args(argv)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    from idmvton_tpu.core.config import SchedulerConfig
    from idmvton_tpu.diffusion.scheduler import DDPMScheduler
    from idmvton_tpu.pipeline.tryon import TryonPipeline
    from idmvton_tpu.data.datasets import VitonHDDataset, BatchLoader
    from idmvton_tpu.data.tokenizer import load_tokenizers
    from idmvton_tpu.data.image import save_image

    models = load_models(args, dtype)
    pipe = TryonPipeline(models, DDPMScheduler(SchedulerConfig.sdxl_inference()))

    tok_dir = args.tokenizer_dir or (args.pretrained if args.diffusers else None)
    tok1, tok2 = load_tokenizers(
        os.path.join(tok_dir, "tokenizer") if tok_dir else None,
        os.path.join(tok_dir, "tokenizer_2") if tok_dir else None)

    order = "unpaired" if args.unpaired else "paired"
    if args.dataset == "dresscode":
        from idmvton_tpu.data.dresscode import DressCodeDataset
        ds = DressCodeDataset(args.data_dir, category=args.category,
                              phase="test", order=order,
                              size=(args.height, args.width))
    else:
        ds = VitonHDDataset(args.data_dir, phase="test", order=order,
                            size=(args.height, args.width))
    loader = BatchLoader(ds, args.test_batch_size)
    os.makedirs(args.output_dir, exist_ok=True)

    # one fused program on CPU/small models; small per-stage programs on
    # TPU (the fused 30-step scan compiles impractically slowly there)
    if jax.default_backend() == "tpu":
        gen = pipe.stepwise_generate(num_steps=args.num_inference_steps,
                                     guidance_scale=args.guidance_scale,
                                     strength=args.strength)
    else:
        gen = pipe.jit_generate(num_steps=args.num_inference_steps,
                                guidance_scale=args.guidance_scale,
                                strength=args.strength)
    params = models.params()
    rng = jax.random.PRNGKey(args.seed)

    total, t_start = 0, time.time()
    for bi, batch in enumerate(loader):
        if args.limit is not None and bi >= args.limit:
            break
        b = batch["person"].shape[0]
        negative = ["monochrome, lowres, bad anatomy, worst quality, low quality"] * b
        isz = models.vision_cfg.image_size
        ip = batch["ip_pixels"]
        if ip.shape[1] != isz:
            ip = jax.image.resize(jnp.asarray(ip), (b, isz, isz, 3), "bilinear")
        inputs = dict(
            person=jnp.asarray(batch["person"], dtype),
            mask=jnp.asarray(batch["mask"], dtype),
            pose=jnp.asarray(batch["pose"], dtype),
            cloth=jnp.asarray(batch["cloth"], dtype),
            ip_pixels=jnp.asarray(ip, dtype),
            prompt_ids_l=jnp.asarray(tok1(batch["caption"])),
            prompt_ids_g=jnp.asarray(tok2(batch["caption"])),
            neg_ids_l=jnp.asarray(tok1(negative)),
            neg_ids_g=jnp.asarray(tok2(negative)),
            cloth_ids_l=jnp.asarray(tok1(batch["caption_cloth"])),
            cloth_ids_g=jnp.asarray(tok2(batch["caption_cloth"])),
        )
        rng, step_rng = jax.random.split(rng)
        images = gen(params, step_rng, **inputs)
        save_image(np.asarray(images),
                   [os.path.join(args.output_dir, n) for n in batch["im_name"]])
        total += b
        print(f"batch {bi}: {b} images "
              f"({total / (time.time() - t_start):.3f} img/s cumulative)")
    print(f"done: {total} images -> {args.output_dir}")


if __name__ == "__main__":
    main()
