"""Fine-tuning CLI (reference: train_xl.py main(), :301-797).

Trains TryonNet (+Resampler) with everything else frozen, DDPM noise-pred
MSE, optional min-SNR, remat, AdamW(1e-5), grad clip 1.0, data parallel over
all local devices, periodic orbax checkpoints.

Usage:
  python -m idmvton_tpu.cli.train --data_dir /path/VITON-HD \\
      --output_dir ckpt_out --train_batch_size 6 --max_steps 1000
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
import jax
import jax.numpy as jnp


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="idmvton_tpu fine-tuning")
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", default="ckpt_out")
    p.add_argument("--pretrained", default=None)
    p.add_argument("--diffusers", action="store_true")
    p.add_argument("--tokenizer_dir", default=None)
    p.add_argument("--width", type=int, default=768)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--train_batch_size", type=int, default=6,
                   help="per-device batch (reference: 6, train_xl.sh)")
    p.add_argument("--gradient_accumulation_steps", type=int, default=1,
                   help="average gradients over N micro-batches before each "
                        "optimizer step (reference train_xl.py:265,491)")
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--weight_decay", type=float, default=1e-2)
    p.add_argument("--adam_beta1", type=float, default=0.9,
                   help="AdamW beta1 (reference train_xl.py:283)")
    p.add_argument("--adam_beta2", type=float, default=0.999,
                   help="AdamW beta2 (reference train_xl.py:284)")
    p.add_argument("--adam_epsilon", type=float, default=1e-8,
                   help="AdamW epsilon (reference train_xl.py:286)")
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--snr_gamma", type=float, default=None)
    p.add_argument("--optimizer", default="adamw",
                   choices=["adamw", "adamw8bit", "adafactor"],
                   help="adamw8bit = int8-moment AdamW (reference "
                        "--use_8bit_adam, train_xl.py:412-420)")
    p.add_argument("--eval_steps", type=int, default=None,
                   help="run try-on inference on one test batch every N "
                        "steps, saving {step}_{i}_test.jpg to output_dir "
                        "(reference train_xl.py:492-594)")
    p.add_argument("--num_inference_steps", type=int, default=30)
    p.add_argument("--guidance_scale", type=float, default=2.0)
    p.add_argument("--test_batch_size", type=int, default=2)
    p.add_argument("--no_aug", action="store_true",
                   help="disable color-jitter/affine train augs "
                        "(train_xl.py:152-216)")
    p.add_argument("--num_train_epochs", type=int, default=130)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--checkpointing_steps", type=int, default=1000)
    p.add_argument("--logging_steps", type=int, default=50)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--no_remat", action="store_true")
    p.add_argument("--zero1", action="store_true",
                   help="partition the AdamW moments over the data axis "
                        "(ZeRO stage 1, parallel/zero.py) — ~2x params of "
                        "optimizer HBM saved per chip at dp>=2")
    p.add_argument("--tiny", action="store_true",
                   help="tiny random models (smoke tests)")
    p.add_argument("--micro", action="store_true",
                   help="micro random models (mechanics tests: smallest "
                        "stack that exercises every block kind)")
    p.add_argument("--resume_from_checkpoint", default=None,
                   help="train-state dir written by --state_dir")
    p.add_argument("--state_dir", default=None,
                   help="where to save resumable train state (default: "
                        "output_dir/state)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    dtype = jnp.bfloat16

    from idmvton_tpu.core.config import SchedulerConfig
    from idmvton_tpu.diffusion.scheduler import DDPMScheduler
    from idmvton_tpu.pipeline.tryon import TryonModels
    from idmvton_tpu.train.train_step import (
        make_optimizer, init_train_state, make_train_step,
    )
    from idmvton_tpu.parallel.mesh import make_mesh, shard_batch, replicated
    from idmvton_tpu.data.datasets import VitonHDDataset, BatchLoader
    from idmvton_tpu.data.tokenizer import load_tokenizers
    from idmvton_tpu.weights.checkpoint import (
        save_pipeline, load_pipeline, from_diffusers,
        save_train_state, load_train_state, latest_train_state_step,
    )

    if args.pretrained and args.diffusers:
        models = from_diffusers(args.pretrained, dtype)
    elif args.pretrained:
        models = load_pipeline(args.pretrained, dtype)
    else:
        models = TryonModels.init(jax.random.PRNGKey(0), tiny=args.tiny,
                                  micro=args.micro, dtype=dtype)

    sched = DDPMScheduler(SchedulerConfig.train())
    tx = make_optimizer(args.learning_rate, args.weight_decay,
                        b1=args.adam_beta1, b2=args.adam_beta2,
                        eps=args.adam_epsilon,
                        max_grad_norm=args.max_grad_norm,
                        optimizer=args.optimizer,
                        accum_steps=args.gradient_accumulation_steps)
    state = init_train_state(models, tx)
    raw_step = make_train_step(models, sched, tx,
                               snr_gamma=args.snr_gamma,
                               compute_dtype=dtype,
                               remat=not args.no_remat)

    state_dir = args.state_dir or os.path.join(args.output_dir, "state")
    if args.resume_from_checkpoint:
        step0 = latest_train_state_step(args.resume_from_checkpoint)
        if step0 is not None:
            state = load_train_state(args.resume_from_checkpoint, state)
            print(f"resumed from {args.resume_from_checkpoint} step {step0}")

    mesh = make_mesh()
    n_dev = len(jax.devices())
    if args.zero1 and n_dev > 1:
        from idmvton_tpu.parallel.zero import zero1_state_sharding
        shardings = zero1_state_sharding(state, mesh)
        state = jax.device_put(state, shardings)
        step_fn = jax.jit(raw_step, out_shardings=(shardings, None))
    else:
        state = jax.device_put(state, replicated(mesh))
        step_fn = jax.jit(raw_step)
    global_batch = args.train_batch_size * n_dev

    tok_dir = args.tokenizer_dir or (args.pretrained if args.diffusers else None)
    tok1, tok2 = load_tokenizers(
        os.path.join(tok_dir, "tokenizer") if tok_dir else None,
        os.path.join(tok_dir, "tokenizer_2") if tok_dir else None)

    ds = VitonHDDataset(args.data_dir, phase="train",
                        size=(args.height, args.width), hflip_prob=0.5,
                        aug_color_jitter=not args.no_aug,
                        aug_affine=not args.no_aug,
                        seed=args.seed)
    loader = BatchLoader(ds, global_batch, shuffle=True, drop_last=True,
                         seed=args.seed)

    def run_eval(state, gstep):
        """In-train try-on eval on one test batch: builds a pipeline around
        the CURRENT trained unet+resampler and saves {step}_{i}_test.jpg
        (reference train_xl.py:492-594)."""
        from idmvton_tpu.pipeline.tryon import TryonPipeline
        from idmvton_tpu.data.image import save_image
        try:
            test_ds = VitonHDDataset(args.data_dir, phase="test",
                                     size=(args.height, args.width))
        except FileNotFoundError:
            print("eval skipped: no test split found")
            return
        trained = models.with_params({
            "unet": jax.tree_util.tree_map(
                lambda x: x.astype(dtype), state.trainable["unet"]),
            "resampler": jax.tree_util.tree_map(
                lambda x: x.astype(dtype), state.trainable["resampler"]),
        })
        pipe = TryonPipeline(trained, DDPMScheduler(
            SchedulerConfig.sdxl_inference()))
        gen = (pipe.stepwise_generate if jax.default_backend() == "tpu"
               else pipe.jit_generate)(
            num_steps=args.num_inference_steps,
            guidance_scale=args.guidance_scale)
        for batch in BatchLoader(test_ds, args.test_batch_size):
            b = batch["person"].shape[0]
            neg = ["monochrome, lowres, bad anatomy, worst quality, "
                   "low quality"] * b
            isz = models.vision_cfg.image_size
            ip = batch["ip_pixels"]
            if ip.shape[1] != isz:
                ip = jax.image.resize(jnp.asarray(ip), (b, isz, isz, 3),
                                      "bilinear")
            images = gen(trained.params(), jax.random.PRNGKey(args.seed),
                         person=jnp.asarray(batch["person"], dtype),
                         mask=jnp.asarray(batch["mask"], dtype),
                         pose=jnp.asarray(batch["pose"], dtype),
                         cloth=jnp.asarray(batch["cloth"], dtype),
                         ip_pixels=jnp.asarray(ip, dtype),
                         prompt_ids_l=jnp.asarray(tok1(batch["caption"])),
                         prompt_ids_g=jnp.asarray(tok2(batch["caption"])),
                         neg_ids_l=jnp.asarray(tok1(neg)),
                         neg_ids_g=jnp.asarray(tok2(neg)),
                         cloth_ids_l=jnp.asarray(tok1(batch["caption_cloth"])),
                         cloth_ids_g=jnp.asarray(tok2(batch["caption_cloth"])))
            save_image(np.asarray(images),
                       [os.path.join(args.output_dir,
                                     f"{gstep}_{i}_test.jpg")
                        for i in range(b)])
            break  # one batch, like the reference
        print(f"eval images -> {args.output_dir}/{gstep}_*_test.jpg")

    rng = jax.random.PRNGKey(args.seed)
    # state.step counts MICRO-steps (one per train_step call); the logging /
    # eval / checkpoint cadence and max_steps count OPTIMIZER steps like the
    # reference's global_step, which advances once per accumulation boundary
    # (train_xl.py:744-747 under accelerator.accumulate sync)
    accum = max(1, args.gradient_accumulation_steps)
    micro = int(state.step)
    gstep = micro // accum
    t0 = time.time()
    for epoch in range(args.num_train_epochs):
        for batch in loader:
            ip = batch["ip_pixels"]
            isz = models.vision_cfg.image_size
            if ip.shape[1] != isz:
                ip = jax.image.resize(jnp.asarray(ip),
                                      (ip.shape[0], isz, isz, 3), "bilinear")
            jb = dict(
                person=jnp.asarray(batch["person"], dtype),
                mask=jnp.asarray(batch["mask"], dtype),
                pose=jnp.asarray(batch["pose"], dtype),
                cloth=jnp.asarray(batch["cloth"], dtype),
                ip_pixels=jnp.asarray(ip, dtype),
                prompt_ids_l=jnp.asarray(tok1(batch["caption"])),
                prompt_ids_g=jnp.asarray(tok2(batch["caption"])),
                cloth_ids_l=jnp.asarray(tok1(batch["caption_cloth"])),
                cloth_ids_g=jnp.asarray(tok2(batch["caption_cloth"])),
            )
            jb = shard_batch(jb, mesh)
            rng, srng = jax.random.split(rng)
            state, metrics = step_fn(state, jb, srng)
            micro += 1
            if micro % accum:
                continue  # mid-accumulation: params unchanged, no cadence
            gstep = micro // accum
            if gstep % args.logging_steps == 0:
                loss = float(metrics["loss"])
                ips = (global_batch * accum * args.logging_steps
                       / (time.time() - t0))
                t0 = time.time()
                print(f"epoch {epoch} step {gstep}: loss {loss:.4f} "
                      f"grad_norm {float(metrics['grad_norm']):.3f} "
                      f"({ips:.2f} img/s)")
            if args.eval_steps and gstep % args.eval_steps == 0:
                os.makedirs(args.output_dir, exist_ok=True)
                run_eval(state, gstep)
            if gstep % args.checkpointing_steps == 0 or \
                    (args.max_steps and gstep >= args.max_steps):
                out = os.path.join(args.output_dir, f"step_{gstep}")
                trained = models.with_params({
                    "unet": jax.tree_util.tree_map(
                        lambda x: x.astype(dtype), state.trainable["unet"]),
                    "resampler": jax.tree_util.tree_map(
                        lambda x: x.astype(dtype), state.trainable["resampler"]),
                })
                save_pipeline(out, trained)
                save_train_state(state_dir, state)
                print(f"checkpoint -> {out} (+ train state {state_dir})")
            if args.max_steps and gstep >= args.max_steps:
                return


if __name__ == "__main__":
    main()
