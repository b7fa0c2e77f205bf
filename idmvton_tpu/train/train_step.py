"""Fine-tuning: DDPM noise-prediction MSE on TryonNet (+ Resampler), all
other towers frozen — the reference trains only the hacked UNet (its
encoder_hid_proj Resampler is part of it) with GarmentNet/VAE/text/image
encoders frozen (reference: train_xl.py:389-394).

TPU-native training setup:
- trainable params stored fp32 (optimizer master weights), cast to the
  compute dtype inside the forward,
- ``jax.checkpoint`` (remat) on resnet/transformer blocks replaces torch
  gradient checkpointing (train_xl.py:407-409),
- data parallelism via batch sharding over the mesh 'data' axis — XLA inserts
  the gradient all-reduce (the reference's accelerate DDP, train_xl.py:468),
- optax AdamW(lr 1e-5, b1 0.9, b2 0.999, wd 1e-2) + global-norm clip 1.0
  (train_xl.py:270-274,283-286,752),
- optional min-SNR-gamma loss weighting (train_xl.py:726-742).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from idmvton_tpu.diffusion.scheduler import DDPMScheduler
from idmvton_tpu.models.unet import unet_apply
from idmvton_tpu.models.vae import vae_encode
from idmvton_tpu.models.clip import clip_vision_apply
from idmvton_tpu.models.resampler import resampler_apply
from idmvton_tpu.pipeline.tryon import TryonModels, encode_prompt_sdxl


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    trainable: dict          # {'unet': ..., 'resampler': ...} fp32
    opt_state: optax.OptState


def make_optimizer(learning_rate: float = 1e-5, weight_decay: float = 1e-2,
                   b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                   max_grad_norm: float = 1.0,
                   optimizer: str = "adamw",
                   accum_steps: int = 1) -> optax.GradientTransformation:
    """optimizer:
    - "adamw": fp32 moments (reference default, train_xl.py:421).
    - "adamw8bit": int8 block-quantized moments — the reference's
      bitsandbytes --use_8bit_adam analog (train_xl.py:412-420), 4x less
      optimizer-state HBM (train/quant_opt.py).
    - "adafactor": factored second moment (beyond-parity low-memory option).

    accum_steps > 1 enables gradient accumulation (the reference's
    accelerator.accumulate / --gradient_accumulation_steps,
    train_xl.py:265,491): gradients of accum_steps micro-batches are
    averaged, then clip + the update apply ONCE at the boundary — exactly
    the reference's clip-after-sync ordering. Under ZeRO-1 the accumulator
    leaves shard over the data axis like the moments (parallel/zero.py maps
    the whole opt_state tree).
    """
    if optimizer == "adamw8bit":
        from idmvton_tpu.train.quant_opt import adamw_int8
        inner = adamw_int8(learning_rate, b1=b1, b2=b2, eps=eps,
                           weight_decay=weight_decay)
    elif optimizer == "adafactor":
        inner = optax.adafactor(learning_rate)
    elif optimizer == "adamw":
        inner = optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps,
                            weight_decay=weight_decay)
    else:
        raise ValueError(optimizer)
    tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), inner)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


def init_train_state(models: TryonModels,
                     tx: optax.GradientTransformation) -> TrainState:
    trainable = {
        "unet": jax.tree_util.tree_map(lambda x: x.astype(jnp.float32),
                                       models.unet),
        "resampler": jax.tree_util.tree_map(lambda x: x.astype(jnp.float32),
                                            models.resampler),
    }
    return TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                      opt_state=tx.init(trainable))


def tryon_loss(trainable: dict, models: TryonModels, scheduler: DDPMScheduler,
               batch: dict, rng, *, snr_gamma: Optional[float] = None,
               compute_dtype=jnp.bfloat16, impl: Optional[str] = None,
               remat: bool = True, vae_sample: bool = True):
    """One training loss evaluation (reference loop body: train_xl.py:598-742).

    batch keys: person, mask, pose, cloth (B,H,W,C in [-1,1] / mask {0,1});
    prompt_ids_l/g, cloth_ids_l/g; ip_pixels. Optional "noise" (B,lh,lw,4
    fp32) and "timesteps" (B, int32) override the in-loss random draws
    (deterministic tests, e.g. grad-accumulation exactness).
    """
    m = models
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(compute_dtype) if x.dtype == jnp.float32 else x, t)
    params = {
        "unet": cast(trainable["unet"]),
        "resampler": cast(trainable["resampler"]),
        "garm": m.garm, "vae": m.vae, "clip_l": m.clip_l, "clip_g": m.clip_g,
        "vision": m.vision,
    }
    person = batch["person"].astype(compute_dtype)
    mask = batch["mask"].astype(compute_dtype)
    pose = batch["pose"].astype(compute_dtype)
    cloth = batch["cloth"].astype(compute_dtype)
    b = person.shape[0]
    rngs = jax.random.split(rng, 6)

    # frozen encoders
    venc = functools.partial(vae_encode, sample=vae_sample)
    model_input = venc(params["vae"], m.vae_cfg, person, rng=rngs[0])
    masked = person * (mask < 0.5).astype(compute_dtype)
    masked_lat = venc(params["vae"], m.vae_cfg, masked, rng=rngs[1])
    pose_lat = venc(params["vae"], m.vae_cfg, pose, rng=rngs[2])
    cloth_lat = venc(params["vae"], m.vae_cfg, cloth, rng=rngs[3])
    lh, lw = model_input.shape[1:3]
    mask_lat = jax.image.resize(mask, (b, lh, lw, 1), "nearest")

    prompt_embeds, pooled = encode_prompt_sdxl(
        m, params, batch["prompt_ids_l"], batch["prompt_ids_g"])
    cloth_embeds, _ = encode_prompt_sdxl(
        m, params, batch["cloth_ids_l"], batch["cloth_ids_g"])
    vis = clip_vision_apply(params["vision"], m.vision_cfg, batch["ip_pixels"].astype(compute_dtype))

    # trainable resampler -> ip tokens appended to text context
    ip_tokens = resampler_apply(params["resampler"], m.resampler_cfg,
                                vis["penultimate"])
    context = jnp.concatenate([prompt_embeds, ip_tokens], axis=1)

    # noise + uniform timesteps (train_xl.py:619-627)
    noise = batch.get("noise")
    if noise is None:
        noise = jax.random.normal(rngs[4], model_input.shape, jnp.float32)
    t = batch.get("timesteps")
    if t is None:
        t = jax.random.randint(rngs[5], (b,), 0,
                               scheduler.cfg.num_train_timesteps)
    noisy = scheduler.add_noise(model_input, noise.astype(compute_dtype), t)

    unet_in = jnp.concatenate([noisy, mask_lat, masked_lat, pose_lat], axis=-1)

    # GarmentNet: cond batch only, no CFG zeros at train (train_xl.py:707-708)
    _, feats = unet_apply(params["garm"], m.garm_cfg, cloth_lat, t,
                          cloth_embeds, impl=impl, remat=remat)

    h, w = person.shape[1:3]
    time_ids = jnp.tile(
        jnp.asarray([h, w, 0, 0, h, w], compute_dtype)[None], (b, 1))
    pred, _ = unet_apply(params["unet"], m.unet_cfg, unet_in, t, context,
                         added_cond=(pooled, time_ids),
                         garment_features=feats, impl=impl, remat=remat)

    pt = scheduler.cfg.prediction_type
    if pt == "epsilon":
        target = noise
    elif pt == "v_prediction":
        target = scheduler.get_velocity(model_input, noise.astype(compute_dtype), t).astype(jnp.float32)
    elif pt == "sample":
        # reference subtracts the noise residual from the prediction before
        # comparing to the clean latents (train_xl.py:718-721)
        target = model_input.astype(jnp.float32)
        pred = pred.astype(jnp.float32) - noise
    else:
        raise ValueError(pt)

    err = (pred.astype(jnp.float32) - target) ** 2
    per_example = jnp.mean(err, axis=(1, 2, 3))
    if snr_gamma is not None:
        snr = scheduler.snr(t)
        if pt == "v_prediction":
            # shift snr by +1 BEFORE both the min and the division
            # (reference train_xl.py:732-737 divides min(snr+1, g) by
            # snr+1, not min(snr, g)); epsilon AND sample use plain snr
            snr_v = snr + 1.0
            weight = jnp.minimum(snr_v, snr_gamma) / snr_v
        else:
            weight = jnp.minimum(snr, snr_gamma) / jnp.maximum(snr, 1e-8)
        per_example = per_example * weight
    return jnp.mean(per_example)


def make_train_step(models: TryonModels, scheduler: DDPMScheduler,
                    tx: optax.GradientTransformation, *,
                    snr_gamma: Optional[float] = None,
                    compute_dtype=jnp.bfloat16,
                    impl: Optional[str] = None, remat: bool = True,
                    vae_sample: bool = True):
    """Returns jittable fn(state, batch, rng) -> (state, metrics). Under a
    batch-sharded mesh, XLA emits the psum gradient all-reduce over ICI.
    With a MultiSteps tx (make_optimizer accum_steps>1) each call is a
    micro-step; params change only at the accumulation boundary."""

    loss_fn = functools.partial(
        tryon_loss, models=models, scheduler=scheduler, snr_gamma=snr_gamma,
        compute_dtype=compute_dtype, impl=impl, remat=remat,
        vae_sample=vae_sample)

    def train_step(state: TrainState, batch: dict, rng):
        loss, grads = jax.value_and_grad(
            lambda tr: loss_fn(tr, batch=batch, rng=rng))(state.trainable)
        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        gnorm = optax.global_norm(grads)
        new_state = TrainState(step=state.step + 1, trainable=trainable,
                               opt_state=opt_state)
        return new_state, {"loss": loss, "grad_norm": gnorm}

    return train_step
