"""Checkpoint IO.

- save/load the full model stack with orbax (TPU-native replacement for the
  reference's whole-pipeline diffusers save_pretrained, train_xl.py:770-792).
- ``from_diffusers`` builds a TryonModels from a diffusers-layout pretrained
  directory (the yisol/IDM-VTON hub layout inference.py:232-274 loads), via
  the torch->jax converters.
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from idmvton_tpu.core.config import (
    UNetConfig, VAEConfig, CLIPTextConfig, CLIPVisionConfig, ResamplerConfig,
)
from idmvton_tpu.pipeline.tryon import TryonModels
from idmvton_tpu.weights.converter import (
    load_state_dict, convert_unet, convert_vae, convert_clip_text,
    convert_clip_vision, convert_resampler,
)

_CFG_FIELDS = ("unet_cfg", "garm_cfg", "vae_cfg", "clip_l_cfg", "clip_g_cfg",
               "vision_cfg", "resampler_cfg")
_CFG_TYPES = (UNetConfig, UNetConfig, VAEConfig, CLIPTextConfig,
              CLIPTextConfig, CLIPVisionConfig, ResamplerConfig)


def _calibration_sites(models: TryonModels):
    """Yield (label, to_qkv kernel, heads) for every self-attention probe
    site: BOTH towers (the GarmentNet serves through the same fixed-shift
    flash kernel as the TryonNet), at the first attn-bearing down level AND
    the mid block (the deepest, widest-channel level — a finetune's hot
    logits can live at any depth or in either tower)."""
    for tower, cfg_field in (("unet", "unet_cfg"), ("garm", "garm_cfg")):
        params = getattr(models, tower)
        cfg = getattr(models, cfg_field)
        down = next((b for b in params["down_blocks"]
                     if "attentions" in b), None)
        mid = params.get("mid_block")
        for level, blk in (("down", down), ("mid", mid)):
            if blk is None or "attentions" not in blk:
                continue
            kernel = blk["attentions"][0]["blocks"][0]["attn1"]["to_qkv"][
                "kernel"]
            heads = (kernel.shape[1] // 3) // cfg.attention_head_dim
            yield f"{tower}.{level}", kernel, heads


def calibrate_attention_softmax(models: TryonModels, *, tol: float = 5e-3,
                                seq: int = 256, batch: int = 2,
                                seed: int = 0) -> Optional[dict]:
    """Load-time fixed-shift softmax guard for checkpoint bring-up (r4
    verdict #4): A/B the fixed-shift flash softmax against the exact
    online-max path on one batch of activations PROJECTED THROUGH the
    checkpoint's own self-attention to_qkv weights — probing BOTH towers at
    two depths each (r5: the single-site probe missed garment-tower /
    deep-level hot logits), then calibrating on the worst site, auto-forcing
    the exact path process-wide on breach (hot-logit finetunes no longer
    degrade silently).

    Runs BEFORE any serving program is jitted for the checkpoint — callers
    (from_diffusers / load_pipeline) invoke it right after conversion.
    Returns the calibrate report (plus per-site errors), or None when
    skipped (tiny geometries the flash kernel doesn't serve, or
    IDMVTON_CALIBRATE=0).
    """
    if os.environ.get("IDMVTON_CALIBRATE", "1") == "0":
        return None
    from idmvton_tpu.ops.pallas_attention import (
        calibrate_fixed_shift, fixed_shift_max_error,
        flash_attention_gemm_supported,
    )

    def qkv_for(kernel, seed_offset):
        x = jax.random.normal(jax.random.PRNGKey(seed + seed_offset),
                              (batch, seq, kernel.shape[0]),
                              jnp.float32).astype(kernel.dtype)
        return jnp.einsum("bnc,cd->bnd", x, kernel)

    errors = {}
    worst = None
    for i, (label, kernel, heads) in enumerate(_calibration_sites(models)):
        if not flash_attention_gemm_supported(kernel.shape[1] // 3, heads):
            continue  # tiny/test geometries run the XLA path anyway
        err = float(fixed_shift_max_error(qkv_for(kernel, i), heads=heads,
                                          block_q=128, block_kv=128))
        errors[label] = err
        if worst is None or err > errors[worst[0]]:
            worst = (label, kernel, heads, i)
    if worst is None:
        return None
    # one calibrate call on the worst site sets/clears the force-off flag
    # atomically (sequential per-site calibrates would let a later clean
    # site RESET a breach found earlier)
    label, kernel, heads, i = worst
    report = calibrate_fixed_shift(qkv_for(kernel, i), heads=heads, tol=tol,
                                   block_q=128, block_kv=128)
    report["site_errors"] = errors
    report["worst_site"] = label
    import logging
    logging.getLogger(__name__).info(
        "fixed-shift softmax calibration: worst site %s max_error %.3g "
        "(sites %s), fixed_shift=%s", label, report["max_error"], errors,
        report["fixed_shift"])
    return report


def save_pipeline(path: str, models: TryonModels):
    import orbax.checkpoint as ocp
    os.makedirs(path, exist_ok=True)
    cfgs = {f: dataclasses.asdict(getattr(models, f)) for f in _CFG_FIELDS}
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfgs, f, indent=2)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(os.path.abspath(path), "params"), models.params(),
               force=True)


def load_pipeline(path: str, dtype=jnp.bfloat16, *,
                  calibrate: bool = True) -> TryonModels:
    import orbax.checkpoint as ocp
    with open(os.path.join(path, "config.json")) as f:
        cfgs = json.load(f)
    kw = {}
    for field, typ in zip(_CFG_FIELDS, _CFG_TYPES):
        d = cfgs[field]
        for k, v in list(d.items()):
            if isinstance(v, list):
                d[k] = tuple(v)
        kw[field] = typ(**d)
    ckptr = ocp.PyTreeCheckpointer()
    params = ckptr.restore(os.path.join(os.path.abspath(path), "params"))
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, dtype) if jnp.asarray(x).dtype in
        (jnp.float32, jnp.bfloat16, jnp.float16) else jnp.asarray(x), t)
    params = {k: cast(v) for k, v in params.items()}
    models = TryonModels(**kw, **params)
    if calibrate:
        calibrate_attention_softmax(models)
    return models


def save_train_state(path: str, state, *, keep: int = 3):
    """Save TrainState (trainable params + optimizer state + step) with
    orbax. The reference's --resume_from_checkpoint flag is dead code
    (train_xl.py:259,469 initial_global_step hard-coded 0); here resume is
    real."""
    import orbax.checkpoint as ocp
    os.makedirs(path, exist_ok=True)
    step = int(state.step)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(os.path.abspath(path), f"state_{step}"),
               {"step": state.step, "trainable": state.trainable,
                "opt_state": state.opt_state}, force=True)
    # prune old checkpoints
    entries = sorted(
        (d for d in os.listdir(path) if d.startswith("state_")),
        key=lambda d: int(d.split("_")[1]))
    for d in entries[:-keep]:
        import shutil
        shutil.rmtree(os.path.join(path, d), ignore_errors=True)


def latest_train_state_step(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    steps = [int(d.split("_")[1]) for d in os.listdir(path)
             if d.startswith("state_")]
    return max(steps) if steps else None


def load_train_state(path: str, template, step: Optional[int] = None):
    """Restore a TrainState saved by save_train_state. ``template`` is an
    abstract/concrete TrainState with the target structure."""
    import orbax.checkpoint as ocp
    from idmvton_tpu.train.train_step import TrainState
    step = step if step is not None else latest_train_state_step(path)
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(
        os.path.join(os.path.abspath(path), f"state_{step}"),
        item={"step": template.step, "trainable": template.trainable,
              "opt_state": template.opt_state})
    return TrainState(step=jnp.asarray(restored["step"]),
                      trainable=restored["trainable"],
                      opt_state=restored["opt_state"])


def save_diffusers(path: str, models: TryonModels):
    """Write a diffusers-layout pipeline tree for interop back to the torch
    ecosystem (reference: train_xl.py:770-792 pipeline.save_pretrained):
    model_index.json + per-subfolder config.json + safetensors in the
    yisol/IDM-VTON hub layout that ``from_diffusers`` (and the reference's
    inference.py:232-274) consumes. The Resampler rides inside the unet
    state dict as encoder_hid_proj.* (train_xl.py:343-357)."""
    from safetensors.numpy import save_file
    from idmvton_tpu.weights.converter import (
        export_unet, export_vae, export_clip_text, export_clip_vision,
        export_resampler,
    )

    unet_sd = export_unet(models.unet, models.unet_cfg)
    unet_sd.update(export_resampler(models.resampler, models.resampler_cfg,
                                    prefix="encoder_hid_proj."))
    subfolders = {
        "unet": ("diffusers", "UNet2DConditionModel",
                 "diffusion_pytorch_model.safetensors", unet_sd),
        "unet_encoder": ("diffusers", "UNet2DConditionModel",
                         "diffusion_pytorch_model.safetensors",
                         export_unet(models.garm, models.garm_cfg)),
        "vae": ("diffusers", "AutoencoderKL",
                "diffusion_pytorch_model.safetensors",
                export_vae(models.vae, models.vae_cfg)),
        "text_encoder": ("transformers", "CLIPTextModel",
                         "model.safetensors",
                         export_clip_text(models.clip_l, models.clip_l_cfg)),
        "text_encoder_2": ("transformers", "CLIPTextModelWithProjection",
                           "model.safetensors",
                           export_clip_text(models.clip_g, models.clip_g_cfg)),
        "image_encoder": ("transformers", "CLIPVisionModelWithProjection",
                          "model.safetensors",
                          export_clip_vision(models.vision,
                                             models.vision_cfg)),
    }
    index = {"_class_name": "TryonPipeline", "_diffusers_version": "0.25.0",
             # our frozen-dataclass configs, so from_diffusers round-trips
             # non-SDXL (e.g. tiny) geometries; torch diffusers ignores keys
             # it doesn't know
             "_idmvton_cfgs": {f: dataclasses.asdict(getattr(models, f))
                               for f in _CFG_FIELDS}}
    os.makedirs(path, exist_ok=True)
    for name, (lib, cls, fname, sd) in subfolders.items():
        sub = os.path.join(path, name)
        os.makedirs(sub, exist_ok=True)
        # safetensors serializes the BASE buffer of non-contiguous views
        # (the exporters' .T kernels) — silent data corruption without this
        save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
                  os.path.join(sub, fname))
        with open(os.path.join(sub, "config.json"), "w") as f:
            json.dump({"_class_name" if lib == "diffusers"
                       else "architectures": cls if lib == "diffusers"
                       else [cls]}, f)
        index[name] = [lib, cls]
    with open(os.path.join(path, "model_index.json"), "w") as f:
        json.dump(index, f, indent=2)


def _find_weights(subdir: str) -> Optional[str]:
    for pattern in ("*.safetensors", "*.bin", "*.pth", "*.pt"):
        hits = sorted(glob.glob(os.path.join(subdir, pattern)))
        if hits:
            return hits[0]
    return None


def from_diffusers(root: str, dtype=jnp.bfloat16, *,
                   unet_subfolder: str = "unet",
                   calibrate: bool = True) -> TryonModels:
    """Build TryonModels from a diffusers hub layout:
    {unet, unet_encoder, vae, text_encoder, text_encoder_2, image_encoder}
    subfolders (reference: inference.py:232-274, yisol/IDM-VTON). The trained
    TryonNet carries the Resampler as encoder_hid_proj inside its state dict
    (train_xl.py:343-357); image_proj.* keys are converted separately.
    ``calibrate`` runs the fixed-shift softmax guard on the loaded weights
    (calibrate_attention_softmax) before any program is jitted."""
    cfgs = dict(
        unet_cfg=UNetConfig.sdxl_tryon(), garm_cfg=UNetConfig.sdxl_garment(),
        vae_cfg=VAEConfig.sdxl(), clip_l_cfg=CLIPTextConfig.clip_l(),
        clip_g_cfg=CLIPTextConfig.clip_bigg(),
        vision_cfg=CLIPVisionConfig.vit_h(),
        resampler_cfg=ResamplerConfig.sdxl_plus(),
    )
    # trees written by save_diffusers carry our exact configs (so non-SDXL
    # geometries round-trip); hub trees without the key keep the defaults
    index_path = os.path.join(root, "model_index.json")
    if os.path.isfile(index_path):
        with open(index_path) as f:
            saved = json.load(f).get("_idmvton_cfgs")
        if saved:
            for field, typ in zip(_CFG_FIELDS, _CFG_TYPES):
                d = saved[field]
                for k, v in list(d.items()):
                    if isinstance(v, list):
                        d[k] = tuple(v)
                cfgs[field] = typ(**d)
    unet_sd = load_state_dict(_find_weights(os.path.join(root, unet_subfolder)))
    garm_sd = load_state_dict(_find_weights(os.path.join(root, "unet_encoder")))
    vae_sd = load_state_dict(_find_weights(os.path.join(root, "vae")))
    te1_sd = load_state_dict(_find_weights(os.path.join(root, "text_encoder")))
    te2_sd = load_state_dict(_find_weights(os.path.join(root, "text_encoder_2")))
    img_sd = load_state_dict(_find_weights(os.path.join(root, "image_encoder")))

    # Resampler weights: inside the trained unet as encoder_hid_proj.* or a
    # raw ip-adapter bin's image_proj.*
    if any(k.startswith("encoder_hid_proj.") for k in unet_sd):
        rs = convert_resampler(unet_sd, cfgs["resampler_cfg"], dtype,
                               prefix="encoder_hid_proj.")
    else:
        ip_bin = _find_weights(os.path.join(root, "ip_adapter"))
        ip_sd = load_state_dict(ip_bin)
        prefix = "image_proj." if any(k.startswith("image_proj.") for k in ip_sd) else ""
        rs = convert_resampler(ip_sd, cfgs["resampler_cfg"], dtype, prefix=prefix)

    models = TryonModels(
        **cfgs,
        unet=convert_unet(unet_sd, cfgs["unet_cfg"], dtype),
        garm=convert_unet(garm_sd, cfgs["garm_cfg"], dtype),
        vae=convert_vae(vae_sd, cfgs["vae_cfg"], dtype),
        clip_l=convert_clip_text(te1_sd, cfgs["clip_l_cfg"], dtype),
        clip_g=convert_clip_text(te2_sd, cfgs["clip_g_cfg"], dtype),
        vision=convert_clip_vision(img_sd, cfgs["vision_cfg"], dtype),
        resampler=rs,
    )
    if calibrate:
        calibrate_attention_softmax(models)
    return models
