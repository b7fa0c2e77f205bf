"""Golden-parity gate: run the pipeline on a dumped fixture directory and
score SSIM vs the reference's outputs (BASELINE.md gate: SSIM >= 0.99).

The fixture layout is produced torch-side by scripts/dump_golden_fixtures.py
(run where the reference + real weights exist); consumed here and by
tests/test_golden_parity.py. Reference output protocol:
inference.py:396-419 with every randn_tensor draw captured and re-injected
(exact cross-framework RNG parity is impossible — SURVEY §7).
"""

from __future__ import annotations

import json
import os


def run_golden_gate(golden_dir: str) -> dict:
    """Load models + fixtures from `golden_dir`, regenerate with the
    reference's injected noises, and return
    {"ssim": float, "threshold": float, "passed": bool}.

    Layout (scripts/dump_golden_fixtures.py):
      models/             orbax pipeline checkpoint (weights/checkpoint.py)
                          or a diffusers tree (golden_config.json
                          diffusers=true)
      inputs.npz          person/mask/pose/cloth/ip_pixels + token ids
      noise.npz           init_noise (B,h,w,4), step_noise (T,B,h,w,4)
      expected.npz        reference images, NHWC in [-1, 1]
      golden_config.json  num_steps/guidance_scale/seed/vae_sample/threshold
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from idmvton_tpu.pipeline.tryon import TryonPipeline
    from idmvton_tpu.weights.checkpoint import load_pipeline, from_diffusers
    from idmvton_tpu.utils.metrics import ssim

    cfg_path = os.path.join(golden_dir, "golden_config.json")
    cfg = json.load(open(cfg_path)) if os.path.exists(cfg_path) else {}
    models_dir = os.path.join(golden_dir, "models")
    dtype = jnp.dtype(cfg.get("dtype", "bfloat16"))
    models = (from_diffusers(models_dir, dtype) if cfg.get("diffusers")
              else load_pipeline(models_dir, dtype))
    pipe = TryonPipeline(models)

    inputs = {k: jnp.asarray(v) for k, v in
              np.load(os.path.join(golden_dir, "inputs.npz")).items()}
    expected = np.load(os.path.join(golden_dir, "expected.npz"))["images"]
    noise = np.load(os.path.join(golden_dir, "noise.npz"))

    fn = pipe.jit_generate(num_steps=cfg.get("num_steps", 30),
                           guidance_scale=cfg.get("guidance_scale", 2.0),
                           vae_sample=cfg.get("vae_sample", False))
    images = fn(models.params(), jax.random.PRNGKey(cfg.get("seed", 42)),
                **inputs,
                init_noise=jnp.asarray(noise["init_noise"]),
                step_noise=jnp.asarray(noise["step_noise"]))
    s = float(ssim(images, jnp.asarray(expected)))
    thr = float(cfg.get("ssim_threshold", 0.99))
    return {"ssim": s, "threshold": thr, "passed": s >= thr}
