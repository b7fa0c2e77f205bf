"""Golden-parity gates vs the PyTorch reference (BASELINE.md: SSIM >= 0.99).

These tests need real converted weights + reference fixtures, which are not
present in this environment (ckpt/ holds placeholders — see PARITY.md).
They run automatically when the fixture directory exists:

  IDMVTON_GOLDEN_DIR/
    models/            orbax checkpoint (weights/checkpoint.py layout) or a
                       diffusers tree (set golden_config.json diffusers=true)
    inputs.npz         person, mask, pose, cloth, ip_pixels (+ *_ids tokens)
    noise.npz          init_latents, step noise tensors (torch-generated —
                       exact RNG parity across frameworks is impossible,
                       SURVEY §7 "Exact RNG parity")
    expected.npz       reference output images in [-1, 1]
"""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.environ.get("IDMVTON_GOLDEN_DIR", "")

pytestmark = pytest.mark.skipif(
    not (GOLDEN_DIR and os.path.isdir(GOLDEN_DIR)),
    reason="golden fixtures not available (set IDMVTON_GOLDEN_DIR)")


def test_golden_ssim_gate():
    import jax
    import jax.numpy as jnp
    from idmvton_tpu.pipeline.tryon import TryonPipeline
    from idmvton_tpu.weights.checkpoint import load_pipeline, from_diffusers
    from idmvton_tpu.utils.metrics import ssim

    import json
    cfg_path = os.path.join(GOLDEN_DIR, "golden_config.json")
    cfg = json.load(open(cfg_path)) if os.path.exists(cfg_path) else {}
    models_dir = os.path.join(GOLDEN_DIR, "models")
    models = (from_diffusers(models_dir) if cfg.get("diffusers")
              else load_pipeline(models_dir))
    pipe = TryonPipeline(models)

    inputs = {k: jnp.asarray(v)
              for k, v in np.load(os.path.join(GOLDEN_DIR, "inputs.npz")).items()}
    expected = np.load(os.path.join(GOLDEN_DIR, "expected.npz"))["images"]

    fn = pipe.jit_generate(num_steps=cfg.get("num_steps", 30),
                           guidance_scale=cfg.get("guidance_scale", 2.0))
    images = fn(models.params(), jax.random.PRNGKey(cfg.get("seed", 42)),
                **inputs)
    s = float(ssim(images, jnp.asarray(expected)))
    assert s >= cfg.get("ssim_threshold", 0.99), f"SSIM {s}"
