"""idmvton_tpu — a TPU-native (JAX / XLA / Pallas / pjit) virtual try-on framework.

A from-scratch rebuild of the capabilities of yisol/IDM-VTON (SDXL-inpainting based
virtual try-on with dual-UNet garment conditioning and IP-Adapter-plus image prompts),
re-designed for TPU:

- one parametric UNet (``models/unet.py``) with ``emit``/``consume`` garment-feature
  modes instead of the reference's four duplicated ~9.4k-LoC block files
  (reference: src/unet_hacked_{tryon,garmnet}.py, src/unet_block_hacked_*.py),
- the 30-step CFG denoise loop compiled as a single ``lax.scan``
  (reference: src/tryon_pipeline.py:1765-1866 python loop),
- Pallas flash-attention over the asymmetric Q(N)xKV(2N) garment-concat sequence
  (reference: src/attentionhacked_tryon.py:334-348 literal concat + slice),
- ``jax.sharding``/pjit data-parallel scaling over a device mesh
  (reference: HF accelerate DDP, train_xl.py:468).
"""

__version__ = "0.1.0"
