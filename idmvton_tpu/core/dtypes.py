"""Mixed-precision policy for TPU.

The reference runs fp16 weights with an fp32 VAE decode
(reference: inference.py:223, src/tryon_pipeline.py:1868-1880 upcast_vae).
On TPU the native low-precision type is bfloat16: same exponent range as fp32,
so the fp16-overflow workarounds the reference needs (forced-fp32 VAE) become a
configurable option rather than a hard requirement.

Policy:
- ``param_dtype``  — storage dtype of weights.
- ``compute_dtype``— dtype activations/matmuls run in (MXU-friendly bf16).
- norms/softmax always accumulate in fp32 regardless of policy.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.bfloat16
    compute_dtype: jnp.dtype = jnp.bfloat16

    def cast(self, x):
        return x.astype(self.compute_dtype)

    def cast_to_param(self, x):
        return x.astype(self.param_dtype)


DEFAULT_POLICY = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
FP32_POLICY = Policy(param_dtype=jnp.float32, compute_dtype=jnp.float32)
