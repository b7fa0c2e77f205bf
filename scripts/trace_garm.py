"""Capture a jax.profiler trace of one GarmentNet (emit) forward on the TPU,
b2 cond batch — the garm tower is ~31% of the serving step (72.2 ms busy of
235 ms); this attributes it site-by-site like trace_step.py does for tryon.
Analyze with: python scripts/analyze_trace.py /tmp/jaxtrace --n-fwd 2
"""
import glob

import jax
import jax.numpy as jnp

from idmvton_tpu.core.config import UNetConfig
from idmvton_tpu.models.unet import init_unet, unet_apply
from idmvton_tpu.utils.fast_init import fast_random_params

dtype = jnp.bfloat16
B = 2
LH, LW = 128, 96

cfg = UNetConfig.sdxl_garment()
p = fast_random_params(jax.random.PRNGKey(0),
                       lambda k: init_unet(k, cfg, dtype=dtype))
x = jax.random.normal(jax.random.PRNGKey(1), (B, LH, LW, 4), dtype)
ctx = jax.random.normal(jax.random.PRNGKey(2), (B, 77, 2048), dtype)

f = jax.jit(lambda p, x, t, c: sum(
    jnp.sum(fe.astype(jnp.float32))
    for fe in unet_apply(p, cfg, x, t, c)[1]))
float(f(p, x, jnp.int32(500), ctx))

jax.profiler.start_trace("/tmp/jaxtrace")
for i in range(2):
    float(f(p, x, jnp.int32(500), ctx))
jax.profiler.stop_trace()
print("trace files:")
for path in glob.glob("/tmp/jaxtrace/**/*", recursive=True):
    print(" ", path)
