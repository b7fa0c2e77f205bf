"""A/B timing of the GarmentNet (emit) forward on the TPU, b2 cond batch.

Same protocol as ab_step.py: value-readback sync (block_until_ready does not
block through the axon relay), min of 4.
"""
import os
import sys
import time
import importlib

cfg_env = sys.argv[1] if len(sys.argv) > 1 else ""
for kv in cfg_env.split(","):
    if kv:
        k, v = kv.split("=")
        os.environ[k] = v

import jax
import jax.numpy as jnp
import idmvton_tpu.ops.pallas_attention as PA
importlib.reload(PA)
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


def fwd(p, x, t, c):
    _, feats = unet_apply(p, cfg, x, t, c)
    return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)


f = jax.jit(fwd)
float(f(p, x, jnp.int32(500), ctx))
ts = []
for _ in range(4):
    t0 = time.time()
    float(f(p, x, jnp.int32(500), ctx))
    ts.append(time.time() - t0)
print(f"[{cfg_env}] garm fwd: {min(ts)*1000:.1f} ms", flush=True)
