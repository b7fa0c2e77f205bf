"""Probe: full-size GarmentNet compile + step time on the attached TPU."""
import time
import jax
import jax.numpy as jnp
from idmvton_tpu.core.config import UNetConfig
from idmvton_tpu.models.unet import init_unet, unet_apply

dtype = jnp.bfloat16
cfg = UNetConfig.sdxl_garment()
t0 = time.time()
params = jax.jit(lambda k: init_unet(k, cfg, dtype=dtype))(jax.random.PRNGKey(0))
jax.block_until_ready(params)
print("init garmnet:", round(time.time() - t0, 1), flush=True)

b, lh, lw = 1, 128, 96
x = jax.random.normal(jax.random.PRNGKey(1), (b, lh, lw, 4), dtype)
ctx = jax.random.normal(jax.random.PRNGKey(2), (b, 77, 2048), dtype)

fwd = jax.jit(lambda p, x, t, c: unet_apply(p, cfg, x, t, c))
t0 = time.time()
out = fwd(params, x, jnp.int32(500), ctx)
jax.block_until_ready(out)
print("garmnet fwd compile+run:", round(time.time() - t0, 1), flush=True)
t0 = time.time()
out = fwd(params, x, jnp.int32(400), ctx)
jax.block_until_ready(out)
print("garmnet fwd run:", round(time.time() - t0, 3), flush=True)
