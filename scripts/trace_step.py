"""Capture a jax.profiler trace of one tryon forward on the TPU."""
import glob
import gzip
import json
import time
import jax
import jax.numpy as jnp
from idmvton_tpu.core.config import UNetConfig
from idmvton_tpu.models.unet import init_unet, unet_apply
from idmvton_tpu.utils.fast_init import fast_random_params

dtype = jnp.bfloat16
B2 = 4
LH, LW = 128, 96

unet_cfg = UNetConfig.sdxl_tryon()
p = fast_random_params(jax.random.PRNGKey(0),
                       lambda k: init_unet(k, unet_cfg, dtype=dtype))
x = jax.random.normal(jax.random.PRNGKey(1), (B2, LH, LW, 13), dtype)
ctx = jax.random.normal(jax.random.PRNGKey(2), (B2, 93, 2048), dtype)
pooled = jax.random.normal(jax.random.PRNGKey(3), (B2, 1280), dtype)
tids = jnp.ones((B2, 6), dtype)
feats = []
for lvl, n_blocks in ((1, 4), (2, 20), (2, 10), (2, 30), (1, 6)):
    s = (LH // (2 ** lvl)) * (LW // (2 ** lvl))
    c = (320, 640, 1280)[lvl]
    for i in range(n_blocks):
        feats.append(jax.random.normal(
            jax.random.PRNGKey(100 + len(feats)), (B2 // 2, s, c), dtype))
feats = tuple(feats)

f = jax.jit(lambda p, x, t, c, fe, pl, ti: jnp.sum(unet_apply(
    p, unet_cfg, x, t, c, added_cond=(pl, ti),
    garment_features=fe, garment_uncond_zero=True)[0].astype(jnp.float32)))
float(f(p, x, jnp.int32(500), ctx, feats, pooled, tids))

jax.profiler.start_trace("/tmp/jaxtrace")
for i in range(2):
    float(f(p, x, jnp.int32(500), ctx, feats, pooled, tids))
jax.profiler.stop_trace()
print("trace files:")
for path in glob.glob("/tmp/jaxtrace/**/*", recursive=True):
    print(" ", path)
