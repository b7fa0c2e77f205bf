"""In-graph A/B of flash-attention configs: time the full tryon fwd."""
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
        # cond-half batch: uncond zeros folded in analytically
        feats.append(jax.random.normal(
            jax.random.PRNGKey(100 + len(feats)), (B2 // 2, s, c), dtype))
feats = tuple(feats)

f = jax.jit(lambda p, x, t, c, fe, pl, ti: jnp.sum(unet_apply(
    p, unet_cfg, x, t, c, added_cond=(pl, ti),
    garment_features=fe, garment_uncond_zero=True)[0].astype(jnp.float32)))
float(f(p, x, jnp.int32(500), ctx, feats, pooled, tids))
ts = []
for _ in range(4):
    t0 = time.time()
    float(f(p, x, jnp.int32(500), ctx, feats, pooled, tids))
    ts.append(time.time() - t0)
print(f"[{cfg_env}] tryon fwd: {min(ts)*1000:.1f} ms", flush=True)
