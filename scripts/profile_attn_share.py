"""Quantify in-graph attention cost: time tryon fwd with real attention vs
attention stubbed to identity (projections kept)."""
import time
import jax
import jax.numpy as jnp
import idmvton_tpu.ops.attention as A
from idmvton_tpu.core.config import UNetConfig
from idmvton_tpu.models.unet import init_unet, unet_apply
from idmvton_tpu.utils.fast_init import fast_random_params

dtype = jnp.bfloat16
B2 = 4
LH, LW = 128, 96


def timed(name, fn, *args, n=3):
    float(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.time()
        float(fn(*args))
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)*1000:.1f} ms", flush=True)


unet_cfg = UNetConfig.sdxl_tryon()
p = fast_random_params(jax.random.PRNGKey(0),
                       lambda k: init_unet(k, unet_cfg, dtype=dtype))
nf = unet_cfg.num_garment_features
x = jax.random.normal(jax.random.PRNGKey(1), (B2, LH, LW, 13), dtype)
ctx = jax.random.normal(jax.random.PRNGKey(2), (B2, 93, 2048), dtype)
pooled = jax.random.normal(jax.random.PRNGKey(3), (B2, 1280), dtype)
tids = jnp.ones((B2, 6), dtype)
# garment feature placeholders with the right shapes
feats = []
for lvl, n_blocks in ((1, 4), (2, 20), (2, 10), (2, 30), (1, 6)):
    s = (LH // (2 ** lvl)) * (LW // (2 ** lvl))
    c = (320, 640, 1280)[lvl]
    for i in range(n_blocks):
        feats.append(jax.random.normal(
            jax.random.PRNGKey(100 + len(feats)), (B2, s, c), dtype))
feats = tuple(feats)


def run(name):
    f = jax.jit(lambda p, x, t, c, fe, pl, ti: jnp.sum(unet_apply(
        p, unet_cfg, x, t, c, added_cond=(pl, ti),
        garment_features=fe)[0].astype(jnp.float32)))
    timed(name, f, p, x, jnp.int32(500), ctx, feats, pooled, tids)


run("tryon full")

orig_concat = A.concat_kv_attention
orig_ip = A.decoupled_ip_attention
A.concat_kv_attention = lambda q, k, v, kr, vr, **kw: q
A.decoupled_ip_attention = lambda q, kt, vt, ki, vi, **kw: q
run("tryon attn-stubbed")

A.concat_kv_attention = orig_concat
A.decoupled_ip_attention = lambda q, kt, vt, ki, vi, **kw: q
run("tryon ip-stubbed only")
