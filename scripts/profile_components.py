"""Bisect tryon fwd time: stub transformers / FFs / norms and compare."""
import time
import jax
import jax.numpy as jnp
import idmvton_tpu.models.attention as MA
import idmvton_tpu.models.transformer as MT
import idmvton_tpu.models.layers as ML
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
            jax.random.PRNGKey(100 + len(feats)), (B2, s, c), dtype))
feats = tuple(feats)


def run(name):
    f = jax.jit(lambda p, x, t, c, fe, pl, ti: jnp.sum(unet_apply(
        p, unet_cfg, x, t, c, added_cond=(pl, ti),
        garment_features=fe)[0].astype(jnp.float32)))
    float(f(p, x, jnp.int32(500), ctx, feats, pooled, tids))
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(f(p, x, jnp.int32(500), ctx, feats, pooled, tids))
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)*1000:.1f} ms", flush=True)


run("full")

orig_t2d = MT.transformer2d
import idmvton_tpu.models.unet as MU
MU.transformer2d = lambda params, x, context, **kw: (x, ())
run("transformers stubbed (resnets+skeleton only)")
MU.transformer2d = orig_t2d

orig_ff = MA.feedforward
MA.feedforward = lambda params, x: x
run("FF stubbed")
MA.feedforward = orig_ff

orig_ln = ML.layer_norm
ML.layer_norm = lambda params, x, eps=1e-5: x
MA.layer_norm = ML.layer_norm
run("layernorms stubbed")
ML.layer_norm = orig_ln
MA.layer_norm = orig_ln

orig_gn = ML.group_norm
def bf16_gn(params, x, *, num_groups, eps=1e-5, act=None):
    b, c = x.shape[0], x.shape[-1]
    xf = x.reshape(b, -1, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.var(xf, axis=(1, 3), keepdims=True)
    xf = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
    xf = xf * params["scale"].astype(x.dtype) + params["bias"].astype(x.dtype)
    if act == "silu":
        xf = jax.nn.silu(xf)
    return xf
ML.group_norm = bf16_gn
import idmvton_tpu.models.resnet as MR
MR.group_norm = bf16_gn
MT.group_norm = bf16_gn
MU.group_norm = bf16_gn
run("groupnorm bf16")
