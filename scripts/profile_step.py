"""Break down the denoise step: garm fwd vs tryon fwd vs attention kernels.

NOTE: through the axon relay, block_until_ready does not reliably block;
every timing here forces a scalar VALUE readback.
"""
import time
import jax
import jax.numpy as jnp
from idmvton_tpu.core.config import UNetConfig
from idmvton_tpu.models.unet import init_unet, unet_apply
from idmvton_tpu.utils.fast_init import fast_random_params
from idmvton_tpu.ops.attention import concat_kv_attention

dtype = jnp.bfloat16
B = 2
LH, LW = 128, 96


def timed(name, fn, *args, n=3):
    float(fn(*args))  # compile + warm
    ts = []
    for _ in range(n):
        t0 = time.time()
        float(fn(*args))
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)*1000:.1f} ms", flush=True)


# attention shapes on the hot path (CFG batch 4)
for (sq, heads) in ((3072, 10), (768, 20)):
    q = jax.random.normal(jax.random.PRNGKey(0), (4, sq, heads, 64), dtype)
    k = jax.random.normal(jax.random.PRNGKey(1), (4, sq, heads, 64), dtype)
    v = jax.random.normal(jax.random.PRNGKey(2), (4, sq, heads, 64), dtype)
    kr = jax.random.normal(jax.random.PRNGKey(3), (4, sq, heads, 64), dtype)
    vr = jax.random.normal(jax.random.PRNGKey(4), (4, sq, heads, 64), dtype)
    f = jax.jit(lambda q, k, v, kr, vr: jnp.sum(
        concat_kv_attention(q, k, v, kr, vr).astype(jnp.float32)))
    timed(f"concat_attn q{sq} kv{2*sq} h{heads} (pallas)", f, q, k, v, kr, vr)
    del q, k, v, kr, vr

# garmnet forward (B=2)
garm_cfg = UNetConfig.sdxl_garment()
p_garm = fast_random_params(jax.random.PRNGKey(0),
                            lambda k: init_unet(k, garm_cfg, dtype=dtype))
x = jax.random.normal(jax.random.PRNGKey(1), (B, LH, LW, 4), dtype)
ctx = jax.random.normal(jax.random.PRNGKey(2), (B, 77, 2048), dtype)
garm_sum = jax.jit(lambda p, x, t, c: sum(
    jnp.sum(f.astype(jnp.float32)) for f in unet_apply(p, garm_cfg, x, t, c)[1]))
timed("garm fwd b2", garm_sum, p_garm, x, jnp.int32(500), ctx)
garm_feats = jax.jit(lambda p, x, t, c: unet_apply(p, garm_cfg, x, t, c)[1])
feats = garm_feats(p_garm, x, jnp.int32(500), ctx)
for leaf in jax.tree_util.tree_leaves(p_garm):
    leaf.delete()

# tryon forward (2B=4)
unet_cfg = UNetConfig.sdxl_tryon()
p_unet = fast_random_params(jax.random.PRNGKey(3),
                            lambda k: init_unet(k, unet_cfg, dtype=dtype))
feats4 = tuple(jnp.concatenate([jnp.zeros_like(f), f], 0) for f in feats)
x4 = jax.random.normal(jax.random.PRNGKey(4), (2 * B, LH, LW, 13), dtype)
ctx4 = jax.random.normal(jax.random.PRNGKey(5), (2 * B, 93, 2048), dtype)
pooled = jax.random.normal(jax.random.PRNGKey(6), (2 * B, 1280), dtype)
tids = jnp.ones((2 * B, 6), dtype)
tryon_sum = jax.jit(lambda p, x, t, c, f, pl, ti: jnp.sum(unet_apply(
    p, unet_cfg, x, t, c, added_cond=(pl, ti),
    garment_features=f)[0].astype(jnp.float32)))
timed("tryon fwd b4", tryon_sum, p_unet, x4, jnp.int32(500), ctx4, feats4,
      pooled, tids)
