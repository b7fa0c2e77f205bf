"""Probe: true step time via value readback; also fast param init."""
import time
import jax
import jax.numpy as jnp
from idmvton_tpu.core.config import UNetConfig
from idmvton_tpu.models.unet import init_unet, unet_apply

dtype = jnp.bfloat16
cfg = UNetConfig.sdxl_garment()

# fast init: one flat RNG buffer, sliced per leaf (compiles in seconds vs
# minutes for per-leaf RNG programs)
shapes = jax.eval_shape(lambda k: init_unet(k, cfg, dtype=dtype),
                        jax.random.PRNGKey(0))
leaves, treedef = jax.tree_util.tree_flatten(shapes)
total = sum(int(jnp.prod(jnp.asarray(l.shape))) for l in leaves)
print("param count:", total / 1e9, "B", flush=True)


def fast_init(key):
    flat = jax.random.normal(key, (total,), jnp.bfloat16) * 0.02
    out, off = [], 0
    for l in leaves:
        n = 1
        for s in l.shape:
            n *= s
        out.append(flat[off:off + n].reshape(l.shape).astype(l.dtype))
        off += n
    return jax.tree_util.tree_unflatten(treedef, out)


t0 = time.time()
params = jax.jit(fast_init)(jax.random.PRNGKey(0))
jax.block_until_ready(params)
print("fast init:", round(time.time() - t0, 1), flush=True)

b, lh, lw = 1, 128, 96
x = jax.random.normal(jax.random.PRNGKey(1), (b, lh, lw, 4), dtype)
ctx = jax.random.normal(jax.random.PRNGKey(2), (b, 77, 2048), dtype)


def fwd_sum(p, x, t, c):
    _, feats = unet_apply(p, cfg, x, t, c)
    return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)


fwd = jax.jit(fwd_sum)
t0 = time.time()
v = float(fwd(params, x, jnp.int32(500), ctx))
print("fwd compile+run:", round(time.time() - t0, 1), "val", v, flush=True)
for i in range(3):
    t0 = time.time()
    v = float(fwd(params, x, jnp.int32(100 * i), ctx))
    print(f"fwd run {i}:", round(time.time() - t0, 4), flush=True)
