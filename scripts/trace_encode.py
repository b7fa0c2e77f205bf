"""Capture a jax.profiler trace of the bench's VAE-encode phase (the one
phase never itemized: 0.26 s/b2 = 3.5% of e2e). Same program as bench.py's
vae_fn — 3 conditioning images per batch element (masked person / pose /
cloth, tryon_pipeline.py:911-932) batched to 3B at 1024x768."""
import glob
import jax
import jax.numpy as jnp
from idmvton_tpu.core.config import VAEConfig
from idmvton_tpu.models.vae import init_vae, vae_encode
from idmvton_tpu.utils.fast_init import fast_random_params

dtype = jnp.bfloat16
B = 2
cfg = VAEConfig.sdxl()
p = fast_random_params(jax.random.PRNGKey(0),
                       lambda k: init_vae(k, cfg, dtype=dtype))
imgs = jax.random.uniform(jax.random.PRNGKey(1), (3 * B, 1024, 768, 3),
                          dtype, -1, 1)

f = jax.jit(lambda p, x, r: jnp.sum(
    vae_encode(p, cfg, x, rng=r).astype(jnp.float32)))
float(f(p, imgs, jax.random.PRNGKey(2)))  # compile + warm

jax.profiler.start_trace("/tmp/jaxtrace_encode")
for i in range(2):
    float(f(p, jnp.roll(imgs, i + 1, axis=1), jax.random.PRNGKey(3 + i)))
jax.profiler.stop_trace()
print("trace files:")
for path in glob.glob("/tmp/jaxtrace_encode/**/*.json.gz", recursive=True):
    print(" ", path)
