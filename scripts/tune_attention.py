"""Tune flash-attention block sizes on the hot shapes."""
import time
import jax
import jax.numpy as jnp
from idmvton_tpu.ops.pallas_attention import flash_attention_concat_kv

dtype = jnp.bfloat16

for (sq, heads) in ((3072, 10), (768, 20)):
    q = jax.random.normal(jax.random.PRNGKey(0), (4, sq, heads, 64), dtype)
    k = jax.random.normal(jax.random.PRNGKey(1), (4, sq, heads, 64), dtype)
    v = jax.random.normal(jax.random.PRNGKey(2), (4, sq, heads, 64), dtype)
    kr = jax.random.normal(jax.random.PRNGKey(3), (4, sq, heads, 64), dtype)
    vr = jax.random.normal(jax.random.PRNGKey(4), (4, sq, heads, 64), dtype)
    flops = 4 * 4 * heads * sq * (2 * sq) * 64
    for bq, bkv in ((256, 512), (512, 512), (512, 1024), (1024, 1024),
                    (768, 1536), (512, 2048)):
        if bq > sq:
            continue
        f = jax.jit(lambda q, k, v, kr, vr, bq=bq, bkv=bkv: jnp.sum(
            flash_attention_concat_kv(q, k, v, kr, vr, block_q=bq,
                                      block_kv=bkv).astype(jnp.float32)))
        try:
            float(f(q, k, v, kr, vr))
            ts = []
            for _ in range(3):
                t0 = time.time()
                float(f(q, k, v, kr, vr))
                ts.append(time.time() - t0)
            ms = min(ts) * 1000
            print(f"sq{sq} h{heads} bq{bq} bkv{bkv}: {ms:.1f} ms "
                  f"({flops/min(ts)/1e12:.1f} TF/s real-d64)", flush=True)
        except Exception as e:
            print(f"sq{sq} h{heads} bq{bq} bkv{bkv}: FAIL {type(e).__name__}",
                  flush=True)
