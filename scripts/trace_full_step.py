"""Trace the PRODUCTION denoise step: the bench's split-step pair
(garm_feats program + tryon step program, bench.py:366-405) — not just the
bare tryon forward — so the scheduler-step/CFG/concat/time-embedding tail
shows up in the trace with source attribution (r4 verdict #2: itemize the
~28 ms/step residual).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/trace_full_step.py
Then:  python scripts/analyze_trace.py /tmp/jaxtrace_step --n-fwd 2 --min-ms 0.2
"""
import functools
import glob
import time

import jax
import jax.numpy as jnp
import numpy as np

from idmvton_tpu.core.config import UNetConfig, SchedulerConfig
from idmvton_tpu.diffusion.scheduler import DDPMScheduler, classifier_free_guidance
from idmvton_tpu.models.unet import init_unet, unet_apply
from idmvton_tpu.utils.fast_init import fast_random_params

dtype = jnp.bfloat16
B = 2
LH, LW, LC = 128, 96, 4
SEQ, N_IP, CTX = 77, 16, 2048

unet_cfg = UNetConfig.sdxl_tryon()
garm_cfg = UNetConfig.sdxl_garment()
sched = DDPMScheduler(SchedulerConfig.sdxl_inference())

p_unet = fast_random_params(jax.random.PRNGKey(0),
                            lambda k: init_unet(k, unet_cfg, dtype=dtype))
p_garm = fast_random_params(jax.random.PRNGKey(1),
                            lambda k: init_unet(k, garm_cfg, dtype=dtype))

import os
_int8 = os.environ.get("IDMVTON_GEMM_INT8", "0")
if _int8 in ("1", "2"):
    from idmvton_tpu.ops.quant import quantize_unet_linears_int8
    p_unet = quantize_unet_linears_int8(p_unet)
    print("int8-quantized tryon ln_linear sites")
if _int8 == "2":
    p_garm = quantize_unet_linears_int8(p_garm, attn_qkv=False)
    print("int8-quantized garment ln_linear sites")

rk = jax.random.split(jax.random.PRNGKey(2), 8)
rnd = lambda i, shape: jax.random.normal(rk[i], shape, jnp.float32).astype(dtype)
cond = {
    "context": rnd(0, (2 * B, SEQ + N_IP, CTX)),
    "add_text_embeds": rnd(1, (2 * B, 1280)),
    "time_ids": jnp.tile(jnp.asarray([1024, 768, 0, 0, 1024, 768],
                                     dtype)[None], (2 * B, 1)),
    "mask_2b": (jax.random.uniform(rk[2], (2 * B, LH, LW, 1)) > 0.5).astype(dtype),
    "masked_2b": rnd(3, (2 * B, LH, LW, LC)),
    "pose_2b": rnd(4, (2 * B, LH, LW, LC)),
    "cloth_lat": rnd(5, (B, LH, LW, LC)),
    "cloth_embeds": rnd(6, (B, SEQ, CTX)),
}


@jax.jit
def garm_feats_fn(pg, cond, t):
    _, feats = unet_apply(pg, garm_cfg, cond["cloth_lat"], t,
                          cond["cloth_embeds"])
    return feats


@functools.partial(jax.jit, donate_argnums=(2,))
def tryon_step_fn(pu, cond, lat, t, prev_t, rng, feats_cfg):
    unet_in = jnp.concatenate(
        [jnp.concatenate([lat] * 2, axis=0), cond["mask_2b"],
         cond["masked_2b"], cond["pose_2b"]], axis=-1)
    pred, _ = unet_apply(pu, unet_cfg, unet_in, t, cond["context"],
                         added_cond=(cond["add_text_embeds"],
                                     cond["time_ids"]),
                         garment_features=feats_cfg,
                         garment_uncond_zero=True)
    uncond, condp = jnp.split(pred, 2, axis=0)
    guided = classifier_free_guidance(uncond, condp, 2.0)
    noise = jax.random.normal(rng, lat.shape, jnp.float32).astype(lat.dtype)
    new_lat, _ = sched.step(guided, t, prev_t, lat, noise)
    return new_lat


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0][:1].astype(jnp.float32)))


ts = np.asarray(sched.timesteps(30))
prev = np.asarray(sched.prev_timesteps(sched.timesteps(30), 30))
lat = jax.random.normal(jax.random.PRNGKey(9), (B, LH, LW, LC),
                        jnp.float32).astype(dtype)
rngs = jax.random.split(jax.random.PRNGKey(10), 8)

t0 = time.time()
feats = garm_feats_fn(p_garm, cond, jnp.int32(ts[0]))
lat = tryon_step_fn(p_unet, cond, lat, jnp.int32(ts[0]), jnp.int32(prev[0]),
                    rngs[0], feats)
sync(lat)
print(f"compile+run {time.time() - t0:.1f}s")

jax.profiler.start_trace("/tmp/jaxtrace_step")
for i in (1, 2):
    feats = garm_feats_fn(p_garm, cond, jnp.int32(ts[i]))
    lat = tryon_step_fn(p_unet, cond, lat, jnp.int32(ts[i]),
                        jnp.int32(prev[i]), rngs[i], feats)
sync(lat)
jax.profiler.stop_trace()
print("traces:")
for p in glob.glob("/tmp/jaxtrace_step/**/*.trace.json.gz", recursive=True):
    print(" ", p)
