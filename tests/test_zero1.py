"""ZeRO-1 sharded optimizer state: numerics match the replicated train step
and the moments are genuinely partitioned over the data axis."""

import numpy as np
import jax
import jax.numpy as jnp

from idmvton_tpu.core.config import SchedulerConfig
from idmvton_tpu.diffusion.scheduler import DDPMScheduler
from idmvton_tpu.pipeline.tryon import TryonModels
from idmvton_tpu.train.train_step import (
    make_optimizer, init_train_state, make_train_step,
)
from idmvton_tpu.parallel.mesh import make_mesh, shard_batch, replicated
from idmvton_tpu.parallel.zero import (
    zero1_state_sharding, opt_state_bytes_per_device,
)

DTYPE = jnp.float32


def _tiny_batch(models, b, h, w, key):
    ks = jax.random.split(key, 8)
    vocab = models.clip_l_cfg.vocab_size
    isz = models.vision_cfg.image_size
    return dict(
        person=jax.random.uniform(ks[0], (b, h, w, 3), DTYPE, -1, 1),
        pose=jax.random.uniform(ks[1], (b, h, w, 3), DTYPE, -1, 1),
        cloth=jax.random.uniform(ks[2], (b, h, w, 3), DTYPE, -1, 1),
        mask=(jax.random.uniform(ks[3], (b, h, w, 1)) > 0.5).astype(DTYPE),
        prompt_ids_l=jax.random.randint(ks[4], (b, 7), 0, vocab),
        prompt_ids_g=jax.random.randint(ks[4], (b, 7), 0, vocab),
        cloth_ids_l=jax.random.randint(ks[5], (b, 7), 0, vocab),
        cloth_ids_g=jax.random.randint(ks[5], (b, 7), 0, vocab),
        ip_pixels=jax.random.uniform(ks[6], (b, isz, isz, 3), DTYPE, -1, 1),
    )


def test_zero1_matches_replicated_and_is_sharded():
    models = TryonModels.init(jax.random.PRNGKey(0), micro=True, dtype=DTYPE)
    sched = DDPMScheduler(SchedulerConfig.train())
    tx = make_optimizer()
    step_fn = make_train_step(models, sched, tx, compute_dtype=DTYPE)

    mesh = make_mesh(jax.devices()[:8])
    batch = shard_batch(
        _tiny_batch(models, 8, 32, 32, jax.random.PRNGKey(1)), mesh)
    rng = jax.random.PRNGKey(2)

    # replicated baseline
    state_r = jax.device_put(init_train_state(models, tx), replicated(mesh))
    new_r, metrics_r = jax.jit(step_fn)(state_r, batch, rng)

    # ZeRO-1: moments sharded over 'data', pinned through the step output
    state_z = init_train_state(models, tx)
    shardings = zero1_state_sharding(state_z, mesh)
    state_z = jax.device_put(state_z, shardings)
    step_z = jax.jit(step_fn, out_shardings=(shardings, None))
    new_z, metrics_z = step_z(state_z, batch, rng)

    np.testing.assert_allclose(float(metrics_z["loss"]),
                               float(metrics_r["loss"]), rtol=1e-6)
    ra = jax.tree_util.tree_leaves(new_r.trainable)
    za = jax.tree_util.tree_leaves(new_z.trainable)
    for a, b in zip(ra, za):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    # at least one moment leaf must actually be partitioned
    sharded = [l for l in jax.tree_util.tree_leaves(new_z.opt_state)
               if hasattr(l, "sharding")
               and not l.sharding.is_fully_replicated]
    assert sharded, "no optimizer-state leaf was partitioned"
    # and the per-device footprint must be well under the replicated one
    full = sum(l.size * l.dtype.itemsize
               for l in jax.tree_util.tree_leaves(state_z.opt_state))
    per_dev = opt_state_bytes_per_device(state_z, mesh)
    assert per_dev < 0.5 * full, (per_dev, full)
