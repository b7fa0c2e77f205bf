"""Spatial parallelism: UNet forward with the latent H dimension sharded
over the 'model' mesh axis must match the replicated result (GSPMD inserts
halo exchanges for convs and gathers for the attention reshapes)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from idmvton_tpu.core.config import UNetConfig
from idmvton_tpu.models.unet import init_unet, unet_apply
from idmvton_tpu.parallel.mesh import make_mesh
from idmvton_tpu.parallel.sp import shard_latent

DTYPE = jnp.float32


def test_unet_spatial_parallel_matches_replicated():
    cfg = UNetConfig.tiny("none", in_channels=4, ip_adapter=False)
    params = init_unet(jax.random.PRNGKey(0), cfg, dtype=DTYPE)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8, 4), DTYPE)
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (2, 7, cfg.cross_attention_dim), DTYPE)

    def fwd(p, x_, c_):
        out, _ = unet_apply(p, cfg, x_, jnp.int32(11), c_)
        return out

    want = jax.jit(fwd)(params, x, ctx)

    mesh = make_mesh(jax.devices()[:4], data=2, model=2)
    xs = shard_latent(x, mesh)
    ps = jax.device_put(params, NamedSharding(mesh, P()))
    cs = jax.device_put(ctx, NamedSharding(mesh, P("data")))
    got = jax.jit(fwd)(ps, xs, cs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_train_latents_spatial_parallel():
    """The sharding also composes with dp on the conditioning: a dp=2 x sp=4
    mesh runs the garment-emit UNet with all feature outputs finite."""
    cfg = UNetConfig.tiny("emit")
    params = init_unet(jax.random.PRNGKey(0), cfg, dtype=DTYPE)
    mesh = make_mesh(jax.devices()[:8], data=2, model=4)
    x = shard_latent(
        jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8, 4), DTYPE), mesh)
    ctx = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(2),
                          (2, 7, cfg.cross_attention_dim), DTYPE),
        NamedSharding(mesh, P("data")))
    ps = jax.device_put(params, NamedSharding(mesh, P()))
    _, feats = jax.jit(lambda p, x_, c_: unet_apply(
        p, cfg, x_, jnp.int32(5), c_))(ps, x, ctx)
    assert len(feats) == cfg.num_garment_features
    assert all(bool(jnp.isfinite(f).all()) for f in feats)
