"""Spatial (sequence) parallelism for the UNet latent path.

At the 768x1024 operating point the (B, 128, 96, C) latent activations —
not the weights — dominate per-step HBM traffic. Sharding the latent H
dimension over the mesh's 'model' axis splits that work across chips with
NO model-code changes: GSPMD propagates the sharding through the conv /
norm / attention graph, inserting halo exchanges for the 3x3 convs and
KV all-gathers for the attention contractions (the scaling-book recipe —
annotate the inputs, let XLA place the collectives on ICI).

Composes with DP (batch on 'data') and with the Megatron-style TP in
parallel/tp.py (which shards weights on the same 'model' axis; pick one of
sp/tp per axis). Reference has no analog — its only parallelism is DDP
(train_xl.py:468).
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from idmvton_tpu.parallel.mesh import MODEL_AXIS, DATA_AXIS


def latent_spec() -> P:
    """(B, H, W, C): batch over 'data', H over 'model'."""
    return P(DATA_AXIS, MODEL_AXIS)


def shard_latent(x, mesh):
    """Place a NHWC latent/conditioning tensor batch- and H-sharded."""
    return jax.device_put(x, NamedSharding(mesh, latent_spec()))
