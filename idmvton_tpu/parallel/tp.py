"""Tensor-parallel sharding rules for the UNets (GSPMD-style).

The reference has no TP (SURVEY §2.5 — accelerate DDP only). Here TP is the
idiomatic TPU Megatron pattern expressed purely through parameter shardings:
attention QKV / FF-in kernels split on the output (head/hidden) dim, the
following out-projection split on the input dim — XLA's SPMD partitioner
propagates activations and inserts the psum on the residual add, riding ICI.
Convs/norms/embeddings stay replicated (they are bandwidth-, not
compute-bound at UNet shapes).

Usage:
    mesh = make_mesh(devices, data=D, model=M)
    spec = unet_param_spec(params)
    params = jax.device_put(params, jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), spec))
    # then jit the same unet_apply — no code changes
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from idmvton_tpu.parallel.mesh import MODEL_AXIS


# param-name -> (kernel PartitionSpec, bias PartitionSpec)
_COL = (P(None, MODEL_AXIS), P(MODEL_AXIS))     # split output dim
_ROW = (P(MODEL_AXIS, None), P())               # split input dim (psum after)
_REP = (P(), P())

_RULES = {
    # self-attention: fused qkv col-parallel, out row-parallel
    "to_qkv": _COL,
    "to_q": _COL,
    "to_kv": _COL,
    "to_kv_ip": _COL,
    "to_out": _ROW,
    # GEGLU FF
    "proj_in": _COL,   # also Transformer2D proj_in (inner dim) — col is fine
    "proj_out": _ROW,
}


def _spec_for(path, leaf, model_axis_size: int):
    names = [getattr(p, "key", None) for p in path]
    leaf_name = names[-1]
    parent = names[-2] if len(names) >= 2 else None
    rule = _RULES.get(parent)
    if rule is None:
        return P()
    kernel_spec, bias_spec = rule
    if leaf_name == "kernel" and leaf.ndim == 2:
        # split dim must divide the model-axis size; replicate otherwise
        split_dim = 1 if kernel_spec == _COL[0] else 0
        if leaf.shape[split_dim] % model_axis_size != 0:
            return P()
        return kernel_spec
    if leaf_name == "bias" and leaf.ndim == 1:
        # row-parallel bias stays replicated; col-parallel bias splits only
        # when evenly divisible by the actual model-axis size (not a
        # hardcoded 2 — a tp=4 mesh must not inherit tp=2 divisibility)
        if bias_spec == P() or leaf.shape[0] % model_axis_size != 0:
            return P()
        return bias_spec
    return P()


def unet_param_spec(params, model_axis_size: int = 2) -> dict:
    """PartitionSpec tree for a UNet param tree (models/unet.py layout).

    model_axis_size: the size of the mesh's MODEL_AXIS — divisibility of
    every split dim is validated against it, replicating anything uneven."""
    return jax.tree_util.tree_map_with_path(
        lambda p, l: _spec_for(p, l, model_axis_size), params)


def shard_unet_params(params, mesh):
    spec = unet_param_spec(params, mesh.shape.get(MODEL_AXIS, 1))
    return jax.device_put(params, jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), spec))
