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


def _spec_for(path, leaf):
    names = [getattr(p, "key", None) for p in path]
    leaf_name = names[-1]
    parent = names[-2] if len(names) >= 2 else None
    rule = _RULES.get(parent)
    if rule is None:
        return P()
    kernel_spec, bias_spec = rule
    if leaf_name == "kernel" and leaf.ndim == 2:
        return kernel_spec
    if leaf_name == "bias" and leaf.ndim == 1:
        # row-parallel bias stays replicated; col-parallel bias splits
        return bias_spec if bias_spec == P() or leaf.shape[0] % 2 == 0 else P()
    return P()


def unet_param_spec(params) -> dict:
    """PartitionSpec tree for a UNet param tree (models/unet.py layout)."""
    return jax.tree_util.tree_map_with_path(_spec_for, params)


def shard_unet_params(params, mesh):
    spec = unet_param_spec(params)
    return jax.device_put(params, jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), spec))
