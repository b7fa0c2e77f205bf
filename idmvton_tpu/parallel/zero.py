"""ZeRO-1: shard the optimizer state over the data axis.

The reference's answer to optimizer-state memory is bitsandbytes 8-bit Adam
(train_xl.py:412-420, replicated per GPU). On a TPU mesh the idiomatic move
is to partition the fp32 AdamW moments across the 'data' axis instead: each
chip holds 1/dp of mu and nu (ZeRO stage 1), and GSPMD inserts the
reduce-scatter / all-gather around the update. Composes with the int8
moments of train/quant_opt.py for a further 4x.

Params stay replicated (stage 1, matching the DP gradient all-reduce
train step in train/train_step.py); only `TrainState.opt_state` is sharded.
Each moment leaf is split on its largest axis divisible by the data-axis
size; indivisible leaves (biases, norm scales — a negligible fraction of
the bytes) stay replicated.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from idmvton_tpu.parallel.mesh import DATA_AXIS


def _moment_spec(leaf, axis_size: int) -> P:
    shape = getattr(leaf, "shape", ())
    if len(shape) == 0:
        return P()
    dims = sorted(range(len(shape)), key=lambda d: -shape[d])
    for d in dims:
        if shape[d] >= axis_size and shape[d] % axis_size == 0:
            return P(*[DATA_AXIS if i == d else None
                       for i in range(len(shape))])
    return P()


def zero1_state_sharding(state, mesh):
    """A sharding pytree for a TrainState: params/step replicated, optimizer
    moments partitioned over the data axis. Pass to jax.device_put and as
    jit out_shardings so the moments STAY sharded across steps."""
    n = mesh.shape[DATA_AXIS]
    repl = NamedSharding(mesh, P())

    def opt(leaf):
        return NamedSharding(mesh, _moment_spec(leaf, n))

    import dataclasses
    return dataclasses.replace(
        state,
        step=repl,
        trainable=jax.tree_util.tree_map(lambda _: repl, state.trainable),
        opt_state=jax.tree_util.tree_map(opt, state.opt_state),
    )


def opt_state_bytes_per_device(state, mesh) -> int:
    """Diagnostic: optimizer-state bytes resident per device under ZeRO-1."""
    n = mesh.shape[DATA_AXIS]
    total = 0
    for leaf in jax.tree_util.tree_leaves(state.opt_state):
        size = leaf.size * leaf.dtype.itemsize
        spec = _moment_spec(leaf, n)
        total += size // (n if any(spec) else 1)
    return total
