"""Pipeline parallelism (GPipe schedule) over homogeneous layer stacks.

The reference's only parallelism is HF accelerate DDP
(/root/reference/train_xl.py:468) — pp is beyond-reference capability,
rounding out the mesh axes next to dp (mesh.py), tp (tp.py), sp (sp.py)
and ZeRO-1 (zero.py). The natural pp targets in this stack are the frozen
encoder towers: CLIP-L/bigG/ViT-H are clean stacks of identical blocks
(models/clip.py::_encoder_layer), so their params stack into a single
leading-axis pytree and the stage split is mechanical.

Design (the scaling-book pipelining recipe, TPU-native):

- Stack the L identical layers' params into leaves with leading axis L,
  reshape to (S, L//S, ...) and shard the stage axis S over the mesh's
  'model' axis — each device holds one contiguous group of L//S layers.
- Run the schedule inside shard_map: T = n_micro + S - 1 ticks of a
  lax.scan. Each tick, every stage applies its layer group (an inner
  lax.scan over the group) to its current microbatch and hands the
  activation to the next stage with lax.ppermute — a ring hop that rides
  ICI, never DCN.
- Stage 0 feeds fresh microbatches from the data-sharded input; the last
  stage collects outputs into a (n_micro, ...) buffer. Warm-up/drain
  ticks compute on zeros and their writes are masked out (zeros are safe
  through norm/attention — no NaNs — and invalid slots are never read).
- Bubble fraction is (S-1)/(n_micro + S - 1), the usual GPipe tradeoff,
  amortized by raising n_micro.

Composes with DP: the mesh is (data, model); the batch stays sharded over
'data' while stages shard over 'model', so each data row runs its own
pipeline replica and gradient/batch collectives stay on the 'data' axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from idmvton_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def stack_layers(layers):
    """[L identical pytrees] -> one pytree whose leaves gain leading axis L."""
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *layers)


def shard_stages(layers, mesh):
    """Stack L layer pytrees and shard them into S pipeline stages.

    Returns a pytree with leaves (S, L//S, ...), stage axis sharded over the
    mesh's 'model' axis (one stage resident per model-axis device row).
    """
    n_stages = mesh.shape[MODEL_AXIS]
    stacked = stack_layers(layers)
    n_layers = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    if n_layers % n_stages != 0:
        raise ValueError(f"{n_layers} layers not divisible into "
                         f"{n_stages} pipeline stages")
    per = n_layers // n_stages
    staged = jax.tree_util.tree_map(
        lambda l: l.reshape((n_stages, per) + l.shape[1:]), stacked)
    return jax.device_put(staged, NamedSharding(mesh, P(MODEL_AXIS)))


def gpipe(layer_fn, staged, x, *, mesh, n_micro: int, capture_before=None):
    """Apply a pipelined homogeneous layer stack to a batch.

    layer_fn(layer_params, h) -> h applies ONE layer (h keeps its shape and
    dtype). ``staged`` is the output of shard_stages. ``x`` is the (B, ...)
    input batch; B must divide into mesh_data * n_micro equal microbatches.

    capture_before=k additionally returns the hidden state as it was just
    BEFORE layer k (global index) — the seam CLIP's penultimate /
    clip_skip outputs need (models/clip.py::clip_text_apply).

    Returns y (B, ...) or (y, captured) when capture_before is set.
    """
    n_data = mesh.shape[DATA_AXIS]
    n_stages = mesh.shape[MODEL_AXIS]
    per = jax.tree_util.tree_leaves(staged)[0].shape[1]
    batch = x.shape[0]
    if batch % (n_data * n_micro) != 0:
        raise ValueError(f"batch {batch} not divisible by data axis "
                         f"{n_data} x n_micro {n_micro}")
    bm = batch // (n_data * n_micro)
    cap_stage = None if capture_before is None else capture_before // per
    if capture_before is not None and not 0 <= capture_before < n_stages * per:
        raise ValueError(f"capture_before={capture_before} out of range")

    def local_fn(staged_loc, x_loc):
        # staged_loc leaves (1, per, ...); x_loc (B/n_data, ...)
        stage_layers = jax.tree_util.tree_map(lambda l: l[0], staged_loc)
        s = lax.axis_index(MODEL_AXIS)
        xm = x_loc.reshape((n_micro, bm) + x_loc.shape[1:])

        def stage_apply(h):
            """Inner scan over this stage's layer group, capturing the
            pre-layer hidden at the global capture index (if any)."""
            def body(carry, inp):
                h, cap = carry
                j, lyr = inp
                if capture_before is not None:
                    gidx = s * per + j
                    cap = jnp.where(gidx == capture_before, h, cap)
                return (layer_fn(lyr, h), cap), None
            (h, cap), _ = lax.scan(
                body, (h, jnp.zeros_like(h) if capture_before is not None
                       else jnp.zeros((), h.dtype)),
                (jnp.arange(per), stage_layers))
            return h, cap

        n_ticks = n_micro + n_stages - 1
        act0 = jnp.zeros_like(xm[0])
        outs0 = jnp.zeros((n_micro,) + act0.shape, act0.dtype)
        # caps buffer only exists when a capture seam was requested — it
        # would otherwise be dead weight carried through the whole scan
        caps0 = outs0 if capture_before is not None else None
        ring = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(carry, t):
            act, outs, caps = carry
            m = t - s                      # this stage's microbatch index
            valid = (m >= 0) & (m < n_micro)
            mm = jnp.clip(m, 0, n_micro - 1)
            # stage 0 pulls fresh microbatches; later stages use the ring
            fresh = lax.dynamic_index_in_dim(
                xm, jnp.clip(t, 0, n_micro - 1), keepdims=False)
            h = jnp.where(s == 0, fresh, act)
            y, cap = stage_apply(h)

            def masked_write(buf, val, on_stage):
                prev = lax.dynamic_index_in_dim(buf, mm, keepdims=False)
                val = jnp.where(valid & (s == on_stage), val, prev)
                return lax.dynamic_update_index_in_dim(buf, val, mm, 0)

            outs = masked_write(outs, y, n_stages - 1)
            if capture_before is not None:
                caps = masked_write(caps, cap, cap_stage)
            act = lax.ppermute(y, MODEL_AXIS, ring)
            return (act, outs, caps), None

        (_, outs, caps), _ = lax.scan(
            tick, (act0, outs0, caps0), jnp.arange(n_ticks))
        # Leading singleton stage axis so out_specs can stack over 'model'.
        # The stacked (S, ...) output stays physically SHARDED over the
        # model axis (each device holds only its own row); collect() below
        # gathers just the owning stage's row.
        if capture_before is None:
            return outs[None], jnp.zeros((1,), outs.dtype)
        return outs[None], caps[None]

    buf_spec = P(MODEL_AXIS, None, DATA_AXIS)
    outs, caps = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(MODEL_AXIS), P(DATA_AXIS)),
        out_specs=(buf_spec,
                   buf_spec if capture_before is not None else P(MODEL_AXIS)),
        check_vma=False,
    )(staged, x)

    def collect(buf, stage):
        # (S, n_micro, B/n_micro, ...) -> batch order (data row, microbatch)
        y = buf[stage]
        y = y.reshape((n_micro, n_data, bm) + y.shape[2:])
        return y.swapaxes(0, 1).reshape((batch,) + y.shape[3:])

    y = collect(outs, n_stages - 1)
    if capture_before is None:
        return y
    return y, collect(caps, cap_stage)
