"""Pipeline parallelism (parallel/pp.py): the GPipe schedule over the CLIP
text tower's homogeneous layer stack must match the sequential forward
exactly. Beyond-reference capability — the reference's only parallelism is
accelerate DDP (train_xl.py:468); the mesh axes here are (data, model=pipe).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from idmvton_tpu.core.config import CLIPTextConfig
from idmvton_tpu.models.clip import (
    init_clip_text, clip_text_apply, clip_text_apply_pp, _encoder_layer,
)
from idmvton_tpu.models.layers import ACTIVATIONS
from idmvton_tpu.parallel.mesh import make_mesh
from idmvton_tpu.parallel.pp import gpipe, shard_stages, stack_layers

DTYPE = jnp.float32


@pytest.fixture(scope="module")
def tower():
    cfg = CLIPTextConfig.tiny(num_layers=8, use_final_projection=True)
    params = init_clip_text(jax.random.PRNGKey(0), cfg, dtype=DTYPE)
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 12), 0,
                             cfg.vocab_size)
    ref = jax.tree_util.tree_map(
        np.asarray, clip_text_apply(params, cfg, ids))
    return cfg, params, ids, ref


def _assert_matches(out, ref):
    for k in ("penultimate", "last_hidden", "pooled"):
        np.testing.assert_allclose(np.asarray(out[k]), ref[k],
                                   atol=1e-5, rtol=1e-5, err_msg=k)


def test_pp_matches_sequential_dp2_pp4(tower):
    cfg, params, ids, ref = tower
    mesh = make_mesh(jax.devices(), data=2, model=4)
    out = clip_text_apply_pp(params, cfg, ids, mesh=mesh, n_micro=2)
    _assert_matches(out, ref)


def test_pp_matches_sequential_pure_pp8(tower):
    cfg, params, ids, ref = tower
    mesh = make_mesh(jax.devices(), data=1, model=8)
    out = clip_text_apply_pp(params, cfg, ids, mesh=mesh, n_micro=4)
    _assert_matches(out, ref)


def test_pp_single_microbatch_and_deep_pipe(tower):
    cfg, params, ids, ref = tower
    mesh = make_mesh(jax.devices(), data=4, model=2)
    out = clip_text_apply_pp(params, cfg, ids, mesh=mesh, n_micro=1)
    _assert_matches(out, ref)


def test_pp_clip_skip_capture(tower):
    cfg, params, ids, _ = tower
    mesh = make_mesh(jax.devices(), data=2, model=4)
    ref = jax.tree_util.tree_map(
        np.asarray, clip_text_apply(params, cfg, ids, clip_skip=2))
    out = clip_text_apply_pp(params, cfg, ids, mesh=mesh, n_micro=2,
                             clip_skip=2)
    _assert_matches(out, ref)


def test_gpipe_capture_on_stage_boundary(tower):
    """capture_before on the first layer of a stage (hidden crosses the
    ring seam) and on layer 0 (the raw input) both come back exact."""
    cfg, params, ids, _ = tower
    mesh = make_mesh(jax.devices(), data=2, model=4)
    act = ACTIVATIONS[cfg.hidden_act]
    layer_fn = lambda lyr, h: _encoder_layer(
        lyr, h, num_heads=cfg.num_heads, act=act, causal=True)
    staged = shard_stages(params["layers"], mesh)
    x = jax.random.normal(jax.random.PRNGKey(3),
                          (8, 12, cfg.hidden_size), DTYPE)

    hs = [x]
    for lyr in params["layers"]:
        hs.append(layer_fn(lyr, hs[-1]))
    for cap_idx in (0, 2, 4):  # layer 2/4 = first layer of stages 1/2
        y, cap = gpipe(layer_fn, staged, x, mesh=mesh, n_micro=2,
                       capture_before=cap_idx)
        np.testing.assert_allclose(np.asarray(y), np.asarray(hs[-1]),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(cap), np.asarray(hs[cap_idx]),
                                   atol=1e-5, rtol=1e-5)


def test_pp_bf16_schedule_is_noise_free():
    """Production tower dtype. The honest bf16 oracle must share BOTH the
    microbatch slicing and the scan-over-stacked-layers compute structure
    (bf16 rounding is fusion-dependent: an unrolled Python loop or a
    full-batch forward rounds differently and drifts to ~0.1 after 8
    norm-amplified layers). Against that oracle the GPipe schedule —
    ppermute hops, masked writes, bubble compute — must be (and is)
    BIT-EXACT: pipelining adds zero numeric noise of its own."""
    cfg = CLIPTextConfig.tiny(num_layers=8)
    params = init_clip_text(jax.random.PRNGKey(4), cfg, dtype=jnp.bfloat16)
    act = ACTIVATIONS[cfg.hidden_act]
    layer_fn = lambda lyr, h: _encoder_layer(
        lyr, h, num_heads=cfg.num_heads, act=act, causal=True)
    x = jax.random.normal(jax.random.PRNGKey(5),
                          (8, 12, cfg.hidden_size), jnp.bfloat16)

    mesh = make_mesh(jax.devices(), data=2, model=4)
    staged = shard_stages(params["layers"], mesh)
    y = gpipe(layer_fn, staged, x, mesh=mesh, n_micro=2)

    stacked = stack_layers(params["layers"])

    def seq_scan(h):
        def body(h, lyr):
            return layer_fn(lyr, h), None
        return jax.lax.scan(body, h, stacked)[0]

    # bm=2: batch 8 / (data 2 x micro 2) — same slices the schedule uses
    ref = jnp.concatenate([seq_scan(x[i:i + 2]) for i in range(0, 8, 2)], 0)
    np.testing.assert_array_equal(np.asarray(y, np.float32),
                                  np.asarray(ref, np.float32))


def test_gpipe_is_differentiable(tower):
    """jax.grad flows through the GPipe schedule (shard_map + ppermute +
    scan): param grads match the sequential loop's grads — pp is usable for
    stage-sharded training of a homogeneous stack, not just inference."""
    cfg, params, _, _ = tower
    mesh = make_mesh(jax.devices(), data=2, model=4)
    act = ACTIVATIONS[cfg.hidden_act]
    layer_fn = lambda lyr, h: _encoder_layer(
        lyr, h, num_heads=cfg.num_heads, act=act, causal=True)
    staged = shard_stages(params["layers"], mesh)
    stacked = stack_layers(params["layers"])
    x = jax.random.normal(jax.random.PRNGKey(7),
                          (8, 12, cfg.hidden_size), DTYPE)

    def loss_pp(staged):
        return jnp.mean(gpipe(layer_fn, staged, x, mesh=mesh, n_micro=2) ** 2)

    def loss_seq(layers):
        h = x
        for i in range(cfg.num_layers):
            h = layer_fn(jax.tree_util.tree_map(lambda l: l[i], layers), h)
        return jnp.mean(h ** 2)

    g_pp = jax.grad(loss_pp)(staged)
    g_seq = jax.grad(loss_seq)(stacked)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b).reshape(a.shape),
            atol=2e-3, rtol=2e-3),
        g_pp, g_seq)


def test_pp_single_stage_degenerates_to_sequential(tower):
    """model=1 mesh: the ring is a self-loop and the schedule reduces to
    microbatched sequential execution — still exact."""
    cfg, params, ids, ref = tower
    mesh = make_mesh(jax.devices(), data=8, model=1)
    out = clip_text_apply_pp(params, cfg, ids, mesh=mesh, n_micro=1)
    _assert_matches(out, ref)


def test_pp_validation_errors(tower):
    cfg, params, ids, _ = tower
    mesh = make_mesh(jax.devices(), data=2, model=4)
    with pytest.raises(ValueError):  # 6 layers not divisible into 4 stages
        shard_stages(params["layers"][:6], make_mesh(jax.devices()[:4],
                                                     data=1, model=4))
    with pytest.raises(ValueError):  # batch 8 % (data2 x micro3) != 0
        clip_text_apply_pp(params, cfg, ids, mesh=mesh, n_micro=3)


def test_pp_prestaged_params_reused(tower):
    """Production path: stage the layer stack ONCE at load time and pass it
    to every forward (the replicated params['layers'] can then be dropped —
    1/S weight residency per chip)."""
    cfg, params, ids, ref = tower
    mesh = make_mesh(jax.devices(), data=2, model=4)
    staged = shard_stages(params["layers"], mesh)
    headless = {k: v for k, v in params.items() if k != "layers"}
    for _ in range(2):
        out = clip_text_apply_pp(headless, cfg, ids, mesh=mesh, n_micro=2,
                                 staged=staged)
        _assert_matches(out, ref)


def test_pp_vision_tower_matches_sequential():
    from idmvton_tpu.core.config import CLIPVisionConfig
    from idmvton_tpu.models.clip import (
        init_clip_vision, clip_vision_apply, clip_vision_apply_pp,
    )
    cfg = CLIPVisionConfig.tiny()  # num_layers=2 -> 2 stages x 1 layer
    params = init_clip_vision(jax.random.PRNGKey(0), cfg, dtype=DTYPE)
    px = jax.random.uniform(jax.random.PRNGKey(1),
                            (8, cfg.image_size, cfg.image_size, 3), DTYPE,
                            -1, 1)
    ref = clip_vision_apply(params, cfg, px)
    mesh = make_mesh(jax.devices(), data=4, model=2)
    out = clip_vision_apply_pp(params, cfg, px, mesh=mesh, n_micro=2)
    for k in ("penultimate", "image_embeds"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=1e-5, rtol=1e-5, err_msg=k)


def test_stack_layers_shapes(tower):
    cfg, params, _, _ = tower
    stacked = stack_layers(params["layers"])
    leaf = stacked["attn"]["q"]["kernel"]
    assert leaf.shape == (cfg.num_layers, cfg.hidden_size, cfg.hidden_size)
