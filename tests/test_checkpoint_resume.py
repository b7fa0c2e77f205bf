"""Train-state save/resume round trip."""

import jax
import jax.numpy as jnp
import numpy as np

from idmvton_tpu.core.config import SchedulerConfig
from idmvton_tpu.diffusion.scheduler import DDPMScheduler
from idmvton_tpu.pipeline.tryon import TryonModels
from idmvton_tpu.train.train_step import (
    make_optimizer, init_train_state, make_train_step,
)
from idmvton_tpu.weights.checkpoint import (
    save_train_state, load_train_state, latest_train_state_step,
)
from tests.test_train import _batch


def test_train_state_resume_roundtrip(tmp_path):
    models = TryonModels.init(jax.random.PRNGKey(0), micro=True,
                              dtype=jnp.float32)
    sched = DDPMScheduler(SchedulerConfig.train())
    tx = make_optimizer(learning_rate=1e-4)
    state = init_train_state(models, tx)
    step = jax.jit(make_train_step(models, sched, tx,
                                   compute_dtype=jnp.float32, remat=False))
    batch = _batch(2, 32, 32, models)
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    path = str(tmp_path / "state")
    save_train_state(path, state)
    assert latest_train_state_step(path) == 1

    template = init_train_state(models, tx)
    restored = load_train_state(path, template)
    assert int(restored.step) == 1
    a = jax.tree_util.tree_leaves(state.trainable)
    b = jax.tree_util.tree_leaves(restored.trainable)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # resumed state trains onward identically to the uninterrupted run
    s1, m1 = step(state, batch, jax.random.PRNGKey(2))
    s2, m2 = step(restored, batch, jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    assert int(s2.step) == 2


def test_prune_old_states(tmp_path):
    models = TryonModels.init(jax.random.PRNGKey(0), micro=True,
                              dtype=jnp.float32)
    tx = make_optimizer()
    state = init_train_state(models, tx)
    path = str(tmp_path / "state")
    import dataclasses
    for s in range(5):
        st = dataclasses.replace(state, step=jnp.asarray(s, jnp.int32))
        save_train_state(path, st, keep=2)
    import os
    kept = sorted(os.listdir(path))
    assert kept == ["state_3", "state_4"]


def test_save_diffusers_roundtrip(tmp_path):
    """save_diffusers writes a diffusers-layout tree (model_index.json +
    subfolder safetensors, train_xl.py:770-792 capability) that
    from_diffusers loads back to numerically identical params."""
    from idmvton_tpu.weights.checkpoint import save_diffusers, from_diffusers
    import os

    models = TryonModels.init(jax.random.PRNGKey(3), tiny=True,
                              dtype=jnp.float32)
    root = str(tmp_path / "diffusers_tree")
    save_diffusers(root, models)

    assert os.path.isfile(os.path.join(root, "model_index.json"))
    for sub, fname in (("unet", "diffusion_pytorch_model.safetensors"),
                       ("unet_encoder", "diffusion_pytorch_model.safetensors"),
                       ("vae", "diffusion_pytorch_model.safetensors"),
                       ("text_encoder", "model.safetensors"),
                       ("text_encoder_2", "model.safetensors"),
                       ("image_encoder", "model.safetensors")):
        assert os.path.isfile(os.path.join(root, sub, fname)), sub
        assert os.path.isfile(os.path.join(root, sub, "config.json")), sub

    loaded = from_diffusers(root, dtype=jnp.float32)
    for field in ("unet", "garm", "vae", "clip_l", "clip_g", "vision",
                  "resampler"):
        want = getattr(models, field)
        got = getattr(loaded, field)
        flat_w, tdef_w = jax.tree_util.tree_flatten(want)
        flat_g, tdef_g = jax.tree_util.tree_flatten(got)
        assert tdef_w == tdef_g, field
        for w, g in zip(flat_w, flat_g):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=1e-6, err_msg=field)


def test_checkpoint_bringup_calibrates_fixed_shift(tmp_path):
    """r4 verdict #4: loading a checkpoint whose attention logits exceed the
    fixed-shift clamp must flip the process to the exact online-max softmax
    WITHOUT operator action — load_pipeline runs
    calibrate_attention_softmax automatically. A well-behaved checkpoint
    calibrates clean and keeps (or restores) the fast path."""
    import dataclasses
    from idmvton_tpu.core.config import UNetConfig
    from idmvton_tpu.models.unet import init_unet
    from idmvton_tpu.ops import pallas_attention as PA
    from idmvton_tpu.weights.checkpoint import save_pipeline, load_pipeline

    # tiny stack whose FIRST attn site is flash-servable (inner=128, d=16)
    cfg = UNetConfig.tiny("consume", block_out_channels=(32, 128, 256))
    unet = init_unet(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    models = TryonModels.init(jax.random.PRNGKey(0), tiny=True,
                              dtype=jnp.float32)
    models = dataclasses.replace(models, unet_cfg=cfg, unet=unet)

    site = models.unet["down_blocks"][1]["attentions"][0]["blocks"][0]
    kernel = site["attn1"]["to_qkv"]["kernel"]
    c, three_inner = kernel.shape
    inner = three_inner // 3

    clean_path = str(tmp_path / "clean")
    save_pipeline(clean_path, models)

    # hot finetune: q/k columns share a large random matrix, so logits land
    # far above _FIXED_SHIFT_CLAMP with distinct magnitudes
    w_qk = 0.5 * jax.random.normal(jax.random.PRNGKey(7), (c, inner),
                                   jnp.float32)
    hot = jnp.concatenate([w_qk, w_qk, kernel[:, 2 * inner:]], axis=1)
    site["attn1"]["to_qkv"]["kernel"] = hot
    hot_path = str(tmp_path / "hot")
    save_pipeline(hot_path, models)

    old = PA._FIXED_SHIFT_FORCED_OFF
    try:
        PA._FIXED_SHIFT_FORCED_OFF = False
        load_pipeline(hot_path, dtype=jnp.float32)
        assert not PA._fixed_shift(), \
            "hot-logit checkpoint must auto-force the online-max softmax"
        # switching to a well-behaved checkpoint restores the fast path
        load_pipeline(clean_path, dtype=jnp.float32)
        assert PA._fixed_shift()
    finally:
        PA._FIXED_SHIFT_FORCED_OFF = old


def test_checkpoint_bringup_calibrates_garment_tower(tmp_path):
    """r5: the calibration probe covers BOTH towers and depths — a finetune
    whose hot logits live only in the GarmentNet's MID block (the old
    single-site probe looked at the TryonNet's first down level and would
    have passed this checkpoint) must also auto-force the exact softmax."""
    import dataclasses
    from idmvton_tpu.core.config import UNetConfig
    from idmvton_tpu.models.unet import init_unet
    from idmvton_tpu.ops import pallas_attention as PA
    from idmvton_tpu.weights.checkpoint import save_pipeline, load_pipeline

    gcfg = UNetConfig.tiny("emit", block_out_channels=(32, 128, 256))
    garm = init_unet(jax.random.PRNGKey(5), gcfg, dtype=jnp.float32)
    models = TryonModels.init(jax.random.PRNGKey(0), tiny=True,
                              dtype=jnp.float32)
    models = dataclasses.replace(models, garm_cfg=gcfg, garm=garm)

    site = models.garm["mid_block"]["attentions"][0]["blocks"][0]
    kernel = site["attn1"]["to_qkv"]["kernel"]
    c, three_inner = kernel.shape
    inner = three_inner // 3
    w_qk = 0.5 * jax.random.normal(jax.random.PRNGKey(9), (c, inner),
                                   jnp.float32)
    site["attn1"]["to_qkv"]["kernel"] = jnp.concatenate(
        [w_qk, w_qk, kernel[:, 2 * inner:]], axis=1)
    hot_path = str(tmp_path / "hot_garm")
    save_pipeline(hot_path, models)

    old = PA._FIXED_SHIFT_FORCED_OFF
    try:
        PA._FIXED_SHIFT_FORCED_OFF = False
        load_pipeline(hot_path, dtype=jnp.float32)
        assert not PA._fixed_shift(), \
            "garment-tower hot logits must auto-force the online-max softmax"
    finally:
        PA._FIXED_SHIFT_FORCED_OFF = old
