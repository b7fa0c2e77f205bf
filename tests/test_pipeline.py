"""End-to-end pipeline tests on tiny models (CPU), including the 8-device
data-parallel path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idmvton_tpu.pipeline.tryon import TryonModels, TryonPipeline
from idmvton_tpu.parallel.mesh import make_mesh, shard_batch, replicate_params

DTYPE = jnp.float32


def _tiny_inputs(b, h, w, models, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 8)
    vocab = models.clip_l_cfg.vocab_size
    seq = 7
    img = lambda k, c=3: jax.random.uniform(ks[k], (b, h, w, c), DTYPE, -1, 1)
    ids = lambda k: jax.random.randint(ks[k], (b, seq), 0, vocab)
    isz = models.vision_cfg.image_size
    return dict(
        person=img(0), pose=img(1), cloth=img(2),
        mask=(jax.random.uniform(ks[3], (b, h, w, 1)) > 0.5).astype(DTYPE),
        prompt_ids_l=ids(4), prompt_ids_g=ids(4),
        neg_ids_l=ids(5), neg_ids_g=ids(5),
        cloth_ids_l=ids(6), cloth_ids_g=ids(6),
        ip_pixels=jax.random.uniform(ks[7], (b, isz, isz, 3), DTYPE, -1, 1),
    )



@pytest.fixture(scope="module")
def tiny_models():
    """ONE shared tiny model stack for the module (each init costs ~5-8 s on
    this host even with a warm compile cache; every test treats it
    read-only — the int8 tests quantize into NEW param dicts)."""
    return TryonModels.init(jax.random.PRNGKey(0), tiny=True, dtype=DTYPE)


@pytest.fixture(scope="module")
def tiny_pipe(tiny_models):
    return TryonPipeline(tiny_models)


def test_generate_end_to_end_tiny(tiny_models, tiny_pipe):
    models, pipe = tiny_models, tiny_pipe
    b, h, w = 2, 32, 32
    inputs = _tiny_inputs(b, h, w, models)
    fn = pipe.jit_generate(num_steps=3, guidance_scale=2.0)
    images = fn(models.params(), jax.random.PRNGKey(1), **inputs)
    assert images.shape == (b, h, w, 3)
    assert jnp.isfinite(images).all()
    assert float(jnp.abs(images).max()) <= 1.0

    # determinism: same rng -> same image
    images2 = fn(models.params(), jax.random.PRNGKey(1), **inputs)
    np.testing.assert_array_equal(np.asarray(images), np.asarray(images2))
    # different rng -> different image
    images3 = fn(models.params(), jax.random.PRNGKey(2), **inputs)
    assert float(jnp.abs(images3 - images).max()) > 1e-4


def test_generate_data_parallel_matches_single_device(tiny_models, tiny_pipe):
    """Batch sharded over an 8-device mesh must produce the same images as
    unsharded execution (weights replicated — the reference's DDP analog)."""
    models, pipe = tiny_models, tiny_pipe
    b, h, w = 8, 64, 64
    inputs = _tiny_inputs(b, h, w, models)
    fn = pipe.jit_generate(num_steps=2)
    ref = np.asarray(fn(models.params(), jax.random.PRNGKey(1), **inputs))

    mesh = make_mesh()
    params = replicate_params(models.params(), mesh)
    sharded_inputs = shard_batch(inputs, mesh)
    out = fn(params, jax.random.PRNGKey(1), **sharded_inputs)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_garment_cache_once_mode(tiny_models, tiny_pipe):
    """garment_cache='once' produces valid (different) images with ~1/3 fewer
    garmnet forwards."""
    models, pipe = tiny_models, tiny_pipe
    b, h, w = 1, 32, 32
    inputs = _tiny_inputs(b, h, w, models)
    import functools
    gen_once = jax.jit(functools.partial(
        pipe.generate, num_steps=3, garment_cache="once"))
    img = gen_once(models.params(), jax.random.PRNGKey(1), **inputs)
    assert img.shape == (b, h, w, 3)
    assert jnp.isfinite(img).all()


def test_garment_cache_once_quality_bound(tiny_models, tiny_pipe):
    """Quantified quality statement for the serving flag: the 'once' output
    stays CLOSE to reference 'every_step' semantics. Measured on tiny random
    weights: SSIM(every, once) = 0.77 @ 3 steps / 0.81 @ 6 steps, vs 0.012
    between different seeds — the cache preserves the trajectory, it doesn't
    just produce 'a valid image'. Converged SDXL weights vary even less
    across timesteps than random ones, so this is a conservative floor."""
    import functools
    from idmvton_tpu.utils.metrics import ssim

    models, pipe = tiny_models, tiny_pipe
    b, h, w = 1, 32, 32
    inputs = _tiny_inputs(b, h, w, models)
    g_every = jax.jit(functools.partial(pipe.generate, num_steps=3))
    g_once = jax.jit(functools.partial(pipe.generate, num_steps=3,
                                       garment_cache="once"))
    every = g_every(models.params(), jax.random.PRNGKey(1), **inputs)
    once = g_once(models.params(), jax.random.PRNGKey(1), **inputs)
    other = g_every(models.params(), jax.random.PRNGKey(2), **inputs)
    s_once = float(ssim(every, once))
    s_other = float(ssim(every, other))
    assert s_once > 0.5, s_once
    assert s_once > s_other + 0.3, (s_once, s_other)


def test_stepwise_generate_matches_contract(tiny_models, tiny_pipe):
    """stepwise_generate: same math as generate() via small programs."""
    models, pipe = tiny_models, tiny_pipe
    b, h, w = 1, 32, 32
    inputs = _tiny_inputs(b, h, w, models)
    fn = pipe.stepwise_generate(num_steps=2)
    img = fn(models.params(), jax.random.PRNGKey(1), **inputs)
    assert img.shape == (b, h, w, 3)
    assert jnp.isfinite(img).all()
    img2 = fn(models.params(), jax.random.PRNGKey(1), **inputs)
    np.testing.assert_array_equal(np.asarray(img), np.asarray(img2))


def test_stepwise_equals_fused_with_injected_noise(tiny_models, tiny_pipe):
    """With deterministic (posterior-mode) VAE encodes and injected
    init/step noises, the stepwise serving path and the fused generate()
    program compute the same trajectory (golden fixtures dumped against one
    path are valid for the other)."""
    models, pipe = tiny_models, tiny_pipe
    b, h, w = 1, 32, 32
    inputs = _tiny_inputs(b, h, w, models)
    lat_hw = (h // models.vae_cfg.downscale, w // models.vae_cfg.downscale)
    init_noise = jax.random.normal(jax.random.PRNGKey(7),
                                   (b, *lat_hw, 4), jnp.float32)
    step_noise = jax.random.normal(jax.random.PRNGKey(8),
                                   (2, b, *lat_hw, 4), jnp.float32)

    fused = pipe.jit_generate(num_steps=2, vae_sample=False)(
        models.params(), jax.random.PRNGKey(1), **inputs,
        init_noise=init_noise, step_noise=step_noise)
    stepwise = pipe.stepwise_generate(num_steps=2, vae_sample=False)(
        models.params(), jax.random.PRNGKey(2), **inputs,
        init_noise=init_noise, step_noise=step_noise)
    np.testing.assert_allclose(np.asarray(stepwise), np.asarray(fused),
                               rtol=2e-5, atol=2e-5)


def test_make_time_ids_reference_formula():
    """Reproduces _get_add_time_ids (src/tryon_pipeline.py:1024-1061) for
    non-default crops/sizes, including the reference's quirk of reusing the
    POSITIVE crops_coords_top_left in the negative ids; defaults unchanged."""
    from idmvton_tpu.pipeline.tryon import make_time_ids

    # defaults: [h, w, 0, 0, h, w] both halves
    ids = make_time_ids(1024, 768, 2, jnp.float32)
    assert ids.shape == (4, 6)
    np.testing.assert_array_equal(
        np.asarray(ids), np.tile([1024, 768, 0, 0, 1024, 768], (4, 1)))

    # non-default everything (reference __call__ kwargs :1366-1383)
    ids = make_time_ids(
        1024, 768, 1, jnp.float32,
        original_size=(2048, 1536), crops_coords_top_left=(12, 34),
        target_size=(512, 384),
        negative_original_size=(100, 200),
        negative_crops_coords_top_left=(56, 78),
        negative_target_size=(300, 400))
    # negative half first (CFG order), with the POSITIVE crop coords (:1044)
    np.testing.assert_array_equal(np.asarray(ids[0]),
                                  [100, 200, 12, 34, 300, 400])
    np.testing.assert_array_equal(np.asarray(ids[1]),
                                  [2048, 1536, 12, 34, 512, 384])

    # negative_* default to the positive values (:1685-1689)
    ids = make_time_ids(64, 64, 1, jnp.float32,
                        original_size=(128, 128), target_size=(32, 32))
    np.testing.assert_array_equal(np.asarray(ids[0]),
                                  [128, 128, 0, 0, 32, 32])

    # aesthetic branch (requires_aesthetics_score, :1038-1041): 5 ids,
    # negative half DOES use its own crop coords here
    ids = make_time_ids(64, 64, 1, jnp.float32,
                        crops_coords_top_left=(1, 2),
                        negative_crops_coords_top_left=(3, 4),
                        aesthetic_score=6.0, negative_aesthetic_score=2.5,
                        requires_aesthetics_score=True)
    assert ids.shape == (2, 5)
    np.testing.assert_array_equal(np.asarray(ids[0]), [64, 64, 3, 4, 2.5])
    np.testing.assert_array_equal(np.asarray(ids[1]), [64, 64, 1, 2, 6.0])


def test_encode_conditioning_micro_conditioning_plumbs(tiny_models, tiny_pipe):
    """encode_conditioning(micro_conditioning=...) reaches the time_ids."""
    models, pipe = tiny_models, tiny_pipe
    inputs = _tiny_inputs(1, 64, 64, models)
    cond = pipe.encode_conditioning(
        models.params(), jax.random.PRNGKey(1), **inputs,
        micro_conditioning=dict(original_size=(96, 96),
                                crops_coords_top_left=(5, 6)))
    np.testing.assert_array_equal(np.asarray(cond["time_ids"][-1]),
                                  [96, 96, 5, 6, 64, 64])


# ---------------------------------------------------------------------------
# reference __call__ breadth: denoising_start/end, num_images_per_prompt,
# clip_skip, callback_on_step_end (round 4)
# ---------------------------------------------------------------------------


def test_timesteps_denoising_start_end_reference_formula():
    """Scheduler head/tail trims reproduce the reference's arithmetic:
    get_timesteps (src/tryon_pipeline.py:987-1011) for denoising_start and
    the __call__ tail trim (:1743-1752) for denoising_end."""
    from idmvton_tpu.core.config import SchedulerConfig
    from idmvton_tpu.diffusion.scheduler import DDPMScheduler

    sched = DDPMScheduler(SchedulerConfig.sdxl_inference())
    n = sched.cfg.num_train_timesteps
    num = 10
    full = np.asarray(sched.timesteps(num))

    for start in (0.25, 0.5, 0.8):
        got = np.asarray(sched.timesteps(num, denoising_start=start))
        cutoff = int(round(n - start * n))
        np.testing.assert_array_equal(got, full[full < cutoff])
        # strength must be IGNORED when denoising_start is set (:997-998)
        got2 = np.asarray(sched.timesteps(num, strength=0.3,
                                          denoising_start=start))
        np.testing.assert_array_equal(got2, got)

    for end in (0.25, 0.5, 0.8):
        got = np.asarray(sched.timesteps(num, denoising_end=end))
        cutoff = int(round(n - end * n))
        np.testing.assert_array_equal(got, full[full >= cutoff])

    # end trim keeps prev pointing at the full schedule's next timestep
    # (diffusers DDPM computes prev_t from num_inference_steps alone), so a
    # successor pipeline resumes exactly where this one stopped
    ts_e, prev_e = sched.timesteps_and_prev(num, denoising_end=0.5)
    k = int(ts_e.shape[0])
    assert 0 < k < num
    assert int(prev_e[-1]) == int(full[k])  # NOT -1
    # and the successor's schedule is exactly the leftover tail
    ts_s = np.asarray(sched.timesteps(num, denoising_start=0.5))
    np.testing.assert_array_equal(ts_s, full[k:])


def test_denoising_values_outside_unit_interval_ignored():
    """Reference denoising_value_valid (src/tryon_pipeline.py:1586-1589):
    start/end outside (0, 1) are IGNORED — the strength path applies — and a
    valid start >= valid end raises (advisor r4 #1: denoising_start=1.0 must
    not silently return the input latents)."""
    import pytest
    from idmvton_tpu.core.config import SchedulerConfig
    from idmvton_tpu.diffusion.scheduler import DDPMScheduler

    sched = DDPMScheduler(SchedulerConfig.sdxl_inference())
    num = 10
    full = np.asarray(sched.timesteps(num))
    for bad in (0.0, 1.0, 1.5, -0.2):
        np.testing.assert_array_equal(
            np.asarray(sched.timesteps(num, denoising_start=bad)), full)
        np.testing.assert_array_equal(
            np.asarray(sched.timesteps(num, denoising_end=bad)), full)
        # ignored start -> strength truncation applies again
        np.testing.assert_array_equal(
            np.asarray(sched.timesteps(num, strength=0.5,
                                       denoising_start=bad)),
            np.asarray(sched.timesteps(num, strength=0.5)))
    with pytest.raises(ValueError):
        sched.timesteps(num, denoising_start=0.7, denoising_end=0.3)
    with pytest.raises(ValueError):
        sched.timesteps_and_prev(num, denoising_start=0.5, denoising_end=0.5)


def test_output_type_latent_refiner_handoff(tiny_models, tiny_pipe):
    """output_type='latent' (reference :1868-1870) returns the raw latents
    from generate/stepwise; decoding them reproduces the default output, so
    a base->refiner chain can ride the public API (advisor r4 #2)."""
    models, pipe = tiny_models, tiny_pipe
    b, h, w, num = 1, 32, 32, 2
    inputs = _tiny_inputs(b, h, w, models)
    lat_hw = (h // models.vae_cfg.downscale, w // models.vae_cfg.downscale)
    lshape = (b, *lat_hw, models.vae_cfg.latent_channels)
    init_noise = jax.random.normal(jax.random.PRNGKey(7), lshape, jnp.float32)
    step_noise = jax.random.normal(jax.random.PRNGKey(8), (num, *lshape),
                                   jnp.float32)
    kw = dict(init_noise=init_noise, step_noise=step_noise)

    img = pipe.jit_generate(num_steps=num, vae_sample=False)(
        models.params(), jax.random.PRNGKey(1), **inputs, **kw)
    lat = pipe.jit_generate(num_steps=num, vae_sample=False,
                            output_type="latent")(
        models.params(), jax.random.PRNGKey(1), **inputs, **kw)
    assert lat.shape == lshape
    np.testing.assert_allclose(
        np.asarray(pipe.decode(models.params(), lat), np.float32),
        np.asarray(img, np.float32), atol=2e-5)

    lat_sw = pipe.stepwise_generate(num_steps=num, vae_sample=False,
                                    output_type="latent")(
        models.params(), jax.random.PRNGKey(1), **inputs, **kw)
    assert lat_sw.shape == lshape


def test_denoising_split_chain_bit_exact(tiny_models, tiny_pipe):
    """base(denoising_end=x) -> refiner(denoising_start=x) equals the unsplit
    run exactly, given the same injected noises (the reference's documented
    refiner workflow, src/tryon_pipeline.py:1351-1365)."""
    models, pipe = tiny_models, tiny_pipe
    b, h, w = 1, 32, 32
    inputs = _tiny_inputs(b, h, w, models)
    cond = pipe.encode_conditioning(models.params(), jax.random.PRNGKey(1),
                                    **inputs, vae_sample=False)
    lat_hw = (h // models.vae_cfg.downscale, w // models.vae_cfg.downscale)
    lshape = (b, *lat_hw, models.vae_cfg.latent_channels)
    num = 6
    init_noise = jax.random.normal(jax.random.PRNGKey(7), lshape, jnp.float32)
    step_noise = jax.random.normal(jax.random.PRNGKey(8), (num, *lshape),
                                   jnp.float32)

    full = pipe.denoise(models.params(), jax.random.PRNGKey(2), cond,
                        latent_shape=lshape, num_steps=num,
                        init_noise=init_noise, step_noise=step_noise)

    k = int(pipe.scheduler.timesteps(num, denoising_end=0.5).shape[0])
    assert 0 < k < num
    seg1 = pipe.denoise(models.params(), jax.random.PRNGKey(2), cond,
                        latent_shape=lshape, num_steps=num,
                        denoising_end=0.5,
                        init_noise=init_noise, step_noise=step_noise[:k])
    seg2 = pipe.denoise(models.params(), jax.random.PRNGKey(3), cond,
                        latent_shape=lshape, num_steps=num,
                        denoising_start=0.5, latents_in=seg1,
                        init_noise=init_noise, step_noise=step_noise[k:])
    np.testing.assert_array_equal(np.asarray(seg2), np.asarray(full))


def test_num_images_per_prompt_replicates(tiny_models, tiny_pipe):
    """num_images_per_prompt=2 (reference repeat_interleave, tryon_pipeline
    :710-730): with tiled injected noises, both replicas equal the n=1
    image."""
    models, pipe = tiny_models, tiny_pipe
    b, h, w, num = 1, 32, 32, 2
    inputs = _tiny_inputs(b, h, w, models)
    lat_hw = (h // models.vae_cfg.downscale, w // models.vae_cfg.downscale)
    lshape = (b, *lat_hw, models.vae_cfg.latent_channels)
    init_noise = jax.random.normal(jax.random.PRNGKey(7), lshape, jnp.float32)
    step_noise = jax.random.normal(jax.random.PRNGKey(8), (num, *lshape),
                                   jnp.float32)

    one = pipe.jit_generate(num_steps=num, vae_sample=False)(
        models.params(), jax.random.PRNGKey(1), **inputs,
        init_noise=init_noise, step_noise=step_noise)
    two = pipe.jit_generate(num_steps=num, vae_sample=False,
                            num_images_per_prompt=2)(
        models.params(), jax.random.PRNGKey(1), **inputs,
        init_noise=jnp.repeat(init_noise, 2, axis=0),
        step_noise=jnp.repeat(step_noise, 2, axis=1))
    assert two.shape == (2 * b, h, w, 3)
    np.testing.assert_allclose(np.asarray(two[0]), np.asarray(two[1]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(two[0]), np.asarray(one[0]),
                               atol=2e-5)


def test_clip_skip_selects_earlier_layer(tiny_models):
    """clip_skip=k returns hidden_states[-(k+2)] (reference encode_prompt,
    src/tryon_pipeline.py:637-641): on an N-layer tower it must equal the
    default penultimate of the same tower truncated by k layers."""
    import dataclasses
    from idmvton_tpu.models.clip import init_clip_text, clip_text_apply

    models = tiny_models
    cfg = models.clip_l_cfg
    assert cfg.num_layers >= 2
    params = init_clip_text(jax.random.PRNGKey(3), cfg, dtype=DTYPE)
    ids = jax.random.randint(jax.random.PRNGKey(4), (2, 7), 0, cfg.vocab_size)

    default = clip_text_apply(params, cfg, ids)["penultimate"]
    skip0 = clip_text_apply(params, cfg, ids, clip_skip=0)["penultimate"]
    np.testing.assert_array_equal(np.asarray(skip0), np.asarray(default))

    skip1 = clip_text_apply(params, cfg, ids, clip_skip=1)["penultimate"]
    trunc_cfg = dataclasses.replace(cfg, num_layers=cfg.num_layers - 1)
    trunc_params = dict(params, layers=params["layers"][:-1])
    expect = clip_text_apply(trunc_params, trunc_cfg, ids)["penultimate"]
    np.testing.assert_array_equal(np.asarray(skip1), np.asarray(expect))
    assert float(jnp.abs(skip1 - default).max()) > 1e-6

    import pytest
    with pytest.raises(ValueError):
        clip_text_apply(params, cfg, ids, clip_skip=cfg.num_layers)


def test_callback_on_step_end(tiny_models, tiny_pipe):
    """stepwise_generate's host callback fires per step with descending
    timesteps and can override latents (reference callback_on_step_end,
    src/tryon_pipeline.py:1840-1845)."""
    models, pipe = tiny_models, tiny_pipe
    b, h, w, num = 1, 32, 32, 3
    inputs = _tiny_inputs(b, h, w, models)

    seen = []

    def record(p, i, t, kwargs):
        assert p is pipe
        assert set(kwargs) == {"latents"}
        seen.append((i, t))

    base = pipe.stepwise_generate(num_steps=num, callback_on_step_end=record)(
        models.params(), jax.random.PRNGKey(1), **inputs)
    assert [i for i, _ in seen] == list(range(num))
    ts = [t for _, t in seen]
    assert ts == sorted(ts, reverse=True)

    def override(p, i, t, kwargs):
        if i == 0:
            return {"latents": jnp.zeros_like(kwargs["latents"])}

    out = pipe.stepwise_generate(num_steps=num,
                                 callback_on_step_end=override)(
        models.params(), jax.random.PRNGKey(1), **inputs)
    assert float(jnp.abs(out - base).max()) > 1e-5


def test_custom_timesteps_schedule(tiny_models, tiny_pipe):
    """Explicit `timesteps` list (reference retrieve_timesteps,
    src/tryon_pipeline.py:264-302, __call__ :1266): the scheduler adopts the
    list verbatim, prev derives from it, validation rejects non-descending
    input, and a generate() run with the default schedule passed explicitly
    is bit-identical to the num_steps run."""
    import pytest
    from idmvton_tpu.core.config import SchedulerConfig
    from idmvton_tpu.diffusion.scheduler import DDPMScheduler

    sched = DDPMScheduler(SchedulerConfig.sdxl_inference())
    got = np.asarray(sched.timesteps(0, custom_timesteps=[900, 600, 300]))
    np.testing.assert_array_equal(got, [900, 600, 300])
    ts, prev = sched.timesteps_and_prev(0, custom_timesteps=[900, 600, 300])
    np.testing.assert_array_equal(np.asarray(prev), [600, 300, -1])
    # strength truncation uses len(timesteps) as num_inference_steps
    got = np.asarray(sched.timesteps(0, strength=0.5,
                                     custom_timesteps=[901, 601, 301, 10]))
    np.testing.assert_array_equal(got, [301, 10])
    for bad in ([300, 600], [], [1200, 600]):
        with pytest.raises(ValueError):
            sched.timesteps(0, custom_timesteps=bad)

    models, pipe = tiny_models, tiny_pipe
    b, h, w, num = 1, 32, 32, 2
    inputs = _tiny_inputs(b, h, w, models)
    lat_hw = (h // models.vae_cfg.downscale, w // models.vae_cfg.downscale)
    lshape = (b, *lat_hw, models.vae_cfg.latent_channels)
    kw = dict(
        init_noise=jax.random.normal(jax.random.PRNGKey(7), lshape,
                                     jnp.float32),
        step_noise=jax.random.normal(jax.random.PRNGKey(8), (num, *lshape),
                                     jnp.float32))
    default_ts = [int(t) for t in np.asarray(pipe.scheduler.timesteps(num))]
    a = pipe.jit_generate(num_steps=num, vae_sample=False)(
        models.params(), jax.random.PRNGKey(1), **inputs, **kw)
    c = pipe.jit_generate(num_steps=num, vae_sample=False,
                          timesteps=default_ts)(
        models.params(), jax.random.PRNGKey(1), **inputs, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_precomputed_conditioning_passthrough(tiny_models, tiny_pipe):
    """The reference's served calling convention (inference.py:364-397
    computes encode_prompt OUTSIDE and passes embeds into __call__,
    tryon_pipeline.py:1276-1285; masked_image_latents :1260): passing
    precomputed prompt/negative/cloth embeds + pooled companions and
    masked-image latents reproduces the ids path exactly, through BOTH the
    fused generate and the staged/stepwise encoder. eta (inert for DDPM,
    :746) is accepted."""
    from idmvton_tpu.models.vae import vae_encode
    from idmvton_tpu.pipeline.tryon import encode_prompt_sdxl

    models, pipe = tiny_models, tiny_pipe
    params = models.params()
    b, h, w, num = 1, 32, 32, 2
    inputs = _tiny_inputs(b, h, w, models)
    lat_hw = (h // models.vae_cfg.downscale, w // models.vae_cfg.downscale)
    lshape = (b, *lat_hw, models.vae_cfg.latent_channels)
    kw = dict(
        init_noise=jax.random.normal(jax.random.PRNGKey(7), lshape,
                                     jnp.float32),
        step_noise=jax.random.normal(jax.random.PRNGKey(8), (num, *lshape),
                                     jnp.float32))

    pe, pooled = encode_prompt_sdxl(models, params, inputs["prompt_ids_l"],
                                    inputs["prompt_ids_g"])
    ne, npooled = encode_prompt_sdxl(models, params, inputs["neg_ids_l"],
                                     inputs["neg_ids_g"])
    ce, _ = encode_prompt_sdxl(models, params, inputs["cloth_ids_l"],
                               inputs["cloth_ids_g"])
    masked = inputs["person"] * (inputs["mask"] < 0.5).astype(DTYPE)
    mlat = vae_encode(params["vae"], models.vae_cfg, masked, rng=None,
                      sample=False)
    embeds_inputs = {k: v for k, v in inputs.items() if "ids" not in k}
    embeds_inputs.update(
        prompt_embeds=pe, pooled_prompt_embeds=pooled,
        negative_prompt_embeds=ne, negative_pooled_prompt_embeds=npooled,
        cloth_prompt_embeds=ce, masked_image_latents=mlat)

    want = pipe.jit_generate(num_steps=num, vae_sample=False)(
        params, jax.random.PRNGKey(1), **inputs, **kw)
    got = pipe.jit_generate(num_steps=num, vae_sample=False)(
        params, jax.random.PRNGKey(1), eta=0.7, **embeds_inputs, **kw)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=2e-5)

    want_sw = pipe.stepwise_generate(num_steps=num, vae_sample=False)(
        params, jax.random.PRNGKey(1), **inputs, **kw)
    got_sw = pipe.stepwise_generate(num_steps=num, vae_sample=False)(
        params, jax.random.PRNGKey(1), **embeds_inputs, **kw)
    np.testing.assert_allclose(np.asarray(got_sw, np.float32),
                               np.asarray(want_sw, np.float32), atol=2e-5)


@pytest.mark.parametrize("towers", ["unet", "both"])
def test_int8_quantized_unet_quality_bound(towers, tiny_models, tiny_pipe):
    """Quantified quality statement for IDMVTON_GEMM_INT8 (same honesty
    pattern as garment_cache): generation with the int8-quantized TryonNet
    (mode 1) or both towers (mode 2) stays CLOSE to the fp output — far
    closer than a different seed — on tiny random weights (a conservative
    floor: converged weights have smoother activations than random ones)."""
    import functools
    from idmvton_tpu.ops.quant import quantize_unet_linears_int8
    from idmvton_tpu.utils.metrics import ssim

    models, pipe = tiny_models, tiny_pipe
    b, h, w = 1, 32, 32
    inputs = _tiny_inputs(b, h, w, models)
    gen = jax.jit(functools.partial(pipe.generate, num_steps=3,
                                    vae_sample=False))
    params = models.params()
    params_q = dict(params, unet=quantize_unet_linears_int8(params["unet"]))
    if towers == "both":
        params_q["garm"] = quantize_unet_linears_int8(params["garm"],
                                                       attn_qkv=False)

    fp = gen(params, jax.random.PRNGKey(1), **inputs)
    q = gen(params_q, jax.random.PRNGKey(1), **inputs)
    other = gen(params, jax.random.PRNGKey(2), **inputs)
    s_q = float(ssim(fp, q))
    s_other = float(ssim(fp, other))
    assert s_q > 0.75, s_q
    assert s_q > s_other + 0.3, (s_q, s_other)
