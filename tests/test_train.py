"""Training-step tests: loss finite, params update, DP parity.

Mechanics tests (decomposition/trajectory equalities, DP parity) run on the
MICRO stack: the property under test is width-independent and trace+compile
time dominates this 1-CPU host (tiny ~30 s/program vs micro ~9 s)."""

import jax
import jax.numpy as jnp
import numpy as np

from idmvton_tpu.core.config import SchedulerConfig
from idmvton_tpu.diffusion.scheduler import DDPMScheduler
from idmvton_tpu.pipeline.tryon import TryonModels
from idmvton_tpu.train.train_step import (
    make_optimizer, init_train_state, make_train_step,
)
from idmvton_tpu.parallel.mesh import make_mesh, shard_batch, replicate_params

DTYPE = jnp.float32


def _batch(b, h, w, models, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 8)
    vocab = models.clip_l_cfg.vocab_size
    isz = models.vision_cfg.image_size
    img = lambda k, c=3: jax.random.uniform(ks[k], (b, h, w, c), DTYPE, -1, 1)
    ids = lambda k: jax.random.randint(ks[k], (b, 7), 0, vocab)
    return dict(
        person=img(0), pose=img(1), cloth=img(2),
        mask=(jax.random.uniform(ks[3], (b, h, w, 1)) > 0.5).astype(DTYPE),
        prompt_ids_l=ids(4), prompt_ids_g=ids(4),
        cloth_ids_l=ids(5), cloth_ids_g=ids(5),
        ip_pixels=jax.random.uniform(ks[6], (b, isz, isz, 3), DTYPE, -1, 1),
    )


def test_train_step_updates_finite_and_data_parallel_matches():
    """One full fwd+bwd program serves both checks (compile is the dominant
    CI cost on this host): the unsharded b=8 step must be finite and move
    params; the same batch sharded over the 8-device mesh must produce the
    identical update (grad all-reduce == serial mean)."""
    models = TryonModels.init(jax.random.PRNGKey(0), micro=True, dtype=DTYPE)
    sched = DDPMScheduler(SchedulerConfig.train())
    tx = make_optimizer(learning_rate=1e-4)
    state = init_train_state(models, tx)
    step = jax.jit(make_train_step(models, sched, tx, snr_gamma=5.0,
                                   compute_dtype=DTYPE, remat=False))
    batch = _batch(8, 32, 32, models)
    state1, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    assert float(metrics["grad_norm"]) > 0
    # params actually moved
    k0 = state.trainable["unet"]["conv_in"]["kernel"]
    k1 = state1.trainable["unet"]["conv_in"]["kernel"]
    assert float(jnp.abs(k1 - k0).max()) > 0
    assert int(state1.step) == 1
    # frozen towers untouched by construction (not in trainable)
    assert set(state1.trainable.keys()) == {"unet", "resampler"}

    mesh = make_mesh()
    sharded = shard_batch(batch, mesh)
    state_r = jax.tree_util.tree_map(lambda x: x, state)  # fresh copy
    out_state, out_metrics = step(state_r, sharded, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(out_metrics["loss"]),
                               float(metrics["loss"]), rtol=1e-5)
    a = np.asarray(state1.trainable["unet"]["conv_in"]["kernel"])
    b = np.asarray(out_state.trainable["unet"]["conv_in"]["kernel"])
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_gradient_accumulation_matches_full_batch():
    """Reference parity (--gradient_accumulation_steps, train_xl.py:265,491):
    accum=2 micro-batches of b=3 must produce the SAME update as one b=6
    step. Noise/timesteps are injected per-example and the VAE encode runs
    deterministic so the two decompositions compute identical per-example
    losses (the in-loss rng draws are batch-shape-dependent)."""
    models = TryonModels.init(jax.random.PRNGKey(0), micro=True, dtype=DTYPE)
    sched = DDPMScheduler(SchedulerConfig.train())
    lh, lw = 32 // 8, 32 // 8

    full = _batch(6, 32, 32, models, key=3)
    kn, kt = jax.random.split(jax.random.PRNGKey(9))
    full["noise"] = jax.random.normal(kn, (6, lh, lw, 4), jnp.float32)
    full["timesteps"] = jax.random.randint(
        kt, (6,), 0, sched.cfg.num_train_timesteps)
    halves = [
        {k: v[i * 3:(i + 1) * 3] for k, v in full.items()} for i in range(2)
    ]

    tx_full = make_optimizer(learning_rate=1e-3)
    tx_acc = make_optimizer(learning_rate=1e-3, accum_steps=2)
    state_f = init_train_state(models, tx_full)
    state_a = init_train_state(models, tx_acc)
    step_f = jax.jit(make_train_step(models, sched, tx_full,
                                     compute_dtype=DTYPE, remat=False,
                                     vae_sample=False))
    step_a = jax.jit(make_train_step(models, sched, tx_acc,
                                     compute_dtype=DTYPE, remat=False,
                                     vae_sample=False))

    rng = jax.random.PRNGKey(7)
    state_f, metrics_f = step_f(state_f, full, rng)
    state_a, m1 = step_a(state_a, halves[0], rng)
    # after the first micro-step the params must NOT have moved
    for a, b in zip(jax.tree_util.tree_leaves(state_a.trainable),
                    jax.tree_util.tree_leaves(init_train_state(
                        models, tx_acc).trainable)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    state_a, m2 = step_a(state_a, halves[1], rng)

    # micro-losses average to the full-batch loss
    np.testing.assert_allclose(
        (float(m1["loss"]) + float(m2["loss"])) / 2.0,
        float(metrics_f["loss"]), rtol=1e-5)
    # and the boundary update equals the full-batch update
    a = np.asarray(state_a.trainable["unet"]["conv_in"]["kernel"])
    f = np.asarray(state_f.trainable["unet"]["conv_in"]["kernel"])
    np.testing.assert_allclose(a, f, atol=1e-6)
    r_a = np.asarray(jax.tree_util.tree_leaves(state_a.trainable["resampler"])[0])
    r_f = np.asarray(jax.tree_util.tree_leaves(state_f.trainable["resampler"])[0])
    np.testing.assert_allclose(r_a, r_f, atol=1e-6)


def test_adamw8bit_matches_adamw_trajectory():
    """int8-moment AdamW (reference --use_8bit_adam analog,
    train_xl.py:412-420): state is genuinely int8 and the short-horizon
    trajectory tracks fp32 AdamW closely."""
    import optax
    from idmvton_tpu.train.quant_opt import adamw_int8, ScaleByAdamInt8State

    params = {"w": jnp.linspace(-1, 1, 500).reshape(10, 50),
              "b": jnp.ones((7,)) * 0.3}

    def loss(p):
        return jnp.sum(p["w"] ** 2) * 0.5 + jnp.sum((p["b"] - 1.0) ** 2)

    lr = 1e-2
    tx8 = adamw_int8(lr, weight_decay=0.0)
    txf = optax.adamw(lr, weight_decay=0.0)
    p8, pf = params, params
    s8, sf = tx8.init(p8), txf.init(pf)
    for _ in range(20):
        g8 = jax.grad(loss)(p8)
        u8, s8 = tx8.update(g8, s8, p8)
        p8 = optax.apply_updates(p8, u8)
        gf = jax.grad(loss)(pf)
        uf, sf = txf.update(gf, sf, pf)
        pf = optax.apply_updates(pf, uf)
    # moments stored as int8
    adam_state = s8[0] if isinstance(s8, tuple) else s8
    assert isinstance(adam_state, ScaleByAdamInt8State)
    for leaf in jax.tree_util.tree_leaves(adam_state.mu):
        assert leaf.dtype in (jnp.int8, jnp.float32)
    assert any(l.dtype == jnp.int8
               for l in jax.tree_util.tree_leaves(adam_state.mu))
    # trajectories stay close over 20 steps (log-map levels are ~13% apart,
    # so per-step moment error is ~6.5%; positions track within that)
    for a, b in zip(jax.tree_util.tree_leaves(p8),
                    jax.tree_util.tree_leaves(pf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-2, rtol=2e-1)
    # and the quantized run converges comparably
    assert float(loss(p8)) < float(loss(params)) * 0.8
    assert abs(float(loss(p8)) - float(loss(pf))) < 0.1 * float(loss(params))


def test_train_step_with_adamw8bit_runs():
    models = TryonModels.init(jax.random.PRNGKey(0), micro=True, dtype=DTYPE)
    sched = DDPMScheduler(SchedulerConfig.train())
    tx = make_optimizer(1e-4, optimizer="adamw8bit")
    state = init_train_state(models, tx)
    step = jax.jit(make_train_step(models, sched, tx, compute_dtype=DTYPE))
    new_state, metrics = step(state, _batch(2, 32, 32, models),
                              jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # params actually moved
    d0 = jax.tree_util.tree_leaves(state.trainable)[0]
    d1 = jax.tree_util.tree_leaves(new_state.trainable)[0]
    assert float(jnp.abs(d1 - d0).max()) > 0


def test_optimizer_beta_eps_plumbing():
    """--adam_beta1/beta2/epsilon reach optax (reference train_xl.py:283-286,
    430-432): a large eps must damp the very first update exactly like
    AdamW's update rule says (|u| = lr * g_hat / (sqrt(v_hat) + eps))."""
    import optax
    from idmvton_tpu.train.train_step import make_optimizer

    g = {"w": jnp.full((4,), 2.0, jnp.float32)}
    params = {"w": jnp.zeros((4,), jnp.float32)}
    lr = 1e-3

    def first_update(eps):
        tx = make_optimizer(lr, weight_decay=0.0, eps=eps,
                            max_grad_norm=1e9)
        u, _ = tx.update(g, tx.init(params), params)
        return float(u["w"][0])

    # step 1: m_hat = g = 2, sqrt(v_hat) = |g| = 2, so the update is
    # exactly -lr * 2 / (2 + eps)
    np.testing.assert_allclose(first_update(0.0), -lr, rtol=1e-5)
    np.testing.assert_allclose(first_update(1.0), -lr * 2.0 / 3.0, rtol=1e-5)

    # betas plumb through too: b2=0 makes v_hat exact, same step-1 result
    tx = make_optimizer(lr, weight_decay=0.0, b1=0.5, b2=0.0, eps=0.0,
                        max_grad_norm=1e9)
    u, _ = tx.update(g, tx.init(params), params)
    np.testing.assert_allclose(float(u["w"][0]), -lr, rtol=1e-5)
