"""Coverage for small utility modules: the chunked fast-init path (the r4
HBM-OOM guard), the dtype policy, and the profiling helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idmvton_tpu.utils import fast_init
from idmvton_tpu.utils.fast_init import fast_random_params


def _init_fn(key):
    ks = jax.random.split(key, 3)
    return {
        "a": jax.random.normal(ks[0], (37, 53), jnp.bfloat16),
        "b": [jax.random.normal(ks[1], (211,), jnp.float32),
              jax.random.normal(ks[2], (8, 9, 10), jnp.bfloat16)],
    }


def test_fast_init_chunked_draw_matches_contract(monkeypatch):
    """The chunked path (total > _CHUNK) exists because one fused threefry
    draw for 5.15B elements materializes a 34 GB u32 iota and OOMs compile
    (bench.py r4). Chunking must preserve the contract: exact shapes/dtypes,
    ~N(0, std) leaves, fully deterministic in the key."""
    total = 37 * 53 + 211 + 8 * 9 * 10
    monkeypatch.setattr(fast_init, "_CHUNK", 512)  # force multiple chunks
    assert total > 512
    p1 = fast_random_params(jax.random.PRNGKey(7), _init_fn)
    p2 = fast_random_params(jax.random.PRNGKey(7), _init_fn)
    p3 = fast_random_params(jax.random.PRNGKey(8), _init_fn)

    ref = jax.eval_shape(_init_fn, jax.random.PRNGKey(7))
    for got, want in zip(jax.tree_util.tree_leaves(p1),
                         jax.tree_util.tree_leaves(ref)):
        assert got.shape == want.shape and got.dtype == want.dtype
    flat = np.concatenate([np.asarray(x, np.float32).ravel()
                           for x in jax.tree_util.tree_leaves(p1)])
    assert np.isfinite(flat).all()
    assert abs(flat.std() - 0.02) < 0.005  # std=0.02 default
    assert all(bool(jnp.array_equal(a, b)) for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)))
    assert any(not bool(jnp.array_equal(a, b)) for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p3)))


def test_fast_init_unchunked_small_draw():
    p = fast_random_params(jax.random.PRNGKey(0),
                           lambda k: {"w": jax.random.normal(k, (16, 16))},
                           std=1.0)
    assert p["w"].shape == (16, 16)
    assert abs(float(jnp.std(p["w"].astype(jnp.float32))) - 1.0) < 0.2


def test_dtype_policy_casts():
    from idmvton_tpu.core.dtypes import DEFAULT_POLICY, FP32_POLICY, Policy
    x = jnp.ones((4,), jnp.float32)
    assert DEFAULT_POLICY.cast(x).dtype == jnp.bfloat16
    assert DEFAULT_POLICY.cast_to_param(x).dtype == jnp.bfloat16
    assert FP32_POLICY.cast(x).dtype == jnp.float32
    mixed = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.float32)
    assert mixed.cast(x.astype(jnp.bfloat16)).dtype == jnp.float32
    with pytest.raises(dataclasses_frozen_error()):
        DEFAULT_POLICY.param_dtype = jnp.float32


def dataclasses_frozen_error():
    import dataclasses
    return dataclasses.FrozenInstanceError


def test_phase_timer_accounts_and_summarizes():
    from idmvton_tpu.utils.profiling import PhaseTimer, annotate
    t = PhaseTimer()
    dev = jnp.ones((8,))
    with t.phase("a", sync=dev):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    s = t.summary()
    assert "a: " in s and "2x" in s
    with annotate("unit-test-region"):  # no-op outside a trace, must not raise
        float(jnp.sum(dev))
