"""Numerical parity: Pallas kernels (interpret mode on CPU) vs XLA references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idmvton_tpu.ops.attention import (
    sdpa, concat_kv_attention, decoupled_ip_attention,
)


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


@pytest.mark.parametrize("sq,skv", [(128, 128), (200, 300), (77, 93)])
def test_flash_attention_matches_xla(sq, skv):
    q = _rand(0, (2, sq, 3, 64))
    k = _rand(1, (2, skv, 3, 64))
    v = _rand(2, (2, skv, 3, 64))
    ref = sdpa(q, k, v, impl="xla")
    out = sdpa(q, k, v, impl="pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_concat_kv_matches_reference_concat_and_slice():
    """Flash concat-KV == the reference's attn(cat([x, g], seq))[:, :N]."""
    n, m = 96, 96
    q = _rand(0, (1, n, 2, 32))
    k = _rand(1, (1, n, 2, 32))
    v = _rand(2, (1, n, 2, 32))
    kg = _rand(3, (1, m, 2, 32))
    vg = _rand(4, (1, m, 2, 32))
    # reference semantics: full 2N-query attention then slice
    q_full = jnp.concatenate([q, _rand(9, (1, m, 2, 32))], axis=1)
    ref_full = sdpa(q_full, jnp.concatenate([k, kg], 1),
                    jnp.concatenate([v, vg], 1), impl="xla")
    ref = ref_full[:, :n]
    out_xla = concat_kv_attention(q, k, v, kg, vg, impl="xla")
    out_pl = concat_kv_attention(q, k, v, kg, vg, impl="pallas")
    np.testing.assert_allclose(np.asarray(out_xla), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_decoupled_ip_is_two_softmaxes_not_one():
    q = _rand(0, (1, 50, 2, 32))
    kt = _rand(1, (1, 77, 2, 32))
    vt = _rand(2, (1, 77, 2, 32))
    ki = _rand(3, (1, 16, 2, 32))
    vi = _rand(4, (1, 16, 2, 32))
    out = decoupled_ip_attention(q, kt, vt, ki, vi, ip_scale=0.5)
    expect = sdpa(q, kt, vt, impl="xla") + 0.5 * sdpa(q, ki, vi, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-5)
    # and it differs from single-softmax over the concat context
    single = sdpa(q, jnp.concatenate([kt, ki], 1),
                  jnp.concatenate([vt, vi], 1), impl="xla")
    assert float(jnp.abs(out - single).max()) > 1e-3


def test_flash_attention_bf16():
    q = _rand(0, (1, 256, 2, 64), jnp.bfloat16)
    k = _rand(1, (1, 512, 2, 64), jnp.bfloat16)
    v = _rand(2, (1, 512, 2, 64), jnp.bfloat16)
    ref = sdpa(q, k, v, impl="xla")
    out = sdpa(q, k, v, impl="pallas")
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_flash_attention_grad_matches():
    q = _rand(0, (1, 64, 1, 32))
    k = _rand(1, (1, 96, 1, 32))
    v = _rand(2, (1, 96, 1, 32))

    def loss_pl(q, k, v):
        return jnp.sum(sdpa(q, k, v, impl="pallas") ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(sdpa(q, k, v, impl="xla") ** 2)

    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_pl, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=5e-3)


def test_fused_qkv_flash_matches_reference():
    """flash_attention_fused_qkv(qkv, s) == attn(cat)[:, :s] reference."""
    from idmvton_tpu.ops.pallas_attention import flash_attention_fused_qkv
    b, s, m, h, d = 2, 96, 96, 2, 32
    qkv = jax.random.normal(jax.random.PRNGKey(0), (b, s + m, 3, h, d))
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    ref = sdpa(q, k, v, impl="xla")[:, :s]
    out = flash_attention_fused_qkv(qkv, s)
    assert out.shape == (b, s, h, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_fused_qkv_flash_no_garment():
    from idmvton_tpu.ops.pallas_attention import flash_attention_fused_qkv
    b, s, h, d = 1, 200, 3, 64
    qkv = jax.random.normal(jax.random.PRNGKey(1), (b, s, 3, h, d),
                            jnp.bfloat16)
    ref = sdpa(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], impl="xla")
    out = flash_attention_fused_qkv(qkv, s)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_fused_layer_norm_matches():
    from idmvton_tpu.ops.pallas_norm import fused_layer_norm, _xla_ln
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 100, 256), jnp.bfloat16)
    scale = jax.random.normal(jax.random.PRNGKey(1), (256,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (256,)) * 0.1
    out = fused_layer_norm(x, scale, bias)
    ref = _xla_ln(x, scale, bias, 1e-5)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)
    # gradients flow (backward = XLA recompute)
    g = jax.grad(lambda x: jnp.sum(
        fused_layer_norm(x.astype(jnp.float32), scale, bias)
        .astype(jnp.float32)))(x.astype(jnp.float32))
    assert np.isfinite(np.asarray(g)).all()
