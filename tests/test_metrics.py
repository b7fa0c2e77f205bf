"""Metrics tests."""

import jax
import jax.numpy as jnp
import numpy as np

from idmvton_tpu.utils.metrics import ssim, psnr, init_lpips, lpips
from idmvton_tpu.utils.fast_init import fast_random_params


def test_ssim_identity_and_noise():
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3),
                             minval=-1, maxval=1)
    assert float(ssim(img, img)) > 0.9999
    noisy = img + 0.5 * jax.random.normal(jax.random.PRNGKey(1), img.shape)
    s = float(ssim(img, jnp.clip(noisy, -1, 1)))
    assert s < 0.9
    assert float(psnr(img, img)) > 80
    assert float(psnr(img, jnp.clip(noisy, -1, 1))) < 20


def test_ssim_monotone_in_noise():
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 48, 48, 3),
                             minval=-1, maxval=1)
    vals = []
    for lvl in (0.01, 0.1, 0.4):
        n = img + lvl * jax.random.normal(jax.random.PRNGKey(2), img.shape)
        vals.append(float(ssim(img, jnp.clip(n, -1, 1))))
    assert vals[0] > vals[1] > vals[2]


def test_lpips_structure():
    params = init_lpips(jax.random.PRNGKey(0))
    a = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3),
                           minval=-1, maxval=1)
    d_same = lpips(params, a, a)
    assert d_same.shape == (2,)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    b = jnp.clip(a + 0.3 * jax.random.normal(jax.random.PRNGKey(2), a.shape),
                 -1, 1)
    assert float(lpips(params, a, b).mean()) > 0


def test_fast_init_matches_shapes():
    from idmvton_tpu.core.config import UNetConfig
    from idmvton_tpu.models.unet import init_unet
    cfg = UNetConfig.tiny("emit")
    ref = jax.eval_shape(lambda k: init_unet(k, cfg), jax.random.PRNGKey(0))
    fast = fast_random_params(jax.random.PRNGKey(0),
                              lambda k: init_unet(k, cfg))
    ra, _ = jax.tree_util.tree_flatten(ref)
    fa, _ = jax.tree_util.tree_flatten(fast)
    assert len(ra) == len(fa)
    for r, f in zip(ra, fa):
        assert r.shape == f.shape and r.dtype == f.dtype
