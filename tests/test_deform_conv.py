"""Deformable conv: zero offsets must equal a regular convolution; offsets
shift sampling; modulation scales."""

import numpy as np
import jax
import jax.numpy as jnp

from idmvton_tpu.ops.deform_conv import deform_conv2d
from idmvton_tpu.models.layers import conv2d


def test_zero_offsets_equal_regular_conv():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 10, 12, 3))
    kernel = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 4)) * 0.1
    offsets = jnp.zeros((2, 10, 12, 2 * 9))
    out = deform_conv2d(x, offsets, kernel, padding=1)
    ref = conv2d({"kernel": kernel}, x, padding=((1, 1), (1, 1)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_integer_offset_shifts():
    """Offset (0, 1) on every tap == conv over the x-shifted image."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 2))
    kernel = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 2, 2)) * 0.1
    off = jnp.zeros((1, 8, 8, 18)).at[..., 1::2].set(1.0)  # dx = +1
    out = deform_conv2d(x, off, kernel, padding=1)
    x_shift = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:]
    ref = conv2d({"kernel": kernel}, x_shift, padding=((1, 1), (1, 1)))
    # interior matches exactly (borders differ by zero- vs shift-padding)
    np.testing.assert_allclose(np.asarray(out[:, 1:-1, 1:-2]),
                               np.asarray(ref[:, 1:-1, 1:-2]), atol=1e-4)


def test_modulation_mask():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 6, 2))
    kernel = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 2, 2)) * 0.1
    off = jnp.zeros((1, 6, 6, 18))
    half = jnp.full((1, 6, 6, 9), 0.5)
    out_half = deform_conv2d(x, off, kernel, mask=half, padding=1)
    out_full = deform_conv2d(x, off, kernel, padding=1)
    np.testing.assert_allclose(np.asarray(out_half),
                               0.5 * np.asarray(out_full), atol=1e-5)


def test_stride():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 2))
    kernel = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 2, 2)) * 0.1
    off = jnp.zeros((1, 4, 4, 18))
    out = deform_conv2d(x, off, kernel, stride=2, padding=1)
    ref = conv2d({"kernel": kernel}, x, stride=2, padding=((1, 1), (1, 1)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
