"""Image quality metrics: SSIM, PSNR (pure JAX) and an LPIPS head.

The reference ships torchmetrics but never computes any quality metric
(SURVEY §5 "Metrics"); these exist for the rebuild's own golden-image gates
(SSIM >= 0.99 vs reference outputs, BASELINE.md) and for VITON-HD eval.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(a, b, *, data_range: float = 2.0, window: int = 11,
         sigma: float = 1.5):
    """Mean SSIM over (B, H, W, C) images (default range 2.0 for [-1, 1])."""
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    kern = _gaussian_kernel(window, sigma)[:, :, None, None]

    def filt(x):
        c = x.shape[-1]
        k = jnp.tile(kern, (1, 1, 1, c))
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32), k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    mu_a, mu_b = filt(a), filt(b)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    var_a = filt(a * a) - mu_aa
    var_b = filt(b * b) - mu_bb
    cov = filt(a * b) - mu_ab
    s = ((2 * mu_ab + c1) * (2 * cov + c2)
         / ((mu_aa + mu_bb + c1) * (var_a + var_b + c2)))
    return jnp.mean(s)


def psnr(a, b, *, data_range: float = 2.0):
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


# ---------------------------------------------------------------------------
# LPIPS (VGG16 backbone + linear heads)
# ---------------------------------------------------------------------------

_VGG_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512)
_TAP_LAYERS = (1, 3, 6, 9, 12)  # relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


def init_lpips(key, dtype=jnp.float32) -> dict:
    """Random-init LPIPS(VGG) params; load real weights via convert_lpips."""
    from idmvton_tpu.models.layers import init_conv
    keys = iter(jax.random.split(key, 64))
    convs, in_ch, taps = [], 3, []
    conv_i = 0
    for v in _VGG_CFG:
        if v == "M":
            continue
        convs.append(init_conv(next(keys), in_ch, v, 3, dtype=dtype))
        if conv_i in _TAP_LAYERS:
            taps.append(v)
        in_ch = v
        conv_i += 1
    lins = [init_conv(next(keys), ch, 1, 1, bias=False, dtype=dtype)
            for ch in taps]
    return {"vgg": convs, "lin": lins}


def lpips(params, a, b):
    """LPIPS distance between (B, H, W, 3) images in [-1, 1]."""
    from idmvton_tpu.models.layers import conv2d

    def features(x):
        x = (x.astype(jnp.float32) - _SHIFT) / _SCALE
        feats = []
        conv_i = 0
        h = x
        for v in _VGG_CFG:
            if v == "M":
                h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                          (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
                continue
            h = jax.nn.relu(conv2d(params["vgg"][conv_i], h,
                                   padding=((1, 1), (1, 1))))
            if conv_i in _TAP_LAYERS:
                feats.append(h)
            conv_i += 1
        return feats

    fa, fb = features(a), features(b)
    total = 0.0
    for i, (x, y) in enumerate(zip(fa, fb)):
        xn = x / jnp.sqrt(jnp.sum(x ** 2, -1, keepdims=True) + 1e-10)
        yn = y / jnp.sqrt(jnp.sum(y ** 2, -1, keepdims=True) + 1e-10)
        d = conv2d(params["lin"][i], (xn - yn) ** 2)
        total = total + jnp.mean(d, axis=(1, 2, 3))
    return total


def convert_lpips(vgg_sd, lin_sd, dtype=jnp.float32) -> dict:
    """torchvision vgg16.features.* + lpips lin{0-4}.model.1.weight."""
    convs, lins = [], []
    conv_i = 0
    for li, v in enumerate(_expand_vgg_layer_ids()):
        if v is None:
            continue
        w = np.asarray(vgg_sd[f"features.{v}.weight"])
        b = np.asarray(vgg_sd[f"features.{v}.bias"])
        convs.append({"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)), dtype),
                      "bias": jnp.asarray(b, dtype)})
        conv_i += 1
    for i in range(5):
        w = np.asarray(lin_sd[f"lin{i}.model.1.weight"])
        lins.append({"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)), dtype)})
    return {"vgg": convs, "lin": lins}


def _expand_vgg_layer_ids():
    """torchvision vgg16.features indices of the conv layers."""
    ids, i = [], 0
    for v in _VGG_CFG:
        if v == "M":
            i += 1  # pool layer
            continue
        ids.append(i)
        i += 2      # conv + relu
    return ids
