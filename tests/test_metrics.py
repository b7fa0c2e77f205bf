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


# ---------------------------------------------------------------------------
# Anchors: independent transcriptions of the published algorithms
# (skimage/torchmetrics/lpips are not installed in this image, so the anchors
# are literal NumPy/torch transcriptions of the published protocols plus
# hard-coded goldens computed from them — not round-trips of our own code.)
# ---------------------------------------------------------------------------

def _np_ssim_wang(a, b, data_range=2.0, win=11, sigma=1.5):
    """Wang et al. 2004 protocol (= skimage gaussian_weights=True,
    use_sample_covariance=False): gaussian window, valid filtering,
    E[xy]-mu_x*mu_y covariance, mean over the valid map."""
    x = np.arange(win) - (win - 1) / 2.0
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    k = np.outer(g, g)

    def filt(im):
        h, w = im.shape
        out = np.zeros((h - win + 1, w - win + 1))
        for i in range(out.shape[0]):
            for j in range(out.shape[1]):
                out[i, j] = (im[i:i + win, j:j + win] * k).sum()
        return out

    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    vals = []
    for bi in range(a.shape[0]):
        for ci in range(a.shape[-1]):
            ai = a[bi, :, :, ci].astype(np.float64)
            b2 = b[bi, :, :, ci].astype(np.float64)
            mua, mub = filt(ai), filt(b2)
            va = filt(ai * ai) - mua * mua
            vb = filt(b2 * b2) - mub * mub
            cov = filt(ai * b2) - mua * mub
            s = ((2 * mua * mub + c1) * (2 * cov + c2)
                 / ((mua * mua + mub * mub + c1) * (va + vb + c2)))
            vals.append(s)
    return float(np.mean(vals))


def test_ssim_matches_published_protocol():
    rng = np.random.RandomState(7)
    a = (rng.rand(1, 24, 24, 3) * 2 - 1).astype(np.float32)
    b = np.clip(a + 0.2 * rng.randn(1, 24, 24, 3).astype(np.float32), -1, 1)
    c = (rng.rand(1, 24, 24, 3) * 2 - 1).astype(np.float32)
    gold_ab, gold_ac = _np_ssim_wang(a, b), _np_ssim_wang(a, c)
    # goldens computed once from the transcription; guard both impls drifting
    assert abs(gold_ab - 0.7855798087530016) < 1e-9
    assert abs(gold_ac - (-0.007803433125136258)) < 1e-9
    assert abs(float(ssim(a, b)) - gold_ab) < 1e-5
    assert abs(float(ssim(a, c)) - gold_ac) < 1e-5


def test_psnr_analytic_golden():
    a = np.zeros((1, 8, 8, 1), np.float32)
    b = np.full((1, 8, 8, 1), 0.2, np.float32)
    # PSNR = 10*log10(range^2 / mse) = 10*log10(4 / 0.04) = 20
    assert abs(float(psnr(a, b)) - 20.0) < 1e-4


def test_lpips_matches_torch_transcription():
    """Anchor the LPIPS architecture + converter against a literal torch
    transcription of the published lpips forward (richzhang/PerceptualSimilarity
    networks.py / lpips.py semantics) with shared random weights."""
    import torch
    import torch.nn.functional as F
    from idmvton_tpu.utils.metrics import (
        convert_lpips, _VGG_CFG, _expand_vgg_layer_ids, _SHIFT, _SCALE)

    tg = torch.Generator().manual_seed(0)
    vgg_sd, lin_sd = {}, {}
    in_ch = 3
    taps = []
    conv_i = 0
    for li, v in zip(_expand_vgg_layer_ids(), [v for v in _VGG_CFG if v != "M"]):
        vgg_sd[f"features.{li}.weight"] = torch.randn(
            (v, in_ch, 3, 3), generator=tg) * 0.05
        vgg_sd[f"features.{li}.bias"] = torch.randn((v,), generator=tg) * 0.05
        if conv_i in (1, 3, 6, 9, 12):
            taps.append(v)
        in_ch = v
        conv_i += 1
    for i, ch in enumerate(taps):
        lin_sd[f"lin{i}.model.1.weight"] = torch.rand(
            (1, ch, 1, 1), generator=tg) * 0.1

    def torch_lpips(x_np, y_np):
        # NHWC [-1,1] -> NCHW; ScalingLayer, vgg features, unit-normalize,
        # squared diff, 1x1 lin, spatial mean, sum over taps
        shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
        scale = torch.tensor(_SCALE).view(1, 3, 1, 1)

        def feats(x):
            h = (x - shift) / scale
            out = []
            ci = 0
            for v in _VGG_CFG:
                if v == "M":
                    h = F.max_pool2d(h, 2, 2)
                    continue
                li = _expand_vgg_layer_ids()[ci]
                h = F.relu(F.conv2d(h, vgg_sd[f"features.{li}.weight"],
                                    vgg_sd[f"features.{li}.bias"], padding=1))
                if ci in (1, 3, 6, 9, 12):
                    out.append(h)
                ci += 1
            return out

        x = torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2)))
        y = torch.from_numpy(np.transpose(y_np, (0, 3, 1, 2)))
        total = 0.0
        for i, (fx, fy) in enumerate(zip(feats(x), feats(y))):
            nx = fx / torch.sqrt((fx ** 2).sum(1, keepdim=True) + 1e-10)
            ny = fy / torch.sqrt((fy ** 2).sum(1, keepdim=True) + 1e-10)
            d = F.conv2d((nx - ny) ** 2, lin_sd[f"lin{i}.model.1.weight"])
            total = total + d.mean(dim=(1, 2, 3))
        return total.numpy()

    rng = np.random.RandomState(3)
    a = (rng.rand(2, 32, 32, 3) * 2 - 1).astype(np.float32)
    b = np.clip(a + 0.3 * rng.randn(2, 32, 32, 3).astype(np.float32), -1, 1)
    want = torch_lpips(a, b)
    params = convert_lpips({k: v.numpy() for k, v in vgg_sd.items()},
                           {k: v.numpy() for k, v in lin_sd.items()})
    got = np.asarray(lpips(params, a, b))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)
    assert want.min() > 1e-4  # non-degenerate anchor
