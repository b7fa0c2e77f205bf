"""padding_mask_crop host helpers (reference src/tryon_pipeline.py:1263,
:1580-1594, :1888 — diffusers VaeImageProcessor.get_crop_region /
apply_overlay semantics)."""

import numpy as np

from idmvton_tpu.preprocess.inpaint_crop import (
    get_crop_region, crop_resize, apply_overlay,
)


def test_get_crop_region_bbox_pad_and_aspect():
    h, w = 100, 80
    mask = np.zeros((h, w), np.uint8)
    mask[40:60, 30:50] = 255  # 20x20 blob

    # square processing aspect: already square bbox -> bbox (+pad)
    x1, y1, x2, y2 = get_crop_region(mask, 64, 64, pad=0)
    assert (x1, y1, x2, y2) == (30, 40, 50, 60)
    x1, y1, x2, y2 = get_crop_region(mask, 64, 64, pad=5)
    assert (x1, y1, x2, y2) == (25, 35, 55, 65)

    # wide processing aspect (2:1): x-range expands around the blob
    x1, y1, x2, y2 = get_crop_region(mask, 128, 64, pad=0)
    assert (y1, y2) == (40, 60)
    assert x2 - x1 == 2 * (y2 - y1)
    assert x1 <= 30 and x2 >= 50

    # tall processing aspect (1:2): y-range expands
    x1, y1, x2, y2 = get_crop_region(mask, 64, 128, pad=0)
    assert (x1, x2) == (30, 50)
    assert y2 - y1 == 2 * (x2 - x1)

    # clamped at the frame edge: blob near the border, expansion shifts
    mask2 = np.zeros((h, w), np.uint8)
    mask2[0:10, 0:40] = 255
    x1, y1, x2, y2 = get_crop_region(mask2, 64, 64, pad=0)
    assert 0 <= x1 < x2 <= w and 0 <= y1 < y2 <= h
    assert x2 - x1 == y2 - y1  # aspect satisfied after clamping

    # empty mask -> full frame fallback
    assert get_crop_region(np.zeros((h, w)), 64, 64) == (0, 0, w, h)


def test_crop_resize_shapes_and_mask_nearest():
    img = np.random.default_rng(0).uniform(-1, 1, (100, 80, 3)).astype(
        np.float32)
    out = crop_resize(img, (30, 40, 50, 60), (64, 64))
    assert out.shape == (64, 64, 3)
    mask = np.zeros((100, 80, 1), np.float32)
    mask[40:60, 30:50] = 1.0
    mout = crop_resize(mask, (30, 40, 50, 60), (64, 64), nearest=True)
    assert mout.shape == (64, 64, 1)
    assert set(np.unique(mout)) <= {0.0, 1.0}  # nearest keeps it binary
    assert mout.mean() == 1.0  # the crop is exactly the mask region


def test_apply_overlay_blends_only_masked_region():
    rng = np.random.default_rng(1)
    original = rng.uniform(-1, 1, (100, 80, 3)).astype(np.float32)
    generated = rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32)
    mask = np.zeros((100, 80), np.float32)
    mask[40:60, 30:50] = 1.0
    region = (30, 40, 50, 60)

    out = apply_overlay(mask, original, generated, region)
    # outside the mask: original untouched (even inside the crop region the
    # unmasked pixels keep the original — the mask is the alpha)
    unmasked = mask == 0
    np.testing.assert_array_equal(out[unmasked], original[unmasked])
    # inside: the generated crop, resized into the region
    import cv2
    patch = cv2.resize(generated, (20, 20), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(out[40:60, 30:50], patch, atol=1e-6)

    # uint8 masks (0..255) scale to alpha
    out8 = apply_overlay((mask * 255).astype(np.uint8), original, generated,
                         region)
    np.testing.assert_allclose(out8, out, atol=1e-6)


def test_apply_overlay_preserves_input_dtype():
    """A uint8 photo in must come back uint8 (r5 review: the float32 working
    copy used to leak out, breaking PIL.Image.fromarray on the result)."""
    rng = np.random.default_rng(2)
    original = rng.integers(0, 256, (40, 30, 3), dtype=np.uint8)
    generated = rng.uniform(0, 255, (16, 16, 3)).astype(np.float32)
    mask = np.zeros((40, 30), np.float32)
    mask[10:20, 8:18] = 1.0
    out = apply_overlay(mask, original, generated, (8, 10, 18, 20))
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out[mask == 0], original[mask == 0])
    # float input stays float
    outf = apply_overlay(mask, original.astype(np.float32), generated,
                         (8, 10, 18, 20))
    assert outf.dtype == np.float32
