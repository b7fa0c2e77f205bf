"""Demo service end-to-end (tiny models, direct service call — the HTTP layer
is a thin shim)."""

import argparse

import numpy as np
from PIL import Image

from idmvton_tpu.cli.demo import TryonService


def test_tryon_service_end_to_end():
    args = argparse.Namespace(width=48, height=64, pretrained=None,
                              tokenizer_dir=None, tiny=True)
    svc = TryonService(args)
    rng = np.random.RandomState(0)
    person = Image.fromarray(rng.randint(0, 255, (128, 96, 3), np.uint8))
    garment = Image.fromarray(rng.randint(0, 255, (128, 96, 3), np.uint8))
    out = svc.tryon(person, garment, "shirt", auto_mask=True, steps=2)
    assert out.size == (48, 64)


def test_auto_crop_3_4():
    img = Image.new("RGB", (1000, 1000))
    crop, box = TryonService.auto_crop_3_4(img)
    assert crop.size == (750, 1000)
    assert box == (125, 0, 875, 1000)
