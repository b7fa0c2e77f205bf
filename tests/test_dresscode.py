"""DressCode dataset + agnostic-mask tests on a synthetic tree."""

import json
import os

import numpy as np
from PIL import Image

from idmvton_tpu.data.dresscode import (
    DressCodeDataset, dresscode_keep_mask, _L,
)


def _pose(w=384, h=512):
    kp = np.zeros((18, 4), np.float32)
    kp[2, :2] = [130, 140]
    kp[3, :2] = [112, 210]
    kp[4, :2] = [112, 280]
    kp[5, :2] = [260, 140]
    kp[6, :2] = [277, 210]
    kp[7, :2] = [277, 280]
    return kp


def _parse(w=384, h=512):
    p = np.zeros((h, w), np.uint8)
    p[40:110, 160:230] = _L["head"]
    p[20:60, 150:240] = _L["hair"]
    p[130:300, 130:260] = _L["upper_clothes"]
    p[130:290, 95:130] = _L["right_arm"]
    p[130:290, 260:295] = _L["left_arm"]
    p[300:470, 140:250] = _L["pants"]
    return p


def test_keep_mask_upper_body():
    keep = dresscode_keep_mask(_parse(), _pose(), "upper_body", (384, 512))
    assert keep.shape == (512, 384)
    assert set(np.unique(keep)) <= {0.0, 1.0}
    # garment center is NOT kept (it is inpainted)
    assert keep[200, 195] == 0
    # pants are kept for upper_body
    assert keep[400, 195] == 1
    # hair is kept
    assert keep[30, 195] == 1


def test_keep_mask_missing_wrist_chain():
    pose = _pose()
    pose[4, :2] = 0  # right wrist missing
    keep = dresscode_keep_mask(_parse(), pose, "upper_body", (384, 512))
    assert keep.shape == (512, 384)


def test_keep_mask_lower_body():
    keep = dresscode_keep_mask(_parse(), _pose(), "lower_body", (384, 512))
    assert keep[400, 195] == 0      # pants inpainted
    assert keep[200, 100] == 1      # arms kept


def make_dresscode_tree(root, n=2, category="upper_body", size=(96, 128)):
    w, h = size
    base = os.path.join(root, category)
    for sub in ("images", "label_maps", "keypoints", "image-densepose",
                "skeletons"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    rng = np.random.RandomState(0)
    pairs = []
    for i in range(n):
        im = f"{i:06d}_0.jpg"
        cl = f"{i:06d}_1.jpg"
        img = Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8))
        img.save(os.path.join(base, "images", im))
        img.save(os.path.join(base, "images", cl))
        img.save(os.path.join(base, "image-densepose", im))
        img.save(os.path.join(base, "skeletons", im.replace("_0", "_5")))
        Image.fromarray(_parse()).save(
            os.path.join(base, "label_maps", f"{i:06d}_4.png"))
        with open(os.path.join(base, "keypoints", f"{i:06d}_2.json"), "w") as f:
            json.dump({"keypoints": _pose().reshape(-1).tolist()}, f)
        pairs.append(f"{im} {cl}")
    with open(os.path.join(base, "test_pairs_paired.txt"), "w") as f:
        f.write("\n".join(pairs))
    with open(os.path.join(base, "dc_caption.txt"), "w") as f:
        f.write("\n".join(f"{i:06d}_1.jpg a red shirt" for i in range(n)))


def test_dresscode_dataset(tmp_path):
    make_dresscode_tree(str(tmp_path))
    ds = DressCodeDataset(str(tmp_path), category="upper_body",
                          size=(128, 96))
    assert len(ds) == 2
    s = ds[0]
    assert s["person"].shape == (128, 96, 3)
    assert s["mask"].shape == (128, 96, 1)
    assert s["caption"] == "model is wearing a a red shirt"
    assert s["ip_pixels"].shape == (224, 224, 3)
    assert 0.0 < s["mask"].mean() < 1.0


def test_infer_dc_delegates_with_dresscode_dataset(monkeypatch):
    """cli/infer_dc.py is the reference's separate inference_dc.py entry
    point — it must forward user args to cli/infer.py with the dresscode
    dataset pre-selected."""
    from idmvton_tpu.cli import infer_dc

    captured = {}
    monkeypatch.setattr(infer_dc, "_main",
                        lambda argv: captured.setdefault("argv", argv))
    infer_dc.main(["--data_dir", "/d", "--category", "lower_body"])
    assert captured["argv"][:2] == ["--dataset", "dresscode"]
    assert captured["argv"][2:] == ["--data_dir", "/d",
                                    "--category", "lower_body"]
