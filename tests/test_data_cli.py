"""Data layer + tokenizer + CLI smoke tests on a synthetic VITON-HD tree."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from idmvton_tpu.data.tokenizer import HashTokenizer, CLIPTokenizer, load_tokenizers
from idmvton_tpu.data.datasets import VitonHDDataset, BatchLoader
from idmvton_tpu.data.image import denormalize_to_uint8


def make_viton_tree(root, n=4, phase="test", size=(96, 128)):
    w, h = size
    names = [f"{i:05d}_00.jpg" for i in range(n)]
    for sub in ("image", "cloth", "image-densepose", "agnostic-mask"):
        os.makedirs(os.path.join(root, phase, sub), exist_ok=True)
    rng = np.random.RandomState(0)
    for name in names:
        img = Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8))
        img.save(os.path.join(root, phase, "image", name))
        img.save(os.path.join(root, phase, "cloth", name))
        img.save(os.path.join(root, phase, "image-densepose", name))
        m = Image.fromarray((rng.rand(h, w) > 0.5).astype(np.uint8) * 255)
        m.save(os.path.join(root, phase, "agnostic-mask",
                            name.replace(".jpg", "_mask.png")))
    pairs = [f"{a} {b}" for a, b in zip(names, reversed(names))]
    with open(os.path.join(root, f"{phase}_pairs.txt"), "w") as f:
        f.write("\n".join(pairs))
    tagged = {"data": [
        {"file_name": name,
         "tag_info": [{"tag_name": "item", "tag_category": "t shirts"},
                      {"tag_name": "sleeveLength", "tag_category": "long"}]}
        for name in names]}
    with open(os.path.join(root, phase, f"vitonhd_{phase}_tagged.json"), "w") as f:
        json.dump(tagged, f)
    return names


def test_dataset_and_loader(tmp_path):
    root = str(tmp_path)
    names = make_viton_tree(root, n=4)
    ds = VitonHDDataset(root, phase="test", order="unpaired", size=(64, 48))
    assert len(ds) == 4
    s = ds[0]
    assert s["person"].shape == (64, 48, 3)
    assert s["mask"].shape == (64, 48, 1)
    assert set(np.unique(s["mask"])) <= {0.0, 1.0}
    assert s["ip_pixels"].shape == (224, 224, 3)
    assert s["caption"].startswith("model is wearing")
    assert s["c_name"] == names[-1]  # unpaired order

    loader = BatchLoader(ds, 2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["person"].shape == (2, 64, 48, 3)
    assert isinstance(batches[0]["caption"], list)


def test_hash_tokenizer_contract():
    tok = HashTokenizer(vocab_size=1000)
    out = tok(["hello world", "a"])
    assert out.shape == (2, 77)
    assert out.dtype == np.int32
    assert (out >= 0).all() and (out < 1000).all()
    # deterministic
    np.testing.assert_array_equal(out, tok(["hello world", "a"]))


def test_clip_tokenizer_bpe(tmp_path):
    """Minimal vocab exercising the real BPE merge loop."""
    from idmvton_tpu.data.tokenizer import _bytes_to_unicode
    # build a toy vocab: all single bytes + their </w> forms + one merge
    b2u = _bytes_to_unicode()
    vocab = {}
    for ch in b2u.values():
        vocab[ch] = len(vocab)
        vocab[ch + "</w>"] = len(vocab)
    vocab["he"] = len(vocab)
    vocab["hello</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    merges = "#version\nh e\nhe llo</w>\nl l\nll o</w>\n"
    vp, mp = str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt")
    json.dump(vocab, open(vp, "w"))
    open(mp, "w").write(merges)
    tok = CLIPTokenizer(vp, mp)
    ids = tok.encode("hello")
    assert ids == [vocab["hello</w>"]]
    out = tok(["hello hello"])
    assert out.shape == (1, 77)
    assert out[0, 0] == vocab["<|startoftext|>"]
    assert out[0, 3] == vocab["<|endoftext|>"]
    assert (out[0, 4:] == vocab["<|endoftext|>"]).all()


def test_infer_cli_tiny(tmp_path):
    root = str(tmp_path / "data")
    os.makedirs(root)
    make_viton_tree(root, n=2)
    out_dir = str(tmp_path / "out")
    from idmvton_tpu.cli.infer import main
    main(["--data_dir", root, "--output_dir", out_dir, "--tiny",
          "--width", "48", "--height", "64", "--num_inference_steps", "2",
          "--test_batch_size", "2", "--dtype", "float32", "--unpaired"])
    outs = sorted(os.listdir(out_dir))
    assert len(outs) == 2
    img = np.asarray(Image.open(os.path.join(out_dir, outs[0])))
    assert img.shape == (64, 48, 3)


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    from idmvton_tpu.pipeline.tryon import TryonModels
    from idmvton_tpu.weights.checkpoint import save_pipeline, load_pipeline
    models = TryonModels.init(jax.random.PRNGKey(0), tiny=True,
                              dtype=jnp.float32)
    path = str(tmp_path / "ckpt")
    save_pipeline(path, models)
    loaded = load_pipeline(path, dtype=jnp.float32)
    assert loaded.unet_cfg == models.unet_cfg
    a = jax.tree_util.tree_leaves(models.params())
    b = jax.tree_util.tree_leaves(loaded.params())
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
