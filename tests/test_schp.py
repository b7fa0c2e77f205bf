"""SCHP parsing network + wrapper tests (random weights)."""

import numpy as np
import jax
import jax.numpy as jnp

from idmvton_tpu.preprocess.schp import (
    init_schp, schp_apply, convert_schp, adaptive_avg_pool, Parsing,
    ATR_CLASSES, LIP_CLASSES,
)


def test_adaptive_avg_pool_matches_torch_semantics():
    x = jnp.arange(1 * 7 * 5 * 2, dtype=jnp.float32).reshape(1, 7, 5, 2)
    out = adaptive_avg_pool(x, 3)
    assert out.shape == (1, 3, 3, 2)
    # bin 0 of H covers rows [0, ceil(7/3)) = [0, 3); bin 0 of W cols [0, 2)
    np.testing.assert_allclose(
        np.asarray(out[0, 0, 0]),
        np.asarray(jnp.mean(x[0, 0:3, 0:2], axis=(0, 1))), rtol=1e-6)


def test_schp_shapes():
    params = init_schp(jax.random.PRNGKey(0), ATR_CLASSES)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    parsing, fusion, edge = schp_apply(params, x)
    # stride-4 outputs (stem /2, maxpool /2; layer2/3 stride absorbed by
    # decoder upsampling back to layer1 resolution)
    assert parsing.shape == (1, 16, 16, ATR_CLASSES)
    assert fusion.shape == (1, 16, 16, ATR_CLASSES)
    assert edge.shape == (1, 16, 16, 2)


def test_schp_converter_roundtrip():
    """Export init params to torch naming, convert back, compare outputs."""
    params = init_schp(jax.random.PRNGKey(0), num_classes=4)
    # export
    sd = {}

    def put_conv(key, p):
        sd[key + ".weight"] = np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1))
        if "bias" in p:
            sd[key + ".bias"] = np.asarray(p["bias"])

    def put_bn(key, p):
        sd[key + ".weight"] = np.asarray(p["scale"])
        sd[key + ".bias"] = np.asarray(p["bias"])
        sd[key + ".running_mean"] = np.asarray(p["mean"])
        sd[key + ".running_var"] = np.asarray(p["var"])

    for i, cb in enumerate(params["stem"]):
        put_conv(f"conv{i+1}", cb["conv"]); put_bn(f"bn{i+1}", cb["bn"])
    for li in range(4):
        for bi, blk in enumerate(params[f"layer{li+1}"]):
            pre = f"layer{li+1}.{bi}"
            for j in (1, 2, 3):
                put_conv(f"{pre}.conv{j}", blk[f"conv{j}"]["conv"])
                put_bn(f"{pre}.bn{j}", blk[f"conv{j}"]["bn"])
            if "downsample" in blk:
                put_conv(f"{pre}.downsample.0", blk["downsample"]["conv"])
                put_bn(f"{pre}.downsample.1", blk["downsample"]["bn"])
    for i, st in enumerate(params["psp"]["stages"]):
        put_conv(f"context_encoding.stages.{i}.1", st["conv"])
        put_bn(f"context_encoding.stages.{i}.2", st["bn"])
    put_conv("context_encoding.bottleneck.0", params["psp"]["bottleneck"]["conv"])
    put_bn("context_encoding.bottleneck.1", params["psp"]["bottleneck"]["bn"])
    for i in (1, 2, 3):
        put_conv(f"edge.conv{i}.0", params["edge"][f"conv{i}"]["conv"])
        put_bn(f"edge.conv{i}.1", params["edge"][f"conv{i}"]["bn"])
    put_conv("edge.conv4", params["edge"]["conv4"])
    put_conv("edge.conv5", params["edge"]["conv5"])
    put_conv("decoder.conv1.0", params["decoder"]["conv1"]["conv"])
    put_bn("decoder.conv1.1", params["decoder"]["conv1"]["bn"])
    put_conv("decoder.conv2.0", params["decoder"]["conv2"]["conv"])
    put_bn("decoder.conv2.1", params["decoder"]["conv2"]["bn"])
    put_conv("decoder.conv3.0", params["decoder"]["conv3a"]["conv"])
    put_bn("decoder.conv3.1", params["decoder"]["conv3a"]["bn"])
    put_conv("decoder.conv3.2", params["decoder"]["conv3b"]["conv"])
    put_bn("decoder.conv3.3", params["decoder"]["conv3b"]["bn"])
    put_conv("decoder.conv4", params["decoder"]["conv4"])
    put_conv("fushion.0", params["fusion"]["conv"]["conv"])
    put_bn("fushion.1", params["fusion"]["conv"]["bn"])
    put_conv("fushion.3", params["fusion"]["out"])

    p2 = convert_schp(sd, num_classes=4)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3))
    a = schp_apply(params, x)
    b = schp_apply(p2, x)
    for u, v in zip(a, b):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), atol=1e-5)


def test_parsing_wrapper_contract():
    p = Parsing()
    img = np.random.RandomState(0).randint(0, 255, (96, 72, 3), np.uint8)
    out, face = p(img)
    assert out.size == (72, 96)      # PIL (W, H)
    arr = np.asarray(out)
    assert arr.dtype == np.uint8 and arr.max() <= 18
    assert face.shape == (96, 72)
