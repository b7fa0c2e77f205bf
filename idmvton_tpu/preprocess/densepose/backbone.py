"""ResNet-50 + FPN backbone (frozen BN) for the DensePose R-CNN.

reference: gradio_demo/detectron2 build_resnet_fpn_backbone with the
densepose R50 config (configs/Base-DensePose-RCNN-FPN.yaml: OUT_FEATURES
res2-res5, FPN P2-P6). FrozenBatchNorm folds into a scale+bias at inference
— stored here as affine constants.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from idmvton_tpu.models.layers import init_conv, conv2d

_R50_BLOCKS = (3, 4, 6, 3)
FPN_DIM = 256


def _init_frozen_bn(ch):
    return {"scale": jnp.ones((ch,), jnp.float32),
            "bias": jnp.zeros((ch,), jnp.float32)}


def _fbn(p, x):
    return x * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _init_conv_bn(key, in_ch, out_ch, k, dtype):
    return {"conv": init_conv(key, in_ch, out_ch, k, bias=False, dtype=dtype),
            "bn": _init_frozen_bn(out_ch)}


def init_resnet50(key, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 256))
    nk = lambda: next(keys)
    params = {"stem": _init_conv_bn(nk(), 3, 64, 7, dtype)}
    inplanes = 64
    for li, blocks in enumerate(_R50_BLOCKS):
        planes = 64 * (2 ** li)
        layer = []
        for bi in range(blocks):
            blk = {
                "conv1": _init_conv_bn(nk(), inplanes if bi == 0 else planes * 4,
                                       planes, 1, dtype),
                "conv2": _init_conv_bn(nk(), planes, planes, 3, dtype),
                "conv3": _init_conv_bn(nk(), planes, planes * 4, 1, dtype),
            }
            if bi == 0:
                blk["shortcut"] = _init_conv_bn(nk(), inplanes, planes * 4, 1,
                                                dtype)
            layer.append(blk)
        params[f"res{li + 2}"] = layer
        inplanes = planes * 4
    return params


def resnet50_apply(params, x) -> Dict[str, jnp.ndarray]:
    """x: (B, H, W, 3) preprocessed BGR. Returns {res2..res5} NHWC."""
    h = conv2d(params["stem"]["conv"], x, stride=2, padding=((3, 3), (3, 3)))
    h = jax.nn.relu(_fbn(params["stem"]["bn"], h))
    h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    outs = {}
    for li in range(4):
        stride = 1 if li == 0 else 2
        for bi, blk in enumerate(params[f"res{li + 2}"]):
            s = stride if bi == 0 else 1
            r = h
            y = jax.nn.relu(_fbn(blk["conv1"]["bn"],
                                 conv2d(blk["conv1"]["conv"], h, stride=s)))
            y = jax.nn.relu(_fbn(blk["conv2"]["bn"],
                                 conv2d(blk["conv2"]["conv"], y,
                                        padding=((1, 1), (1, 1)))))
            y = _fbn(blk["conv3"]["bn"], conv2d(blk["conv3"]["conv"], y))
            if "shortcut" in blk:
                r = _fbn(blk["shortcut"]["bn"],
                         conv2d(blk["shortcut"]["conv"], h, stride=s))
            h = jax.nn.relu(y + r)
        outs[f"res{li + 2}"] = h
    return outs


def init_fpn(key, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 16))
    nk = lambda: next(keys)
    in_dims = (256, 512, 1024, 2048)
    return {
        "lateral": [init_conv(nk(), d, FPN_DIM, 1, dtype=dtype) for d in in_dims],
        "output": [init_conv(nk(), FPN_DIM, FPN_DIM, 3, dtype=dtype)
                   for _ in in_dims],
    }


def fpn_apply(params, feats: Dict[str, jnp.ndarray]) -> List[jnp.ndarray]:
    """Returns [p2, p3, p4, p5, p6] (p6 = stride-2 maxpool of p5)."""
    cs = [feats[f"res{i}"] for i in (2, 3, 4, 5)]
    laterals = [conv2d(params["lateral"][i], cs[i]) for i in range(4)]
    # top-down nearest upsample
    for i in range(2, -1, -1):
        up = jax.image.resize(laterals[i + 1], laterals[i].shape, "nearest")
        laterals[i] = laterals[i] + up
    ps = [conv2d(params["output"][i], laterals[i], padding=((1, 1), (1, 1)))
          for i in range(4)]
    p6 = jax.lax.reduce_window(ps[3], -jnp.inf, jax.lax.max, (1, 1, 1, 1),
                               (1, 2, 2, 1), "VALID")
    return ps + [p6]
