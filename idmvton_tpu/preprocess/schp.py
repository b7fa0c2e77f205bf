"""SCHP human parsing: AugmentCE2P (ResNet-101 + PSP + edge branch) in JAX,
plus the reference's cv2 postprocessing and ATR+LIP fusion.

reference: preprocess/humanparsing/networks/AugmentCE2P.py (network),
parsing_api.py:84-188 (hole filling, arm-hole refinement, neck label 18
injection from ATR-11 minus LIP-13), run_parsing.py:26 (wrapper). The
reference serves ONNX exports of this network; here the network itself is
implemented in JAX (jit/NHWC) with a converter from SCHP .pth checkpoints —
the ONNX graphs encode the same weights.

InPlaceABN (reference native op N3, preprocess/humanparsing/modules/src/) is
batch-norm + leaky_relu(0.01) computed in-place to save training memory; on
TPU, XLA fuses the normalization chain into surrounding ops, so the inference
equivalent is a plain fused BN+activation (see ``_abn``).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from idmvton_tpu.models.layers import init_conv, conv2d

ATR_CLASSES = 18
LIP_CLASSES = 20
_LAYERS = (3, 4, 23, 3)  # ResNet-101
_PSP_SIZES = (1, 2, 3, 6)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _init_bn(ch):
    return {"scale": jnp.ones((ch,), jnp.float32),
            "bias": jnp.zeros((ch,), jnp.float32),
            "mean": jnp.zeros((ch,), jnp.float32),
            "var": jnp.ones((ch,), jnp.float32)}


def _bn(p, x, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps) * p["scale"]
    return (x - p["mean"]) * inv + p["bias"]


def _abn(p, x):
    """InPlaceABN inference: BN + leaky_relu(0.01)."""
    return jax.nn.leaky_relu(_bn(p, x), 0.01)


def _conv_bn(key, in_ch, out_ch, k, *, dtype):
    return {"conv": init_conv(key, in_ch, out_ch, k, bias=False, dtype=dtype),
            "bn": _init_bn(out_ch)}


def _dilated_conv(params, x, *, dilation: int):
    y = jax.lax.conv_general_dilated(
        x, params["kernel"].astype(x.dtype), (1, 1),
        [(dilation, dilation)] * 2, rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y


def adaptive_avg_pool(x, size: int):
    """torch AdaptiveAvgPool2d semantics, NHWC."""
    b, h, w, c = x.shape
    out = jnp.zeros((b, size, size, c), x.dtype)
    for i in range(size):
        y0, y1 = (i * h) // size, -(-((i + 1) * h) // size)
        for j in range(size):
            x0, x1 = (j * w) // size, -(-((j + 1) * w) // size)
            out = out.at[:, i, j].set(jnp.mean(x[:, y0:y1, x0:x1], axis=(1, 2)))
    return out


def _ac_axis(out_n: int, in_n: int, dtype):
    """Source sample positions for align_corners=True bilinear: pos =
    i*(in-1)/(out-1) (torch F.interpolate semantics — NOT the half-pixel
    convention jax.image.resize implements)."""
    if out_n == 1 or in_n == 1:
        lo = jnp.zeros((out_n,), jnp.int32)
        return lo, lo, jnp.zeros((out_n,), dtype)
    pos = jnp.arange(out_n, dtype=dtype) * ((in_n - 1) / (out_n - 1))
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, in_n - 2)
    return lo, lo + 1, pos - lo.astype(dtype)


def _resize_bilinear(x, hw):
    """align_corners=True bilinear (reference: F.interpolate(...,
    mode='bilinear', align_corners=True) throughout AugmentCE2P.py and the
    upsample at parsing_api.py:137,170)."""
    b, h, w, c = x.shape
    oh, ow = hw
    if (oh, ow) == (h, w):
        return x
    dt = jnp.float32
    y0, y1, fy = _ac_axis(oh, h, dt)
    x0, x1, fx = _ac_axis(ow, w, dt)
    xf = x.astype(dt)
    rows = (xf[:, y0] * (1.0 - fy)[None, :, None, None]
            + xf[:, y1] * fy[None, :, None, None])
    out = (rows[:, :, x0] * (1.0 - fx)[None, None, :, None]
           + rows[:, :, x1] * fx[None, None, :, None])
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_schp(key, num_classes: int = ATR_CLASSES, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 1024))
    nk = lambda: next(keys)

    params = {"stem": [
        _conv_bn(nk(), 3, 64, 3, dtype=dtype),
        _conv_bn(nk(), 64, 64, 3, dtype=dtype),
        _conv_bn(nk(), 64, 128, 3, dtype=dtype),
    ]}

    inplanes = 128
    for li, (planes, blocks, stride, dilation) in enumerate(
            [(64, _LAYERS[0], 1, 1), (128, _LAYERS[1], 2, 1),
             (256, _LAYERS[2], 2, 1), (512, _LAYERS[3], 1, 2)]):
        layer = []
        for bi in range(blocks):
            blk = {
                "conv1": _conv_bn(nk(), inplanes if bi == 0 else planes * 4,
                                  planes, 1, dtype=dtype),
                "conv2": _conv_bn(nk(), planes, planes, 3, dtype=dtype),
                "conv3": _conv_bn(nk(), planes, planes * 4, 1, dtype=dtype),
            }
            if bi == 0 and (stride != 1 or inplanes != planes * 4):
                blk["downsample"] = _conv_bn(nk(), inplanes, planes * 4, 1,
                                             dtype=dtype)
            layer.append(blk)
        params[f"layer{li + 1}"] = layer
        inplanes = planes * 4

    params["psp"] = {
        "stages": [_conv_bn(nk(), 2048, 512, 1, dtype=dtype)
                   for _ in _PSP_SIZES],
        "bottleneck": _conv_bn(nk(), 2048 + 512 * len(_PSP_SIZES), 512, 3,
                               dtype=dtype),
    }
    params["edge"] = {
        "conv1": _conv_bn(nk(), 256, 256, 1, dtype=dtype),
        "conv2": _conv_bn(nk(), 512, 256, 1, dtype=dtype),
        "conv3": _conv_bn(nk(), 1024, 256, 1, dtype=dtype),
        "conv4": init_conv(nk(), 256, 2, 3, dtype=dtype),
        "conv5": init_conv(nk(), 6, 2, 1, dtype=dtype),
    }
    params["decoder"] = {
        "conv1": _conv_bn(nk(), 512, 256, 1, dtype=dtype),
        "conv2": _conv_bn(nk(), 256, 48, 1, dtype=dtype),
        "conv3a": _conv_bn(nk(), 304, 256, 1, dtype=dtype),
        "conv3b": _conv_bn(nk(), 256, 256, 1, dtype=dtype),
        "conv4": init_conv(nk(), 256, num_classes, 1, dtype=dtype),
    }
    params["fusion"] = {
        "conv": _conv_bn(nk(), 1024, 256, 1, dtype=dtype),
        "out": init_conv(nk(), 256, num_classes, 1, dtype=dtype),
    }
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _bottleneck(blk, x, *, stride: int, dilation: int):
    r = x
    h = jax.nn.relu(_bn(blk["conv1"]["bn"], conv2d(blk["conv1"]["conv"], x)))
    if dilation > 1:
        h = _dilated_conv(blk["conv2"]["conv"], h, dilation=dilation)
    else:
        h = conv2d(blk["conv2"]["conv"], h, stride=stride,
                   padding=((1, 1), (1, 1)))
    h = jax.nn.relu(_bn(blk["conv2"]["bn"], h))
    h = _bn(blk["conv3"]["bn"], conv2d(blk["conv3"]["conv"], h))
    if "downsample" in blk:
        r = _bn(blk["downsample"]["bn"],
                conv2d(blk["downsample"]["conv"], x, stride=stride))
    return jax.nn.relu(h + r)


def schp_apply(params, x):
    """x: (B, H, W, 3) BGR normalized with mean (0.406, 0.456, 0.485) /
    std (0.225, 0.224, 0.229) (the reference's transform, parsing_api.py:124).
    Returns (parsing_logits, fusion_logits, edge_logits) at H/4 resolution.
    The runtime consumer uses fusion_logits (ONNX output[1])."""
    h = x
    for i, cb in enumerate(params["stem"]):
        h = conv2d(cb["conv"], h, stride=2 if i == 0 else 1,
                   padding=((1, 1), (1, 1)))
        h = jax.nn.relu(_bn(cb["bn"], h))
    # 3x3 stride-2 maxpool, padding 1
    h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])

    feats = []
    for li, (stride, dilation) in enumerate([(1, 1), (2, 1), (2, 1), (1, 2)]):
        for bi, blk in enumerate(params[f"layer{li + 1}"]):
            h = _bottleneck(blk, h, stride=stride if bi == 0 else 1,
                            dilation=dilation)
        feats.append(h)
    x2, x3, x4, x5 = feats

    # PSP context encoding
    hw = x5.shape[1:3]
    priors = []
    for size, st in zip(_PSP_SIZES, params["psp"]["stages"]):
        p = adaptive_avg_pool(x5, size)
        p = _abn(st["bn"], conv2d(st["conv"], p))
        priors.append(_resize_bilinear(p, hw))
    priors.append(x5)
    ctx = _abn(params["psp"]["bottleneck"]["bn"],
               conv2d(params["psp"]["bottleneck"]["conv"],
                      jnp.concatenate(priors, -1)))

    # decoder
    dec = params["decoder"]
    xt = _resize_bilinear(_abn(dec["conv1"]["bn"],
                               conv2d(dec["conv1"]["conv"], ctx)),
                          x2.shape[1:3])
    xl = _abn(dec["conv2"]["bn"], conv2d(dec["conv2"]["conv"], x2))
    d = jnp.concatenate([xt, xl], -1)
    d = _abn(dec["conv3a"]["bn"], conv2d(dec["conv3a"]["conv"], d))
    d = _abn(dec["conv3b"]["bn"], conv2d(dec["conv3b"]["conv"], d))
    parsing = conv2d(dec["conv4"], d)

    # edge branch
    e = params["edge"]
    hw2 = x2.shape[1:3]
    f1 = _abn(e["conv1"]["bn"], conv2d(e["conv1"]["conv"], x2))
    f2 = _abn(e["conv2"]["bn"], conv2d(e["conv2"]["conv"], x3))
    f3 = _abn(e["conv3"]["bn"], conv2d(e["conv3"]["conv"], x4))
    e1, e2, e3 = (conv2d(e["conv4"], f) for f in (f1, f2, f3))
    f2, f3 = _resize_bilinear(f2, hw2), _resize_bilinear(f3, hw2)
    e2, e3 = _resize_bilinear(e2, hw2), _resize_bilinear(e3, hw2)
    edge = conv2d(e["conv5"], jnp.concatenate([e1, e2, e3], -1))
    edge_fea = jnp.concatenate([f1, f2, f3], -1)

    # fusion branch (the served output)
    fu = params["fusion"]
    fused = _abn(fu["conv"]["bn"],
                 conv2d(fu["conv"]["conv"], jnp.concatenate([d, edge_fea], -1)))
    fusion = conv2d(fu["out"], fused)
    return parsing, fusion, edge


# ---------------------------------------------------------------------------
# torch .pth converter
# ---------------------------------------------------------------------------


def convert_schp(sd: Dict[str, np.ndarray], num_classes: int = ATR_CLASSES,
                 dtype=jnp.float32, *, strict: bool = False) -> dict:
    """SCHP checkpoint (exp-schp-201908301523-atr.pth style state dict,
    possibly under 'state_dict' with 'module.' prefixes) -> param tree."""
    sd = {k.replace("module.", ""): np.asarray(v) for k, v in sd.items()}
    used = set()

    def _g(key):
        used.add(key)
        return sd[key]

    def conv(key, bias=False):
        p = {"kernel": jnp.asarray(np.transpose(_g(key + ".weight"),
                                                (2, 3, 1, 0)), dtype)}
        # bias whenever present: BN-folded ONNX exports add biases to convs
        # that are bias-free in the .pth layout
        if key + ".bias" in sd:
            p["bias"] = jnp.asarray(_g(key + ".bias"), dtype)
        return p

    def bn(key):
        return {"scale": jnp.asarray(_g(key + ".weight"), jnp.float32),
                "bias": jnp.asarray(_g(key + ".bias"), jnp.float32),
                "mean": jnp.asarray(_g(key + ".running_mean"), jnp.float32),
                "var": jnp.asarray(_g(key + ".running_var"), jnp.float32)}

    def conv_bn(ck, bk):
        return {"conv": conv(ck), "bn": bn(bk)}

    params = {"stem": [conv_bn(f"conv{i}", f"bn{i}") for i in (1, 2, 3)]}
    for li in range(4):
        layer = []
        for bi in range(_LAYERS[li]):
            pre = f"layer{li + 1}.{bi}"
            blk = {f"conv{j}": conv_bn(f"{pre}.conv{j}", f"{pre}.bn{j}")
                   for j in (1, 2, 3)}
            if f"{pre}.downsample.0.weight" in sd:
                blk["downsample"] = conv_bn(f"{pre}.downsample.0",
                                            f"{pre}.downsample.1")
            layer.append(blk)
        params[f"layer{li + 1}"] = layer
    params["psp"] = {
        "stages": [conv_bn(f"context_encoding.stages.{i}.1",
                           f"context_encoding.stages.{i}.2")
                   for i in range(len(_PSP_SIZES))],
        "bottleneck": conv_bn("context_encoding.bottleneck.0",
                              "context_encoding.bottleneck.1"),
    }
    params["edge"] = {
        "conv1": conv_bn("edge.conv1.0", "edge.conv1.1"),
        "conv2": conv_bn("edge.conv2.0", "edge.conv2.1"),
        "conv3": conv_bn("edge.conv3.0", "edge.conv3.1"),
        "conv4": conv("edge.conv4", bias=True),
        "conv5": conv("edge.conv5", bias=True),
    }
    params["decoder"] = {
        "conv1": conv_bn("decoder.conv1.0", "decoder.conv1.1"),
        "conv2": conv_bn("decoder.conv2.0", "decoder.conv2.1"),
        "conv3a": conv_bn("decoder.conv3.0", "decoder.conv3.1"),
        "conv3b": conv_bn("decoder.conv3.2", "decoder.conv3.3"),
        "conv4": conv("decoder.conv4", bias=True),
    }
    params["fusion"] = {
        "conv": conv_bn("fushion.0", "fushion.1"),
        "out": conv("fushion.3", bias=True),
    }
    if strict:
        from idmvton_tpu.weights.converter import check_consumed
        check_consumed(sd, used)
    return params


# ---------------------------------------------------------------------------
# ONNX ingestion — the reference ships the parsing models ONLY as ONNX
# (run_parsing.py:20-22: ckpt/humanparsing/parsing_atr.onnx / parsing_lip.onnx)
# ---------------------------------------------------------------------------


def _trace_order(num_classes: int):
    """(kind, torch-key) sequence in AugmentCE2P.forward trace order
    (networks/AugmentCE2P.py:348-364; submodule forwards :162,:240,:286).
    This is the order Conv/BatchNormalization nodes appear in an ONNX export,
    used to bind anonymous initializers positionally."""
    del num_classes
    seq = []
    for i in (1, 2, 3):
        seq += [("conv", f"conv{i}"), ("bn", f"bn{i}")]
    for li in range(4):
        for bi in range(_LAYERS[li]):
            pre = f"layer{li + 1}.{bi}"
            for j in (1, 2, 3):
                seq += [("conv", f"{pre}.conv{j}"), ("bn", f"{pre}.bn{j}")]
            if bi == 0:  # first block of each layer has the projection
                seq += [("conv", f"{pre}.downsample.0"),
                        ("bn", f"{pre}.downsample.1")]
    for i in range(len(_PSP_SIZES)):
        seq += [("conv", f"context_encoding.stages.{i}.1"),
                ("bn", f"context_encoding.stages.{i}.2")]
    seq += [("conv", "context_encoding.bottleneck.0"),
            ("bn", "context_encoding.bottleneck.1")]
    # decoder before edge (AugmentCE2P.py:358-360)
    seq += [("conv", "decoder.conv1.0"), ("bn", "decoder.conv1.1"),
            ("conv", "decoder.conv2.0"), ("bn", "decoder.conv2.1"),
            ("conv", "decoder.conv3.0"), ("bn", "decoder.conv3.1"),
            ("conv", "decoder.conv3.2"), ("bn", "decoder.conv3.3"),
            ("conv", "decoder.conv4")]
    # edge trace: conv1,conv4, conv2,conv4(shared), conv3,conv4(shared), conv5
    seq += [("conv", "edge.conv1.0"), ("bn", "edge.conv1.1"),
            ("conv", "edge.conv4"),
            ("conv", "edge.conv2.0"), ("bn", "edge.conv2.1"),
            ("conv", "edge.conv3.0"), ("bn", "edge.conv3.1"),
            ("conv", "edge.conv5")]
    seq += [("conv", "fushion.0"), ("bn", "fushion.1"), ("conv", "fushion.3")]
    return seq


def _positional_state_dict(model, num_classes: int) -> Dict[str, np.ndarray]:
    """Bind anonymous ONNX initializers to torch keys by walking
    Conv/BatchNormalization nodes in graph (trace) order. Shared weights
    (edge.conv4 is applied three times, AugmentCE2P.py:245-250) bind on
    first occurrence only. BN-folded exports (no BatchNormalization nodes)
    simply skip past the bn slots."""
    inits = model.initializers
    order = _trace_order(num_classes)
    pos = 0
    sd: Dict[str, np.ndarray] = {}
    bound = set()

    def advance_to(kind):
        nonlocal pos
        # a Conv node may legitimately skip bn slots (folded exports); a
        # BatchNormalization node must never skip a conv slot
        while pos < len(order) and order[pos][0] != kind:
            if order[pos][0] == "conv":
                raise ValueError(f"trace mismatch: expected conv "
                                 f"'{order[pos][1]}' before next {kind}")
            pos += 1
        if pos >= len(order):
            raise ValueError(f"more {kind} nodes than trace slots")
        pos += 1
        return order[pos - 1][1]

    for node in model.nodes:
        if node.op_type == "Conv":
            w = node.inputs[1]
            if w not in inits or w in bound:
                continue  # dynamic weight, or a shared module re-applied
            bound.add(w)
            key = advance_to("conv")
            sd[key + ".weight"] = inits[w]
            if len(node.inputs) > 2 and node.inputs[2] in inits:
                sd[key + ".bias"] = inits[node.inputs[2]]
        elif node.op_type == "BatchNormalization":
            names = node.inputs[1:5]  # scale, B, mean, var
            if names[0] in bound:
                continue
            bound.add(names[0])
            key = advance_to("bn")
            for suffix, n in zip(
                    (".weight", ".bias", ".running_mean", ".running_var"),
                    names):
                sd[key + suffix] = inits[n]
    unbound_convs = [k for kind, k in order[pos:] if kind == "conv"]
    if unbound_convs:
        raise ValueError(f"unbound conv slots after node walk: "
                         f"{unbound_convs}")
    return sd


def _synthesize_identity_bn(sd: Dict[str, np.ndarray],
                            num_classes: int) -> Dict[str, np.ndarray]:
    """For BN-folded exports: every bn slot missing from sd becomes the
    identity under _bn's eps=1e-5 (scale=sqrt(1+eps), zero mean/bias).
    Channel count comes from the conv traced immediately before the bn."""
    out = dict(sd)
    order = _trace_order(num_classes)
    for i, (kind, key) in enumerate(order):
        if kind != "bn" or key + ".weight" in out:
            continue
        prev_kind, prev_key = order[i - 1]
        assert prev_kind == "conv", (key, prev_key)
        ch = out[prev_key + ".weight"].shape[0]
        out[key + ".weight"] = np.full((ch,), np.sqrt(1.0 + 1e-5), np.float32)
        out[key + ".bias"] = np.zeros((ch,), np.float32)
        out[key + ".running_mean"] = np.zeros((ch,), np.float32)
        out[key + ".running_var"] = np.ones((ch,), np.float32)
    return out


def convert_schp_onnx(path, num_classes: int = ATR_CLASSES,
                      dtype=jnp.float32, *, strict: bool = False) -> dict:
    """Load an SCHP ONNX artifact (the format the reference actually ships,
    run_parsing.py:20-22) into the JAX param tree.

    Handles three export shapes:
    1. name-preserving exports (initializers named like torch params),
    2. name-preserving with BN folded into convs (identity BN synthesized),
    3. anonymous initializers (bound positionally by node-trace walk).
    """
    from idmvton_tpu.weights.onnx_reader import read_onnx

    model = read_onnx(path)
    sd = {k[7:] if k.startswith("module.") else k: v
          for k, v in model.initializers.items()}
    if "conv1.weight" not in sd:
        sd = _positional_state_dict(model, num_classes)
    if "bn1.weight" not in sd:  # BN folded into convs
        sd = _synthesize_identity_bn(sd, num_classes)
    # graph-machinery constants (Shape/Resize params etc.) are expected
    # leftovers in an ONNX graph, so strict consumption can't apply to the
    # raw initializer set — convert from the rebuilt torch-keyed dict
    return convert_schp(sd, num_classes, dtype, strict=strict)


# ---------------------------------------------------------------------------
# runtime wrapper: ATR + LIP fusion and cv2 postprocess
# ---------------------------------------------------------------------------

_MEAN_BGR = np.asarray([0.406, 0.456, 0.485], np.float32)
_STD_BGR = np.asarray([0.225, 0.224, 0.229], np.float32)


def _letterbox(image_rgb: np.ndarray, size: int):
    """Aspect-preserving center placement into (size, size) (the reference's
    box-to-center/scale affine on the whole image). Returns (input, meta)."""
    import cv2
    h, w = image_rgb.shape[:2]
    scale = size / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = cv2.resize(image_rgb, (nw, nh), interpolation=cv2.INTER_LINEAR)
    canvas = np.zeros((size, size, 3), np.uint8)
    top, left = (size - nh) // 2, (size - nw) // 2
    canvas[top:top + nh, left:left + nw] = resized
    return canvas, (top, left, nh, nw, h, w)


def _unletterbox_logits(logits: np.ndarray, meta):
    import cv2
    top, left, nh, nw, h, w = meta
    crop = logits[top:top + nh, left:left + nw]
    return cv2.resize(crop, (w, h), interpolation=cv2.INTER_LINEAR)


class Parsing:
    """ATR (18-class) + LIP (20-class) parse with the reference postprocess:
    upper-cloth hole filling, arm-hole refinement, neck label 18
    (parsing_api.py onnx_inference semantics). Returns (palette PIL image,
    face mask float array)."""

    def __init__(self, atr_params=None, lip_params=None):
        self.atr = atr_params if atr_params is not None else init_schp(
            jax.random.PRNGKey(0), ATR_CLASSES)
        self.lip = lip_params if lip_params is not None else init_schp(
            jax.random.PRNGKey(1), LIP_CLASSES)
        self._apply = jax.jit(schp_apply)

    @staticmethod
    def from_torch(atr_path: str, lip_path: str) -> "Parsing":
        from idmvton_tpu.weights.converter import load_state_dict
        return Parsing(convert_schp(load_state_dict(atr_path), ATR_CLASSES),
                       convert_schp(load_state_dict(lip_path), LIP_CLASSES))

    @staticmethod
    def from_onnx(atr_path: str, lip_path: str) -> "Parsing":
        """Load the artifact format the reference actually ships
        (run_parsing.py:20-22: parsing_atr.onnx / parsing_lip.onnx)."""
        return Parsing(convert_schp_onnx(atr_path, ATR_CLASSES),
                       convert_schp_onnx(lip_path, LIP_CLASSES))

    def _logits(self, params, image_rgb: np.ndarray, size: int) -> np.ndarray:
        inp, meta = _letterbox(image_rgb, size)
        bgr = inp[:, :, ::-1].astype(np.float32) / 255.0
        x = (bgr - _MEAN_BGR) / _STD_BGR
        _, fusion, _ = self._apply(params, jnp.asarray(x[None]))
        # Upsample(size, mode='bilinear', align_corners=True),
        # parsing_api.py:136-139
        fusion = np.asarray(_resize_bilinear(fusion, (size, size))[0])
        return _unletterbox_logits(fusion, meta)

    def __call__(self, image_rgb: np.ndarray):
        from PIL import Image

        atr_logits = self._logits(self.atr, image_rgb, 512)
        parsing = refine_cloth(np.argmax(atr_logits, axis=2))

        lip_logits = self._logits(self.lip, image_rgb, 473)
        lip_parsing = np.argmax(lip_logits, axis=2)
        parsing = add_neck(parsing, lip_parsing)

        out = Image.fromarray(parsing.astype(np.uint8))
        out.putpalette(get_palette(19))
        face_mask = (parsing == 11).astype(np.float32)
        return out, face_mask


def refine_cloth(parsing: np.ndarray) -> np.ndarray:
    """ATR postprocess: hole-fill the upper-cloth+arms union, keep >2000 px
    holes between arm and cloth (parsing_api.py:142-156 semantics).
    parsing: (H, W) int argmax of the ATR logits; returns same shape."""
    import cv2
    from idmvton_tpu.preprocess.agnostic_mask import _fill_holes

    parsing = np.pad(parsing, 1, mode="constant")

    # hole-fill the upper cloth + arms union (parsing_api.py:144-150)
    arm = ((parsing == 14) | (parsing == 15)).astype(np.float32)
    cloth_union = (parsing == 4).astype(np.float32) + arm
    filled = _fill_holes(np.where(cloth_union, 255, 0).astype(np.uint8))
    filled4 = filled.astype(np.float32) / 255 * 4
    woarm = np.where(filled4 == 4, filled4, parsing)

    # refined holes between arm and cloth (> 2000 px) keep their label
    # (parsing_api.py:109-119 refine_hole, applied at :152-154)
    hole = cv2.bitwise_and(
        np.where(filled4 == 4, 255, 0).astype(np.uint8),
        np.where(parsing != 4, 255, 0).astype(np.uint8)) - \
        (arm * 255).astype(np.uint8)
    contours, _ = cv2.findContours(hole, cv2.RETR_CCOMP,
                                   cv2.CHAIN_APPROX_TC89_L1)
    refine = np.zeros_like(parsing, np.uint8)
    for c in contours:
        if abs(cv2.contourArea(c, True)) > 2000:
            cv2.drawContours(refine, [c], -1, 255, -1)
    refine = refine + (arm * 255).astype(np.uint8)
    return np.where(refine, parsing, woarm)[1:-1, 1:-1]


def add_neck(parsing: np.ndarray, lip_parsing: np.ndarray) -> np.ndarray:
    """neck = ATR head(11) minus LIP face(13) -> label 18
    (parsing_api.py:176-179)."""
    neck = np.logical_and(np.logical_not(lip_parsing == 13), parsing == 11)
    return np.where(neck, 18, parsing)


def get_palette(num_cls: int) -> List[int]:
    """Standard PASCAL-style segmentation palette."""
    palette = [0] * (num_cls * 3)
    for j in range(num_cls):
        lab, i = j, 0
        while lab:
            palette[j * 3 + 0] |= ((lab >> 0) & 1) << (7 - i)
            palette[j * 3 + 1] |= ((lab >> 1) & 1) << (7 - i)
            palette[j * 3 + 2] |= ((lab >> 2) & 1) << (7 - i)
            i += 1
            lab >>= 3
    return palette
