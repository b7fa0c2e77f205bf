"""DensePose GeneralizedRCNN (R50-FPN) in JAX with static shapes.

reference: gradio_demo/detectron2 GeneralizedRCNN + DensePoseROIHeads +
DensePoseV1ConvXHead, config configs/Base-DensePose-RCNN-FPN.yaml +
densepose_rcnn_R_50_FPN_s1x.yaml. Dynamic proposal/detection counts (the
reason the reference needs CUDA NMS/ROIAlign, SURVEY §2.4) become fixed-size
padded tensors with validity masks — XLA-friendly, no native ops.

Inference path (apply_net 'show' dp_segm, gradio_demo/app.py:168-172):
image -> backbone/FPN -> RPN (per-level top-k + NMS -> N_PROPOSALS) ->
box head (ROIAlign 7, 2xFC-1024, class+delta, NMS 0.5 -> N_DETECTIONS) ->
densepose head (ROIAlign 28, 8x conv 512, deconv predictors -> 112x112
coarse/fine segm + UV per detection).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from idmvton_tpu.models.layers import init_conv, init_linear, conv2d, linear
from idmvton_tpu.ops.roi_align import roi_align
from idmvton_tpu.ops.nms import nms_topk
from idmvton_tpu.preprocess.densepose.backbone import (
    init_resnet50, resnet50_apply, init_fpn, fpn_apply, FPN_DIM,
)


@dataclasses.dataclass(frozen=True)
class DensePoseConfig:
    anchor_sizes: Tuple[int, ...] = (32, 64, 128, 256, 512)  # per level P2-P6
    aspect_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    # serving capacities follow the served config: PRE_NMS_TOPK_TEST 1000 /
    # POST_NMS_TOPK_TEST 1000 (configs/Base-DensePose-RCNN-FPN.yaml:16-21)
    # and DETECTIONS_PER_IMAGE 100 (detectron2/config/defaults.py:612)
    rpn_pre_nms_topk: int = 1000   # per level (test)
    rpn_post_nms_topk: int = 1000  # static proposal count fed to box head
    rpn_nms_thresh: float = 0.7
    box_score_thresh: float = 0.05
    box_nms_thresh: float = 0.5
    num_detections: int = 100      # static detection count
    dp_convs: int = 8
    dp_dim: int = 512
    dp_pooler: int = 28
    # densepose head chunking: the head + 112x112x25 predictor outputs for
    # 100 detections at once are ~0.5 GB of activations; lax.map over chunks
    # bounds that without changing results (must divide num_detections)
    dp_chunk: int = 20
    # Panoptic-FPN Decoder ahead of the densepose pooler (DECODER_ON defaults
    # True in densepose/config.py:191; the served s1x checkpoint has
    # roi_heads.decoder.* weights): merges P2-P5 into one stride-4 256-ch
    # feature (gradio_demo/densepose/modeling/roi_heads/roi_head.py:26-81).
    decoder_on: bool = True
    decoder_dim: int = 256
    heatmap_size: int = 112
    num_patches: int = 24          # 24 body parts + bg fine channels = 25
    bbox_reg_weights: Tuple[float, ...] = (10.0, 10.0, 5.0, 5.0)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_densepose_rcnn(key, cfg: DensePoseConfig = DensePoseConfig(),
                        dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 64))
    nk = lambda: next(keys)
    n_anchors = len(cfg.aspect_ratios)
    dp_out = cfg.num_patches + 1
    params = {
        "backbone": init_resnet50(nk(), dtype),
        "fpn": init_fpn(nk(), dtype),
        "rpn": {
            "conv": init_conv(nk(), FPN_DIM, FPN_DIM, 3, dtype=dtype),
            "objectness": init_conv(nk(), FPN_DIM, n_anchors, 1, dtype=dtype),
            "deltas": init_conv(nk(), FPN_DIM, n_anchors * 4, 1, dtype=dtype),
        },
        "box_head": {
            "fc1": init_linear(nk(), FPN_DIM * 7 * 7, 1024, dtype=dtype),
            "fc2": init_linear(nk(), 1024, 1024, dtype=dtype),
            "cls": init_linear(nk(), 1024, 2, dtype=dtype),     # person + bg
            "reg": init_linear(nk(), 1024, 4, dtype=dtype),
        },
        "dp_head": {
            "convs": [init_conv(nk(), (cfg.decoder_dim if cfg.decoder_on
                                       else FPN_DIM) if i == 0 else cfg.dp_dim,
                                cfg.dp_dim, 3, dtype=dtype)
                      for i in range(cfg.dp_convs)],
            # ConvTranspose2d(512, ch, 4, stride 2, pad 1) predictors
            "coarse_segm": _init_deconv(nk(), cfg.dp_dim, 2, dtype),
            "fine_segm": _init_deconv(nk(), cfg.dp_dim, dp_out, dtype),
            "u": _init_deconv(nk(), cfg.dp_dim, dp_out, dtype),
            "v": _init_deconv(nk(), cfg.dp_dim, dp_out, dtype),
        },
    }
    if cfg.decoder_on:
        dd = cfg.decoder_dim
        # head_length per P-level = log2(stride) - log2(common_stride=4):
        # P2 -> 1 conv, P3 -> 1, P4 -> 2, P5 -> 3 (roi_head.py:46-70)
        params["decoder"] = {
            "scale_heads": [
                [init_conv(nk(), FPN_DIM if j == 0 else dd, dd, 3,
                           dtype=dtype) for j in range(max(1, lvl))]
                for lvl in range(4)],
            "predictor": init_conv(nk(), dd, dd, 1, dtype=dtype),
        }
    return params


def _decoder_apply(params, ps, cfg: DensePoseConfig):
    """Panoptic-FPN semantic head (roi_head.py Decoder.forward): per level,
    conv3x3+ReLU (+bilinear 2x after each conv while above stride 4), sum
    across levels, 1x1 predictor. Returns the stride-4 (B, H/4, W/4, 256)
    feature the densepose pooler reads."""
    total = None
    for lvl in range(4):
        h = ps[lvl]
        for conv in params["decoder"]["scale_heads"][lvl]:
            h = jax.nn.relu(conv2d(conv, h, padding=((1, 1), (1, 1))))
            if lvl > 0:
                b, fh, fw, c = h.shape
                h = jax.image.resize(h, (b, fh * 2, fw * 2, c),
                                     jax.image.ResizeMethod.LINEAR)
        total = h if total is None else total + h
    return conv2d(params["decoder"]["predictor"], total)


def _init_deconv(key, in_ch, out_ch, dtype):
    k = init_conv(key, in_ch, out_ch, 4, dtype=dtype)
    return k


def _deconv2x(params, x):
    """torch ConvTranspose2d(k=4, s=2, p=1) == input-dilated conv with the
    spatially-flipped kernel and padding k-1-p=2."""
    kernel = params["kernel"][::-1, ::-1].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + params["bias"].astype(x.dtype)


# ---------------------------------------------------------------------------
# anchors + box transforms
# ---------------------------------------------------------------------------


def make_anchors(level_hw: Tuple[int, int], stride: int, size: int,
                 aspect_ratios) -> np.ndarray:
    """detectron2 DefaultAnchorGenerator: centered anchors on the grid."""
    anchors = []
    area = float(size * size)
    for ar in aspect_ratios:
        w = math.sqrt(area / ar)
        h = ar * w
        anchors.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    base = np.asarray(anchors, np.float32)          # (A, 4)
    fh, fw = level_hw
    shift_x = (np.arange(fw, dtype=np.float32)) * stride
    shift_y = (np.arange(fh, dtype=np.float32)) * stride
    sx, sy = np.meshgrid(shift_x, shift_y)
    shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
    return (shifts + base[None]).reshape(-1, 4)      # (H*W*A, 4)


def apply_deltas(anchors, deltas, weights):
    """detectron2 Box2BoxTransform.apply_deltas."""
    wx, wy, ww, wh = weights
    widths = anchors[:, 2] - anchors[:, 0]
    heights = anchors[:, 3] - anchors[:, 1]
    ctr_x = anchors[:, 0] + 0.5 * widths
    ctr_y = anchors[:, 1] + 0.5 * heights
    dx = deltas[:, 0] / wx
    dy = deltas[:, 1] / wy
    dw = jnp.clip(deltas[:, 2] / ww, None, math.log(1000.0 / 16))
    dh = jnp.clip(deltas[:, 3] / wh, None, math.log(1000.0 / 16))
    px = dx * widths + ctr_x
    py = dy * heights + ctr_y
    pw = jnp.exp(dw) * widths
    ph = jnp.exp(dh) * heights
    return jnp.stack([px - pw / 2, py - ph / 2, px + pw / 2, py + ph / 2],
                     axis=-1)


def _clip_boxes(boxes, img_hw):
    h, w = img_hw
    return jnp.stack([
        jnp.clip(boxes[:, 0], 0, w), jnp.clip(boxes[:, 1], 0, h),
        jnp.clip(boxes[:, 2], 0, w), jnp.clip(boxes[:, 3], 0, h)], axis=-1)


# ---------------------------------------------------------------------------
# forward (batch size 1 — the serving contract of apply_net)
# ---------------------------------------------------------------------------


def _fpn_level_assign(boxes, k0: int = 4, canonical: float = 224.0):
    """FPN paper eq. 1: level = floor(k0 + log2(sqrt(area)/224)), clamped to
    P2..P5 (indices 0..3)."""
    area = jnp.maximum((boxes[:, 2] - boxes[:, 0])
                       * (boxes[:, 3] - boxes[:, 1]), 1e-6)
    lvl = jnp.floor(k0 + jnp.log2(jnp.sqrt(area) / canonical + 1e-8))
    return jnp.clip(lvl, 2, 5).astype(jnp.int32) - 2


def _multilevel_roi_align(ps, boxes, valid, out_size: int):
    """ROIAlign over the assigned FPN level, computed as a masked sum over
    levels (static shapes; each ROI contributes from exactly one level)."""
    lvls = _fpn_level_assign(boxes)
    pooled = None
    for i in range(4):
        idx = jnp.where((lvls == i) & valid, 0, -1)
        p = roi_align(ps[i], boxes, idx, output_size=out_size,
                      spatial_scale=1.0 / (4 * 2 ** i), sampling_ratio=2)
        pooled = p if pooled is None else pooled + p
    return pooled


def _dp_head_apply(params, dpp, cfg: DensePoseConfig):
    """8x conv3x3-512 + per-output deconv2x + bilinear to 112
    (DensePoseV1ConvXHead + predictors). At the served capacity of 100
    detections the predictor outputs alone are ~0.5 GB of activations, so
    the head runs as a lax.map over detection chunks — identical results,
    peak memory bounded by the chunk."""
    def head(chunk):
        h = chunk
        for conv in params["dp_head"]["convs"]:
            h = jax.nn.relu(conv2d(conv, h, padding=((1, 1), (1, 1))))
        outs = {}
        for name in ("coarse_segm", "fine_segm", "u", "v"):
            o = _deconv2x(params["dp_head"][name], h)        # (k, 56, 56, C)
            outs[name] = jax.image.resize(
                o, (o.shape[0], cfg.heatmap_size, cfg.heatmap_size,
                    o.shape[-1]), jax.image.ResizeMethod.LINEAR)
        return outs

    k = dpp.shape[0]
    chunk = min(cfg.dp_chunk, k)
    if chunk <= 0 or k % chunk:
        chunk = k  # no clean split — run unchunked
    if chunk == k:
        return head(dpp)
    stacked = dpp.reshape(k // chunk, chunk, *dpp.shape[1:])
    mapped = jax.lax.map(head, stacked)
    return {name: o.reshape(k, *o.shape[2:]) for name, o in mapped.items()}


def densepose_rcnn_apply(params, x, cfg: DensePoseConfig = DensePoseConfig()):
    """x: (1, H, W, 3) preprocessed BGR (caffe-style mean-subtracted).
    Returns dict with fixed-size detections + densepose outputs:
      boxes (K, 4), scores (K,), valid (K,),
      coarse (K, 112, 112, 2), fine (K, 112, 112, 25), u/v (K, 112, 112, 25).
    """
    img_hw = x.shape[1:3]
    feats = resnet50_apply(params["backbone"], x)
    ps = fpn_apply(params["fpn"], feats)

    # --- RPN over 5 levels
    all_boxes, all_scores = [], []
    for lvl, p in enumerate(ps):
        h = jax.nn.relu(conv2d(params["rpn"]["conv"], p,
                               padding=((1, 1), (1, 1))))
        obj = conv2d(params["rpn"]["objectness"], h)[0]      # (fh, fw, A)
        del_ = conv2d(params["rpn"]["deltas"], h)[0]          # (fh, fw, A*4)
        fh, fw, a = obj.shape
        anchors = jnp.asarray(make_anchors((fh, fw), 4 * 2 ** lvl,
                                           cfg.anchor_sizes[lvl],
                                           cfg.aspect_ratios))
        scores = obj.reshape(-1)
        deltas = del_.reshape(fh * fw, a, 4).reshape(-1, 4)
        k = min(cfg.rpn_pre_nms_topk, scores.shape[0])
        top_scores, top_idx = jax.lax.top_k(scores, k)
        boxes = apply_deltas(anchors[top_idx], deltas[top_idx],
                             (1.0, 1.0, 1.0, 1.0))
        all_boxes.append(_clip_boxes(boxes, img_hw))
        all_scores.append(top_scores)
    rpn_boxes = jnp.concatenate(all_boxes)
    rpn_scores = jnp.concatenate(all_scores)
    # per-level NMS then global top-k is the d2 order; a single NMS over the
    # level-concat differs only for cross-level duplicates (rare)
    prop_boxes, prop_scores, prop_idx = nms_topk(
        rpn_boxes, rpn_scores, iou_threshold=cfg.rpn_nms_thresh,
        topk=cfg.rpn_post_nms_topk)
    prop_valid = prop_idx >= 0

    # --- box head
    pooled = _multilevel_roi_align(ps, prop_boxes, prop_valid, 7)
    flat = pooled.reshape(pooled.shape[0], -1)
    fc = jax.nn.relu(linear(params["box_head"]["fc1"], flat))
    fc = jax.nn.relu(linear(params["box_head"]["fc2"], fc))
    cls_logits = linear(params["box_head"]["cls"], fc)       # (N, 2)
    reg = linear(params["box_head"]["reg"], fc)              # (N, 4)
    person_scores = jax.nn.softmax(cls_logits, axis=-1)[:, 0]
    person_scores = jnp.where(prop_valid, person_scores, -1.0)
    det_boxes_all = _clip_boxes(
        apply_deltas(prop_boxes, reg, cfg.bbox_reg_weights), img_hw)
    det_boxes, det_scores, det_idx = nms_topk(
        det_boxes_all, person_scores, iou_threshold=cfg.box_nms_thresh,
        topk=cfg.num_detections, score_threshold=cfg.box_score_thresh)
    det_valid = det_idx >= 0

    # --- densepose head
    if cfg.decoder_on:
        # pooler reads the decoder's single stride-4 feature
        # (roi_head.py:105-106 dp_pooler_scales = (1/stride(p2),))
        dec = _decoder_apply(params, ps, cfg)
        idx = jnp.where(det_valid, 0, -1)
        dpp = roi_align(dec, det_boxes, idx, output_size=cfg.dp_pooler,
                        spatial_scale=1.0 / 4.0, sampling_ratio=2)
    else:
        dpp = _multilevel_roi_align(ps, det_boxes, det_valid, cfg.dp_pooler)
    outs = _dp_head_apply(params, dpp, cfg)

    return {
        "boxes": det_boxes, "scores": det_scores, "valid": det_valid,
        "coarse": outs["coarse_segm"], "fine": outs["fine_segm"],
        "u": outs["u"], "v": outs["v"],
    }
