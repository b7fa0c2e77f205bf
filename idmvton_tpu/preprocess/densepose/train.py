"""Detection training for the DensePose R-CNN — the training half of the
vendored-detectron2 framework layer (SURVEY §2: the reference vendors the
full detectron2 training stack; the serving model lives in rcnn.py, the
evaluation stack in evaluate.py, this file adds losses + train step).

Reference behavior ported (losses, matching, sampling, normalization):
  - RPN losses: gradio_demo/detectron2/modeling/proposal_generator/rpn.py:366-428
    (BCE-with-logits objectness summed over sampled anchors, smooth-L1
    (beta 0 -> L1) localization on positives, both / (256 * num_images)).
  - Anchor matcher: detectron2/modeling/matcher.py — IoU thresholds
    [0.3, 0.7] -> labels {0, -1, 1} (config/defaults.py:216) with
    allow_low_quality_matches=True (rpn.py:282): every gt's best-overlap
    anchors are forced positive.
  - Sampling: detectron2/modeling/sampling.py::subsample_labels —
    256/image at positive fraction 0.5 (defaults.py:219-221); ROI heads
    512/image at 0.25, fg IoU threshold 0.5 (defaults.py:261-269).
  - Box head losses: detectron2/modeling/roi_heads/fast_rcnn.py:307-463 —
    softmax CE (mean) over sampled proposals; smooth-L1 (beta 0) box deltas
    summed over foreground / total sampled count; gt boxes are appended to
    the proposals before sampling (roi_heads.py add_ground_truth_to_proposals).
  - DensePose chart losses: gradio_demo/densepose/modeling/losses/chart.py —
    U/V smooth-L1 (torch default beta 1, reduction sum) at annotated
    foreground points x POINT_REGRESSION_WEIGHTS 0.01; fine-segm CE (mean)
    at annotated points via bilinear interpolation of the 112x112 logits
    x PART_WEIGHTS 1.0; coarse-segm CE (mean) over the full heatmap vs the
    gt mask rasterized into the proposal box x INDEX_WEIGHTS 5.0
    (densepose/config.py:175-187, losses/segm.py:67).
  - Optimizer: SGD momentum 0.9, BASE_LR 0.01 (the served config,
    configs/Base-DensePose-RCNN-FPN.yaml:43 — defaults.py has 0.001),
    weight decay 1e-4 (detectron2/config/defaults.py SOLVER block,
    build.py::build_optimizer); WEIGHT_DECAY_NORM 0.0 + FrozenBatchNorm
    buffers + BACKBONE.FREEZE_AT 2 realized via detection_trainable_mask.

TPU-first formulation: everything is static-shape. Dynamic sampled subsets
become {0,1} weight vectors chosen by masked random-priority ranking (the
same uniform sampling semantics, no gather of dynamic size); the densepose
head trains on a fixed-capacity slab of foreground proposals with a validity
mask; per-image matching/sampling is vmapped over the batch.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from idmvton_tpu.models.layers import conv2d, linear
from idmvton_tpu.ops.roi_align import roi_align
from idmvton_tpu.ops.nms import nms_topk
from idmvton_tpu.preprocess.densepose.backbone import (
    resnet50_apply, fpn_apply,
)
from idmvton_tpu.preprocess.densepose.rcnn import (
    DensePoseConfig, make_anchors, apply_deltas, _clip_boxes,
    _multilevel_roi_align, _decoder_apply, _dp_head_apply,
)


@dataclasses.dataclass(frozen=True)
class DetectionTrainConfig:
    """Training hyperparameters, values = the served config's defaults
    (gradio_demo/detectron2/config/defaults.py + densepose/config.py)."""
    rpn_batch_per_image: int = 256        # defaults.py:219
    rpn_positive_fraction: float = 0.5    # defaults.py:221
    rpn_iou_low: float = 0.3              # defaults.py:216
    rpn_iou_high: float = 0.7
    roi_batch_per_image: int = 512        # defaults.py:267
    roi_positive_fraction: float = 0.25   # defaults.py:269
    roi_iou_thresh: float = 0.5           # defaults.py:261
    w_points: float = 0.01                # densepose/config.py:187
    w_part: float = 1.0                   # densepose/config.py:185
    w_segm: float = 5.0                   # densepose/config.py:183
    # static capacity of foreground proposals routed to the densepose head
    # per image (the reference's dynamic fg subset, bounded)
    n_dp_train: int = 16
    lr: float = 0.01            # configs/Base-DensePose-RCNN-FPN.yaml:43
    momentum: float = 0.9
    weight_decay: float = 1e-4
    freeze_at: int = 2          # BACKBONE.FREEZE_AT (defaults.py): stem+res2


# ---------------------------------------------------------------------------
# box utilities
# ---------------------------------------------------------------------------


def pairwise_iou(a, b):
    """IoU matrix (Na, Nb); detectron2 structures/boxes.py::pairwise_iou."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(
        a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(
        b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)


def get_deltas(src, target, weights=(1.0, 1.0, 1.0, 1.0)):
    """Box2BoxTransform.get_deltas (detectron2/modeling/box_regression.py):
    the regression target that apply_deltas inverts."""
    wx, wy, ww, wh = weights
    sw = jnp.maximum(src[:, 2] - src[:, 0], 1e-6)
    sh = jnp.maximum(src[:, 3] - src[:, 1], 1e-6)
    scx = src[:, 0] + 0.5 * sw
    scy = src[:, 1] + 0.5 * sh
    tw = jnp.maximum(target[:, 2] - target[:, 0], 1e-6)
    th = jnp.maximum(target[:, 3] - target[:, 1], 1e-6)
    tcx = target[:, 0] + 0.5 * tw
    tcy = target[:, 1] + 0.5 * th
    return jnp.stack([
        wx * (tcx - scx) / sw, wy * (tcy - scy) / sh,
        ww * jnp.log(tw / sw), wh * jnp.log(th / sh)], axis=-1)


def smooth_l1(pred, target, beta: float):
    """fvcore smooth_l1_loss semantics (beta 0 -> pure L1)."""
    d = jnp.abs(pred - target)
    if beta <= 0:
        return d
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


# ---------------------------------------------------------------------------
# matching + sampling (static shapes)
# ---------------------------------------------------------------------------


def match_boxes(candidates, gt_boxes, gt_valid, *, low: float, high: float,
                allow_low_quality: bool):
    """detectron2 Matcher: per-candidate best gt + {1, -1, 0} labels at the
    [low, high) thresholds; allow_low_quality forces each valid gt's
    max-overlap candidates positive (matcher.py::set_low_quality_matches_).
    Returns (matched_gt_idx (N,), labels (N,) int8 with 1 fg / 0 bg / -1
    ignore). Candidates with no valid gt anywhere are all background."""
    iou = pairwise_iou(candidates, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    matched = jnp.argmax(iou, axis=1)
    best = jnp.max(iou, axis=1)
    labels = jnp.where(best >= high, 1, jnp.where(best < low, 0, -1))
    if allow_low_quality:
        per_gt_best = jnp.max(iou, axis=0)                       # (G,)
        is_best = (iou == per_gt_best[None, :]) & gt_valid[None, :] \
            & (per_gt_best[None, :] > 0)
        labels = jnp.where(jnp.any(is_best, axis=1), 1, labels)
    # no valid gt at all -> everything background (d2: gt empty => all 0)
    labels = jnp.where(jnp.any(gt_valid), labels, 0)
    return matched, labels.astype(jnp.int8)


def subsample_labels(labels, rng, *, num_samples: int,
                     positive_fraction: float):
    """detectron2 sampling.py::subsample_labels as a static-shape weight
    vector: uniformly pick min(#pos, num*frac) positives and fill the
    remainder with negatives. Returns float {0,1} weights of labels' shape."""
    n = labels.shape[0]
    r = jax.random.uniform(rng, (n,))
    pos = labels == 1
    neg = labels == 0
    n_pos = jnp.minimum(jnp.sum(pos), int(num_samples * positive_fraction))
    n_neg = jnp.minimum(jnp.sum(neg), num_samples - n_pos)

    def pick(mask, k):
        pri = jnp.where(mask, r, -1.0)
        order = jnp.argsort(-pri)
        rank = jnp.zeros(n, jnp.int32).at[order].set(jnp.arange(n))
        return mask & (rank < k)

    return (pick(pos, n_pos) | pick(neg, n_neg)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


def rpn_losses(anchors, obj_logits, deltas_pred, gt_boxes, gt_valid, rng,
               tcfg: DetectionTrainConfig):
    """rpn.py:366-428. All inputs level-concatenated for one image:
    anchors (N,4), obj_logits (N,), deltas_pred (N,4)."""
    matched, labels = match_boxes(
        anchors, gt_boxes, gt_valid, low=tcfg.rpn_iou_low,
        high=tcfg.rpn_iou_high, allow_low_quality=True)
    w = subsample_labels(labels, rng,
                         num_samples=tcfg.rpn_batch_per_image,
                         positive_fraction=tcfg.rpn_positive_fraction)
    norm = float(tcfg.rpn_batch_per_image)
    tgt = (labels == 1).astype(jnp.float32)
    # BCE-with-logits, summed over the sampled anchors (rpn.py:416-419)
    bce = jnp.maximum(obj_logits, 0) - obj_logits * tgt \
        + jnp.log1p(jnp.exp(-jnp.abs(obj_logits)))
    loss_cls = jnp.sum(bce * w) / norm
    gt_deltas = get_deltas(anchors, gt_boxes[matched])
    pos_w = w * tgt
    loss_loc = jnp.sum(
        smooth_l1(deltas_pred, gt_deltas, 0.0) * pos_w[:, None]) / norm
    return {"loss_rpn_cls": loss_cls, "loss_rpn_loc": loss_loc}


def box_head_losses(cls_logits, reg_pred, prop_boxes, matched_gt_boxes,
                    fg_mask, sample_w, cfg: DensePoseConfig):
    """fast_rcnn.py:307-463 for the single-class (person) head: CE mean over
    sampled proposals (bg class index 1), L1 deltas summed over sampled
    foreground / total sampled count."""
    n_sampled = jnp.maximum(jnp.sum(sample_w), 1.0)
    gt_cls = jnp.where(fg_mask, 0, 1)
    logp = jax.nn.log_softmax(cls_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, gt_cls[:, None], axis=1)[:, 0]
    loss_cls = jnp.sum(ce * sample_w) / n_sampled
    gt_deltas = get_deltas(prop_boxes, matched_gt_boxes, cfg.bbox_reg_weights)
    fg_w = sample_w * fg_mask.astype(jnp.float32)
    loss_reg = jnp.sum(smooth_l1(reg_pred, gt_deltas, 0.0)
                       * fg_w[:, None]) / n_sampled
    return {"loss_cls": loss_cls, "loss_box_reg": loss_reg}


def _points_to_heatmap_coords(px, py, boxes, heatmap_size: int):
    """Map absolute image-space annotation points into the per-proposal
    heatmap grid (losses/utils.py::BilinearInterpolationHelper.from_matches:
    x_norm = (x - x1) * (S / w), valid iff inside [0, S-1])."""
    x1, y1 = boxes[:, 0:1], boxes[:, 1:2]
    w = jnp.maximum(boxes[:, 2:3] - boxes[:, 0:1], 1e-6)
    h = jnp.maximum(boxes[:, 3:4] - boxes[:, 1:2], 1e-6)
    hx = (px - x1) * (heatmap_size / w)
    hy = (py - y1) * (heatmap_size / h)
    inside = (hx >= 0) & (hx <= heatmap_size - 1) \
        & (hy >= 0) & (hy <= heatmap_size - 1)
    return hx, hy, inside


def _bilinear_at_points(maps, hx, hy):
    """Bilinearly sample maps (K, S, S, C) at per-proposal points
    (K, P) -> (K, P, C)."""
    s = maps.shape[1]
    x0 = jnp.clip(jnp.floor(hx), 0, s - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(hy), 0, s - 2).astype(jnp.int32)
    fx = jnp.clip(hx - x0, 0.0, 1.0)[..., None]
    fy = jnp.clip(hy - y0, 0.0, 1.0)[..., None]

    def gather(yy, xx):
        return jnp.take_along_axis(
            maps.reshape(maps.shape[0], s * s, -1),
            (yy * s + xx)[..., None], axis=1)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    return (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
            + v10 * fy * (1 - fx) + v11 * fy * fx)


def _mask_in_box(gt_mask, gt_box, prop_boxes, heatmap_size: int):
    """Rasterize the gt instance mask (M, M grid over gt_box) into each
    proposal box at heatmap resolution (losses/segm.py::resample_data
    semantics via bilinear sampling + 0.5 threshold)."""
    m = gt_mask.shape[-1]
    k = prop_boxes.shape[0]
    gs = jnp.linspace(0.5 / heatmap_size, 1 - 0.5 / heatmap_size,
                      heatmap_size)
    px = prop_boxes[:, 0:1] + gs[None, :] * (
        prop_boxes[:, 2:3] - prop_boxes[:, 0:1])       # (K, S)
    py = prop_boxes[:, 1:2] + gs[None, :] * (
        prop_boxes[:, 3:4] - prop_boxes[:, 1:2])
    gw = jnp.maximum(gt_box[2] - gt_box[0], 1e-6)
    gh = jnp.maximum(gt_box[3] - gt_box[1], 1e-6)
    mx = (px - gt_box[0]) / gw * m - 0.5               # (K, S) mask coords
    my = (py - gt_box[1]) / gh * m - 0.5
    x0 = jnp.clip(jnp.floor(mx), 0, m - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(my), 0, m - 2).astype(jnp.int32)
    fx = jnp.clip(mx - x0, 0.0, 1.0)
    fy = jnp.clip(my - y0, 0.0, 1.0)
    flat = gt_mask.reshape(-1)

    def at(yy, xx):  # (K, Sy) x (K, Sx) -> (K, Sy, Sx)
        return flat[(yy[:, :, None] * m + xx[:, None, :]).reshape(k, -1)] \
            .reshape(k, heatmap_size, heatmap_size)

    v = (at(y0, x0) * (1 - fy)[:, :, None] * (1 - fx)[:, None, :]
         + at(y0, x0 + 1) * (1 - fy)[:, :, None] * fx[:, None, :]
         + at(y0 + 1, x0) * fy[:, :, None] * (1 - fx)[:, None, :]
         + at(y0 + 1, x0 + 1) * fy[:, :, None] * fx[:, None, :])
    inside = ((mx >= -0.5) & (mx <= m - 0.5))[:, None, :] \
        & ((my >= -0.5) & (my <= m - 0.5))[:, :, None]
    return jnp.where(inside, v, 0.0) > 0.5


def densepose_chart_losses(outs, dp_boxes, dp_valid, gt, matched_gt,
                           tcfg: DetectionTrainConfig,
                           cfg: DensePoseConfig):
    """chart.py losses over the fixed-capacity dp training slab.

    outs: dict from _dp_head_apply — coarse (K,S,S,2), fine/u/v (K,S,S,25).
    dp_boxes (K,4) proposal boxes, dp_valid (K,) bool, matched_gt (K,) int
    index into the image's gt instances. gt carries per-instance packed point
    annotations dp_x/dp_y (abs px), dp_i (fine labels 0..24), dp_u/dp_v,
    dp_pt_valid, and dp_mask (G, M, M)."""
    s = cfg.heatmap_size
    px = gt["dp_x"][matched_gt]            # (K, P)
    py = gt["dp_y"][matched_gt]
    gt_i = gt["dp_i"][matched_gt]
    gt_u = gt["dp_u"][matched_gt]
    gt_v = gt["dp_v"][matched_gt]
    pt_valid = gt["dp_pt_valid"][matched_gt] & dp_valid[:, None]

    hx, hy, inside = _points_to_heatmap_coords(px, py, dp_boxes, s)
    j_valid = pt_valid & inside
    j_valid_fg = j_valid & (gt_i > 0)
    fg_w = j_valid_fg.astype(jnp.float32)

    u_est = jnp.take_along_axis(_bilinear_at_points(outs["u"], hx, hy),
                                gt_i[..., None], axis=-1)[..., 0]
    v_est = jnp.take_along_axis(_bilinear_at_points(outs["v"], hx, hy),
                                gt_i[..., None], axis=-1)[..., 0]
    loss_u = jnp.sum(smooth_l1(u_est, gt_u, 1.0) * fg_w) * tcfg.w_points
    loss_v = jnp.sum(smooth_l1(v_est, gt_v, 1.0) * fg_w) * tcfg.w_points

    fine_est = _bilinear_at_points(outs["fine_segm"], hx, hy)  # (K,P,25)
    logp = jax.nn.log_softmax(fine_est, axis=-1)
    ce_i = -jnp.take_along_axis(logp, gt_i[..., None], axis=-1)[..., 0]
    n_pts = jnp.maximum(jnp.sum(j_valid), 1)
    loss_i = jnp.sum(ce_i * j_valid) / n_pts * tcfg.w_part

    masks = jax.vmap(
        lambda box, mask, pbox: _mask_in_box(mask, box, pbox[None], s)[0]
    )(gt["boxes"][matched_gt], gt["dp_mask"][matched_gt], dp_boxes)
    seg_logp = jax.nn.log_softmax(outs["coarse_segm"], axis=-1)
    seg_tgt = masks.astype(jnp.int32)
    ce_s = -jnp.take_along_axis(seg_logp, seg_tgt[..., None], axis=-1)[..., 0]
    n_px = jnp.maximum(jnp.sum(dp_valid) * s * s, 1)
    loss_s = jnp.sum(ce_s * dp_valid[:, None, None]) / n_px * tcfg.w_segm
    # _dp_pts/_dp_px let the batched reducer (detection_total_loss) rebuild
    # the reference's batch-GLOBAL point/pixel means and point-sum U/V from
    # these per-image values (chart.py:239-240 reduction="sum"; the CE means
    # run over the batch-concatenated point/pixel sets, not per image)
    return {"loss_densepose_U": loss_u, "loss_densepose_V": loss_v,
            "loss_densepose_I": loss_i, "loss_densepose_S": loss_s,
            "_dp_pts": jnp.sum(j_valid).astype(jnp.float32),
            "_dp_px": (jnp.sum(dp_valid) * s * s).astype(jnp.float32)}


# ---------------------------------------------------------------------------
# training forward (one image; vmap over the batch in the train step)
# ---------------------------------------------------------------------------


def _select_topk_mask(mask, priority, k: int):
    """Indices of the k highest-priority entries where mask holds (padded
    with index 0 + invalid flag)."""
    pri = jnp.where(mask, priority, -jnp.inf)
    top, idx = jax.lax.top_k(pri, k)
    valid = jnp.isfinite(top)
    return jnp.where(valid, idx, 0), valid


def detection_loss_fn(params, image, gt, rng,
                      cfg: DensePoseConfig = DensePoseConfig(),
                      tcfg: DetectionTrainConfig = DetectionTrainConfig()):
    """All detectron2 training losses for one image.

    image: (1, H, W, 3) preprocessed; gt: dict with boxes (G,4), valid (G,),
    dp_x/dp_y/dp_i/dp_u/dp_v/dp_pt_valid (G,P), dp_mask (G,M,M) bool.
    Mirrors GeneralizedRCNN.forward training branch
    (detectron2/modeling/meta_arch/rcnn.py:123-169)."""
    img_hw = image.shape[1:3]
    rng_rpn, rng_roi, rng_dp = jax.random.split(rng, 3)
    feats = resnet50_apply(params["backbone"], image)
    ps = fpn_apply(params["fpn"], feats)

    # --- RPN raw outputs on all levels (rpn.py RPNHead.forward)
    anchors_l, obj_l, del_l = [], [], []
    for lvl, p in enumerate(ps):
        h = jax.nn.relu(conv2d(params["rpn"]["conv"], p,
                               padding=((1, 1), (1, 1))))
        obj = conv2d(params["rpn"]["objectness"], h)[0]
        dl = conv2d(params["rpn"]["deltas"], h)[0]
        fh, fw, a = obj.shape
        anchors_l.append(jnp.asarray(make_anchors(
            (fh, fw), 4 * 2 ** lvl, cfg.anchor_sizes[lvl],
            cfg.aspect_ratios)))
        obj_l.append(obj.reshape(-1))
        del_l.append(dl.reshape(fh * fw, a, 4).reshape(-1, 4))
    anchors = jnp.concatenate(anchors_l)
    obj_all = jnp.concatenate(obj_l)
    del_all = jnp.concatenate(del_l)
    losses = rpn_losses(anchors, obj_all, del_all, gt["boxes"], gt["valid"],
                        rng_rpn, tcfg)

    # --- proposals (detached, rpn.py predict_proposals "no grad to boxes"),
    # gt boxes appended (roi_heads.py::add_ground_truth_to_proposals)
    prop_all = jax.lax.stop_gradient(
        _clip_boxes(apply_deltas(anchors, del_all, (1.0, 1.0, 1.0, 1.0)),
                    img_hw))
    k_prop = min(cfg.rpn_post_nms_topk, prop_all.shape[0])
    pb, _, pidx = nms_topk(prop_all, jax.lax.stop_gradient(obj_all),
                           iou_threshold=cfg.rpn_nms_thresh, topk=k_prop)
    prop_boxes = jnp.concatenate([pb, gt["boxes"]])
    prop_present = jnp.concatenate([pidx >= 0, gt["valid"]])

    matched, labels = match_boxes(
        prop_boxes, gt["boxes"], gt["valid"], low=tcfg.roi_iou_thresh,
        high=tcfg.roi_iou_thresh, allow_low_quality=False)
    labels = jnp.where(prop_present, labels, -1)  # padded rows never sampled
    sample_w = subsample_labels(
        labels, rng_roi, num_samples=tcfg.roi_batch_per_image,
        positive_fraction=tcfg.roi_positive_fraction)
    fg_mask = labels == 1

    # --- box head on all (static-capacity) proposals, losses masked
    pooled = _multilevel_roi_align(ps, prop_boxes, sample_w > 0, 7)
    flat = pooled.reshape(pooled.shape[0], -1)
    fc = jax.nn.relu(linear(params["box_head"]["fc1"], flat))
    fc = jax.nn.relu(linear(params["box_head"]["fc2"], fc))
    cls_logits = linear(params["box_head"]["cls"], fc)
    reg = linear(params["box_head"]["reg"], fc)
    losses.update(box_head_losses(
        cls_logits, reg, prop_boxes, gt["boxes"][matched], fg_mask,
        sample_w, cfg))

    # --- densepose head on a fixed-size slab of sampled foreground
    # proposals (roi_head.py::DensePoseROIHeads.forward selects fg)
    dp_idx, dp_valid = _select_topk_mask(
        fg_mask & (sample_w > 0),
        jax.random.uniform(rng_dp, fg_mask.shape), tcfg.n_dp_train)
    dp_boxes = prop_boxes[dp_idx]
    if cfg.decoder_on:
        dec = _decoder_apply(params, ps, cfg)
        dpp = roi_align(dec, dp_boxes, jnp.where(dp_valid, 0, -1),
                        output_size=cfg.dp_pooler, spatial_scale=0.25,
                        sampling_ratio=2)
    else:
        dpp = _multilevel_roi_align(ps, dp_boxes, dp_valid, cfg.dp_pooler)
    outs = _dp_head_apply(params, dpp, cfg)
    losses.update(densepose_chart_losses(
        outs, dp_boxes, dp_valid, gt, matched[dp_idx], tcfg, cfg))
    return losses


def detection_total_loss(params, images, gts, rng,
                         cfg: DensePoseConfig = DensePoseConfig(),
                         tcfg: DetectionTrainConfig = DetectionTrainConfig()):
    """Batch reduction with the reference's normalizers: images (B, H, W, 3),
    gts a dict of stacked per-image gt arrays (leading dim B).

    RPN/box losses are per-image normalized (rpn.py:416-428 divides by
    256 * num_images; fast_rcnn samples exactly 512/image so the batch mean
    equals the per-image mean). DensePose losses are NOT per-image
    normalized in the reference (densepose/modeling/losses/chart.py:239-240):
    U/V are reduction="sum" over ALL batch points x 0.01, and loss_I/loss_S
    are CE means over the batch-concatenated point/pixel sets — so U/V sum
    across images and I/S renormalize by the batch-total counts here."""
    b = images.shape[0]
    rngs = jax.random.split(rng, b)
    per_img = jax.vmap(
        lambda im, g, r: detection_loss_fn(params, im[None], g, r, cfg, tcfg)
    )(images, gts, rngs)
    n_pts = per_img.pop("_dp_pts")
    n_px = per_img.pop("_dp_px")
    losses = {k: jnp.mean(v) for k, v in per_img.items()}
    losses["loss_densepose_U"] = jnp.sum(per_img["loss_densepose_U"])
    losses["loss_densepose_V"] = jnp.sum(per_img["loss_densepose_V"])
    # per-image means carry their own counts -> recover sums, renormalize
    losses["loss_densepose_I"] = (
        jnp.sum(per_img["loss_densepose_I"] * n_pts)
        / jnp.maximum(jnp.sum(n_pts), 1.0))
    losses["loss_densepose_S"] = (
        jnp.sum(per_img["loss_densepose_S"] * n_px)
        / jnp.maximum(jnp.sum(n_px), 1.0))
    total = sum(losses.values())
    return total, losses


def detection_trainable_mask(params,
                             tcfg: DetectionTrainConfig =
                             DetectionTrainConfig()):
    """True for leaves the reference trains. Non-trainable:
    - backbone stages up to BACKBONE.FREEZE_AT=2, i.e. stem + res2
      (detectron2/modeling/backbone/resnet.py freeze());
    - every FrozenBatchNorm scale/bias (non-trainable buffers in
      detectron2/layers/batch_norm.py::FrozenBatchNorm2d) — which also
      realizes SOLVER.WEIGHT_DECAY_NORM=0.0, since the backbone frozen BNs
      are the model's only norm layers."""
    # detectron2 resnet.py freeze(): FREEZE_AT=0 freezes nothing, >=1 the
    # stem, >=2 additionally res2..res{freeze_at}
    frozen_stages = ({"stem"} if tcfg.freeze_at >= 1 else set()) \
        | {f"res{i}" for i in range(2, tcfg.freeze_at + 1)}

    def walk(tree, in_backbone, in_frozen_stage, in_bn):
        if isinstance(tree, dict):
            return {k: walk(v, in_backbone or k == "backbone",
                            in_frozen_stage or (in_backbone
                                                and k in frozen_stages),
                            in_bn or (in_backbone and k == "bn"))
                    for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            walked = [walk(v, in_backbone, in_frozen_stage, in_bn)
                      for v in tree]
            return type(tree)(walked)
        return not (in_frozen_stage or in_bn)

    return walk(params, False, False, False)


def make_detection_optimizer(tcfg: DetectionTrainConfig =
                             DetectionTrainConfig(), params=None):
    """SGD + momentum + weight decay (detectron2 solver/build.py with the
    served config: BASE_LR 0.01 configs/Base-DensePose-RCNN-FPN.yaml:43).
    When `params` is given, frozen leaves (detection_trainable_mask) get
    zero updates and no weight decay — matching FREEZE_AT=2 +
    FrozenBatchNorm buffers + WEIGHT_DECAY_NORM=0.0. Without `params` the
    pre-r4 behavior (train + decay everything) is kept for generic use."""
    import optax
    inner = optax.chain(
        optax.add_decayed_weights(tcfg.weight_decay),
        optax.sgd(tcfg.lr, momentum=tcfg.momentum),
    )
    if params is None:
        return inner
    mask = detection_trainable_mask(params, tcfg)
    inv_mask = jax.tree_util.tree_map(lambda m: not m, mask)
    return optax.chain(
        optax.masked(optax.set_to_zero(), inv_mask),
        optax.masked(inner, mask),
    )


def make_detection_train_step(cfg: DensePoseConfig = DensePoseConfig(),
                              tcfg: DetectionTrainConfig =
                              DetectionTrainConfig(), tx=None):
    """Returns step(params, opt_state, images, gts, rng) ->
    (params, opt_state, metrics). jit at the call site."""
    if tx is None:
        tx = make_detection_optimizer(tcfg)

    def step(params, opt_state, images, gts, rng):
        (total, losses), grads = jax.value_and_grad(
            detection_total_loss, has_aux=True)(params, images, gts, rng,
                                                cfg, tcfg)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        metrics = dict(losses, total_loss=total)
        return params, opt_state, metrics

    return step
