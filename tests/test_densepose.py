"""DensePose R-CNN structural tests (random weights, small images)."""

import numpy as np
import jax
import jax.numpy as jnp

from idmvton_tpu.preprocess.densepose.rcnn import (
    DensePoseConfig, init_densepose_rcnn, densepose_rcnn_apply,
    make_anchors, apply_deltas,
)
from idmvton_tpu.preprocess.densepose.visualize import (
    extract_iuv, paint_segmentation, DensePose,
)

CFG = DensePoseConfig(rpn_pre_nms_topk=50, rpn_post_nms_topk=20,
                      num_detections=4)


def test_anchors():
    a = make_anchors((2, 3), 4, 32, (0.5, 1.0, 2.0))
    assert a.shape == (2 * 3 * 3, 4)
    # anchor areas ~= size^2 regardless of aspect ratio
    areas = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    np.testing.assert_allclose(areas, 32 * 32, rtol=1e-4)
    # grid offset: second x-position shifted by stride
    np.testing.assert_allclose(a[3][0] - a[0][0], 4.0, atol=1e-5)


def test_apply_deltas_identity():
    anchors = jnp.asarray([[0., 0., 10., 20.]])
    out = apply_deltas(anchors, jnp.zeros((1, 4)), (1., 1., 1., 1.))
    np.testing.assert_allclose(np.asarray(out), np.asarray(anchors), atol=1e-5)
    # dx shifts by width fraction
    out = apply_deltas(anchors, jnp.asarray([[0.1, 0., 0., 0.]]),
                       (1., 1., 1., 1.))
    np.testing.assert_allclose(np.asarray(out[0, 0]), 1.0, atol=1e-5)


def test_rcnn_end_to_end_shapes():
    params = init_densepose_rcnn(jax.random.PRNGKey(0), CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 96, 3))
    out = densepose_rcnn_apply(params, x, CFG)
    k, s = CFG.num_detections, CFG.heatmap_size
    assert out["boxes"].shape == (k, 4)
    assert out["scores"].shape == (k,)
    assert out["coarse"].shape == (k, s, s, 2)
    assert out["fine"].shape == (k, s, s, 25)
    assert out["u"].shape == (k, s, s, 25)
    # boxes inside the image
    b = np.asarray(out["boxes"])
    assert (b[:, 0] >= 0).all() and (b[:, 2] <= 96).all()


def test_extract_iuv():
    k, s = 2, 8
    coarse = np.zeros((k, s, s, 2), np.float32)
    coarse[0, :, :, 1] = 1.0          # det 0 all foreground
    coarse[1, :, :, 0] = 1.0          # det 1 all background
    fine = np.zeros((k, s, s, 25), np.float32)
    fine[0, :, :, 7] = 5.0
    u = np.random.RandomState(0).rand(k, s, s, 25).astype(np.float32)
    labels, uv = extract_iuv(jnp.asarray(coarse), jnp.asarray(fine),
                             jnp.asarray(u), jnp.asarray(u))
    assert (np.asarray(labels[0]) == 7).all()
    assert (np.asarray(labels[1]) == 0).all()
    np.testing.assert_allclose(np.asarray(uv[0, :, :, 0]), u[0, :, :, 7],
                               atol=1e-6)


def test_paint_segmentation():
    """dp_segm reference semantics (FineSegmentationVisualizer defaults,
    densepose_results.py:319-330 + vis/base.py:35-39): inplace=False ZEROES
    the canvas — colormapped parts on a BLACK background, alpha 1."""
    img = np.random.RandomState(0).randint(0, 255, (64, 48, 3), np.uint8)
    boxes = np.asarray([[8, 8, 40, 56]], np.float32)
    labels = np.full((1, 112, 112), 12, np.uint8)
    out = paint_segmentation(img, boxes, labels, np.asarray([True]))
    assert out.shape == img.shape
    import cv2
    # inside the box: exactly the PARULA color of label 12 (alpha = 1)
    expect = cv2.applyColorMap(
        np.asarray([[int(12 * 255.0 / 24)]], np.uint8),
        cv2.COLORMAP_PARULA)[0, 0, ::-1]
    np.testing.assert_array_equal(out[20, 20], expect)
    # outside the box: BLACK (the reference's in-place zeroing quirk)
    np.testing.assert_array_equal(out[2, 2], [0, 0, 0])


def test_served_capacity_defaults():
    """The static caps default to the SERVED config: 1000 post-NMS proposals
    (Base-DensePose-RCNN-FPN.yaml:16-21) and 100 detections/image
    (detectron2/config/defaults.py:612)."""
    cfg = DensePoseConfig()
    assert cfg.rpn_post_nms_topk == 1000
    assert cfg.num_detections == 100
    assert cfg.num_detections % cfg.dp_chunk == 0


def test_crowded_scene_capacity_and_painting():
    """More than the old 8-detection cap must flow through the head and all
    of them must be painted (apply_net.py:270-285 composites every result)."""
    cfg = DensePoseConfig(rpn_pre_nms_topk=80, rpn_post_nms_topk=64,
                          num_detections=16, dp_chunk=4,
                          box_score_thresh=0.0, box_nms_thresh=0.9)
    params = init_densepose_rcnn(jax.random.PRNGKey(2), cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 96, 3))
    out = densepose_rcnn_apply(params, x, cfg)
    n_valid = int(np.asarray(out["valid"]).sum())
    assert n_valid > 8, n_valid
    assert out["coarse"].shape[0] == 16

    # the painter consumes the full static-capacity output; reference
    # semantics (vis/base.py:35-39): each detection's visualize() re-zeroes
    # the canvas, so the LAST valid nonempty detection's box is painted on
    # black — verify that box is colored and the far background is black
    img = np.random.RandomState(1).randint(0, 255, (64, 96, 3), np.uint8)
    labels = np.full((16, 112, 112), 5, np.uint8)
    boxes = np.asarray(out["boxes"])
    valid = np.asarray(out["valid"])
    painted = paint_segmentation(img, boxes, labels, valid)
    assert painted.shape == img.shape
    # replicate the painter's own box math (every valid detection re-zeroes
    # the canvas; only the LAST one's paint survives, truncated-int coords)
    from idmvton_tpu.preprocess.densepose.visualize import (
        _xyxy_to_xywh_clipped,
    )
    last = None
    for k in range(16):
        if not valid[k]:
            continue
        x, y, w, h = [int(v) for v in _xyxy_to_xywh_clipped(boxes[k], 64, 96)]
        last = (x, y, w, h)
    assert last is not None
    x, y, w, h = last
    if w > 0 and h > 0:
        assert np.any(painted[y:y + h, x:x + w] != 0)
        outside = np.ones((64, 96), bool)
        outside[y:y + h, x:x + w] = False
        assert np.all(painted[outside] == 0)
    else:
        # degenerate final box: the zeroing still ran -> all black
        assert np.all(painted == 0)


def test_dp_head_chunking_equivalence():
    """lax.map chunking is bit-identical to the unchunked head."""
    from idmvton_tpu.preprocess.densepose.rcnn import _dp_head_apply
    cfg_chunked = DensePoseConfig(num_detections=8, dp_chunk=2)
    cfg_full = DensePoseConfig(num_detections=8, dp_chunk=8)
    params = init_densepose_rcnn(jax.random.PRNGKey(4), cfg_chunked)
    dpp = jax.random.normal(jax.random.PRNGKey(5),
                            (8, cfg_chunked.dp_pooler, cfg_chunked.dp_pooler,
                             cfg_chunked.decoder_dim))
    a = _dp_head_apply(params, dpp, cfg_chunked)
    b = _dp_head_apply(params, dpp, cfg_full)
    for name in a:
        np.testing.assert_array_equal(np.asarray(a[name]), np.asarray(b[name]))


def test_eval_harness_perfect_and_degraded():
    """inference_on_dataset + DetectionEvaluator (the reference's
    inference-accuracy-test idiom, dev/run_inference_tests.sh): perfect
    predictions score AP 1.0; dropping a GT's detection and adding a false
    positive scores strictly lower."""
    from idmvton_tpu.preprocess.densepose.evaluate import (
        DetectionEvaluator, inference_on_dataset,
    )
    rng = np.random.RandomState(0)
    gts = {i: np.abs(rng.rand(3, 2)) * 30 for i in range(4)}
    data = []
    for i in range(4):
        xy = rng.rand(3, 2) * 60
        boxes = np.concatenate([xy, xy + 10 + gts[i]], axis=1)
        data.append((i, np.zeros((80, 80, 3), np.uint8), boxes))

    def perfect(img, _it=iter(list(data))):
        _, _, gt = next(_it)
        k = np.zeros((8, 4), np.float32)
        k[:len(gt)] = gt
        valid = np.arange(8) < len(gt)
        return k, np.linspace(0.9, 0.5, 8), valid

    res = inference_on_dataset(perfect, data)
    assert res["n_images"] == 4
    assert res["stats"][0] == 1.0

    def degraded(img, _it=iter(list(data))):
        _, _, gt = next(_it)
        k = np.zeros((8, 4), np.float32)
        k[:len(gt) - 1] = gt[:-1]           # miss one GT
        k[len(gt) - 1] = [70, 70, 79, 79]   # false positive
        valid = np.arange(8) < len(gt)
        return k, np.linspace(0.9, 0.5, 8), valid

    res2 = inference_on_dataset(degraded, data, DetectionEvaluator())
    assert 0.0 < res2["stats"][0] < res["stats"][0]


def test_eval_harness_drives_densepose_detect():
    """End-to-end glue: DensePose.detect plugs into the harness (random
    weights -> near-zero AP, but shapes/coords/valid masking flow)."""
    from idmvton_tpu.preprocess.densepose.evaluate import inference_on_dataset
    cfg = DensePoseConfig(rpn_pre_nms_topk=50, rpn_post_nms_topk=20,
                          num_detections=4)
    dp = DensePose(cfg=cfg, short_edge=64, max_size=96)
    img = np.random.RandomState(1).randint(0, 255, (96, 72, 3), np.uint8)
    gt = np.array([[10.0, 10.0, 40.0, 60.0]], np.float32)
    res = inference_on_dataset(dp.detect, [(0, img, gt)])
    assert res["n_images"] == 1
    assert 0.0 <= res["stats"][0] <= 1.0


def test_empty_instances_paints_background_only():
    """Reference idiom: e2e on random inputs incl. the EMPTY-instances edge
    case (projects/DensePose/tests/test_model_e2e.py:19-43
    make_empty_instances). Static-shape analog: score threshold above any
    possible sigmoid score -> zero valid detections -> the painter must
    return the plain gray conversion untouched, no box ever colored."""
    import cv2
    cfg = DensePoseConfig(rpn_pre_nms_topk=50, rpn_post_nms_topk=20,
                          num_detections=4, box_score_thresh=1.1)
    dp = DensePose(cfg=cfg, short_edge=64, max_size=96)
    img = np.random.RandomState(3).randint(0, 255, (96, 72, 3), np.uint8)
    out = dp(img)
    gray = cv2.cvtColor(cv2.cvtColor(img, cv2.COLOR_RGB2GRAY),
                        cv2.COLOR_GRAY2BGR)[:, :, ::-1]
    np.testing.assert_array_equal(out, gray)


def test_wrapper_contract():
    dp = DensePose(cfg=CFG, short_edge=64, max_size=96)
    img = np.random.RandomState(0).randint(0, 255, (96, 72, 3), np.uint8)
    out = dp(img)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_matrix_visualizer_matches_executed_reference():
    """Oracle parity: our MatrixVisualizer port vs the EXECUTED reference
    class (gradio_demo/densepose/vis/base.py) on both inplace modes,
    including the inplace=False in-place-zeroing quirk and the
    ignored-interp cv2.resize positional call."""
    import importlib.util
    import os
    ref_path = "/root/reference/gradio_demo/densepose/vis/base.py"
    if not os.path.exists(ref_path):
        import pytest
        pytest.skip("reference tree not available")
    spec = importlib.util.spec_from_file_location("ref_vis_base", ref_path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from idmvton_tpu.preprocess.densepose.visualize import MatrixVisualizer

    rs = np.random.RandomState(5)
    for inplace, alpha, val_scale in ((False, 1.0, 255.0 / 24),
                                      (True, 0.7, 1.0)):
        img_ours = rs.randint(0, 255, (40, 30, 3)).astype(np.uint8)
        img_ref = img_ours.copy()
        mask = (rs.rand(12, 12) > 0.4).astype(np.uint8)
        matrix = rs.randint(0, 25, (12, 12)).astype(np.uint8)
        bbox = [3.0, 5.0, 20.0, 25.0]
        ours = MatrixVisualizer(inplace=inplace, alpha=alpha,
                                val_scale=val_scale).visualize(
            img_ours, mask.copy(), matrix.copy(), list(bbox))
        want = ref.MatrixVisualizer(inplace=inplace, alpha=alpha,
                                    val_scale=val_scale).visualize(
            img_ref, mask.copy(), matrix.copy(), list(bbox))
        np.testing.assert_array_equal(ours, want)
        # the quirk itself: inplace=False zeroed the CALLER's array too
        np.testing.assert_array_equal(img_ours, img_ref)


def test_painter_breadth_dp_u_v_contour_bbox():
    """apply_net visualizer registry breadth (apply_net.py:203-211):
    dp_u / dp_v / dp_contour / bbox all paint, with their reference
    blend modes."""
    from idmvton_tpu.preprocess.densepose.visualize import (
        paint_u, paint_v, paint_contour, paint_bbox, VISUALIZERS,
        dump_results,
    )
    import cv2
    rs = np.random.RandomState(7)
    img = rs.randint(0, 255, (64, 48, 3)).astype(np.uint8)
    boxes = np.asarray([[8, 8, 40, 56]], np.float32)
    labels = np.full((1, 24, 24), 3, np.uint8)
    uv = np.dstack([np.tile(np.linspace(0, 1, 24), (24, 1)),
                    np.tile(np.linspace(0, 1, 24)[:, None], (1, 24))])[None]
    valid = np.asarray([True])
    scores = np.asarray([0.97])
    gray = cv2.cvtColor(cv2.cvtColor(img, cv2.COLOR_RGB2GRAY),
                        cv2.COLOR_GRAY2RGB)

    for painter in (lambda: paint_u(img, boxes, labels, uv, valid),
                    lambda: paint_v(img, boxes, labels, uv, valid),
                    lambda: paint_contour(img, boxes, labels, uv, valid)):
        out = painter()
        assert out.shape == img.shape
        # alpha-blend onto GRAY (inplace=True painters): background kept
        np.testing.assert_array_equal(out[2, 2], gray[2, 2])
        assert np.any(out[8:56, 8:40] != gray[8:56, 8:40])
    # dp_u and dp_v differ (different coordinate painted)
    assert np.any(paint_u(img, boxes, labels, uv, valid)
                  != paint_v(img, boxes, labels, uv, valid))

    out = paint_bbox(img, boxes, scores, valid)
    assert np.any(out != gray)  # rectangle + text drawn

    # registry covers the reference's served specs
    assert {"dp_segm", "dp_u", "dp_v", "dp_contour", "bbox"} <= set(VISUALIZERS)

    # Dump-equivalent structured output keeps only valid rows
    rec = dump_results("x.jpg", np.zeros((3, 4)), np.asarray([0.9, 0.8, 0.7]),
                       np.asarray([True, False, True]),
                       np.zeros((3, 8, 8)), np.zeros((3, 8, 8, 2)))
    assert rec["file_name"] == "x.jpg"
    assert rec["scores"].shape == (2,)
    assert rec["pred_boxes_XYXY"].shape == (2, 4)
    assert rec["pred_densepose"][0].shape == (2, 8, 8)
    assert rec["pred_densepose"][1].dtype == np.float32


def test_densepose_show_and_dump_actions():
    """DensePose.show (arbitrary visualizer specs) + DensePose.dump
    (structured record) — the apply_net Show/Dump action surface on the
    same R-CNN outputs."""
    cfg = CFG
    dp = DensePose(init_densepose_rcnn(jax.random.PRNGKey(0), cfg), cfg,
                   short_edge=64, max_size=96)
    img = np.random.RandomState(2).randint(0, 255, (64, 48, 3), np.uint8)
    outs = dp.show(img, ("dp_segm", "dp_u", "dp_v", "dp_contour", "bbox"))
    assert set(outs) == {"dp_segm", "dp_u", "dp_v", "dp_contour", "bbox"}
    for spec, painted in outs.items():
        assert painted.shape == img.shape, spec
        assert painted.dtype == np.uint8, spec
    rec = dp.dump(img, "person.jpg")
    assert rec["file_name"] == "person.jpg"
    n = rec["scores"].shape[0]
    assert rec["pred_boxes_XYXY"].shape == (n, 4)
    assert rec["pred_densepose"][0].shape[0] == n
