"""Agnostic-mask compositor behavior tests on synthetic parse maps."""

import numpy as np
from PIL import Image

from idmvton_tpu.preprocess.agnostic_mask import get_mask_location, LABELS


def synthetic_parse(width=384, height=512):
    """A simple standing figure: head, neck, upper clothes, arms, pants, shoes."""
    p = np.zeros((height, width), np.uint8)
    p[40:110, 160:230] = LABELS["head"]
    p[110:130, 175:215] = LABELS["neck"]
    p[130:300, 130:260] = LABELS["upper_clothes"]
    p[130:290, 95:130] = LABELS["right_arm"]    # image-left arm
    p[130:290, 260:295] = LABELS["left_arm"]
    p[300:470, 140:250] = LABELS["pants"]
    p[470:500, 135:185] = LABELS["right_shoe"]
    p[470:500, 205:255] = LABELS["left_shoe"]
    return p


def keypoints():
    kp = np.zeros((18, 2), np.float32)
    kp[2] = [130, 140]   # right shoulder
    kp[3] = [112, 210]   # right elbow
    kp[4] = [112, 280]   # right wrist
    kp[5] = [260, 140]   # left shoulder
    kp[6] = [277, 210]
    kp[7] = [277, 280]
    return {"pose_keypoints_2d": kp.reshape(-1).tolist()}


def test_upper_body_mask():
    parse = synthetic_parse()
    mask, gray = get_mask_location("hd", "upper_body", parse, keypoints())
    m = np.asarray(mask) > 0
    assert m.shape == (512, 384)
    # garment region is masked
    assert m[200, 195]
    # head is never masked
    assert not m[70, 195]
    # shoes are never masked
    assert not m[485, 160]
    # binary output + a single connected component
    import cv2
    n, _ = cv2.connectedComponents(m.astype(np.uint8))
    assert n == 2  # background + one component
    g = np.asarray(gray)
    assert set(np.unique(g)) <= {0, 127}


def test_lower_body_mask():
    parse = synthetic_parse()
    mask, _ = get_mask_location("hd", "lower_body", parse, keypoints())
    m = np.asarray(mask) > 0
    # pants masked, upper clothes kept
    assert m[380, 195]
    assert not m[200, 100]  # arm pixels kept for lower_body


def test_missing_wrist_falls_back_to_parsed_arm():
    parse = synthetic_parse()
    kp = keypoints()
    arr = np.asarray(kp["pose_keypoints_2d"], np.float32).reshape(-1, 2)
    arr[4] = [0, 0]  # right wrist undetected
    kp = {"pose_keypoints_2d": arr.reshape(-1).tolist()}
    mask, _ = get_mask_location("hd", "upper_body", parse, kp)
    assert np.asarray(mask).max() == 255


def test_pil_input_and_resize():
    parse = synthetic_parse()
    pil = Image.fromarray(parse)
    mask, _ = get_mask_location("hd", "upper_body", pil, keypoints(),
                                width=192, height=256)
    assert np.asarray(mask).shape == (256, 192)
