"""OpenPose: model shapes, converter round-trip, decode on synthetic heatmaps."""

import numpy as np
import jax
import jax.numpy as jnp

from idmvton_tpu.preprocess.openpose import (
    init_openpose, openpose_apply, convert_openpose,
    find_peaks, match_limbs, assemble_people, OpenPose, _LIMB_SEQ, _PAF_IDX,
)


def test_paf_channel_table_matches_reference():
    """_PAF_IDX must equal the reference mapIdx EXACTLY
    (preprocess/openpose/annotator/openpose/body.py:108-110) — round 1
    shipped a wrong tail for limbs 12-18 that negative-indexed into the
    wrong PAF channels, which a decode-roundtrip test cannot catch."""
    reference_map_idx = [
        (31, 32), (39, 40), (33, 34), (35, 36), (41, 42), (43, 44),
        (19, 20), (21, 22), (23, 24), (25, 26), (27, 28), (29, 30),
        (47, 48), (49, 50), (53, 54), (51, 52), (55, 56), (37, 38),
        (45, 46),
    ]
    assert _PAF_IDX == reference_map_idx
    # every PAF channel index (mapIdx - 19) must be a valid channel of the
    # 38-channel PAF head — the broken table produced negative indices
    for ca, cb in _PAF_IDX:
        assert 0 <= ca - 19 < 38 and 0 <= cb - 19 < 38
    # limbs 12-18 read channels 28/29, 30/31, 34/35, 32/33, 36/37, 18/19,
    # 26/27 (VERDICT.md round-1 item 4)
    tail = [(ca - 19, cb - 19) for ca, cb in _PAF_IDX[12:]]
    assert tail == [(28, 29), (30, 31), (34, 35), (32, 33), (36, 37),
                    (18, 19), (26, 27)]


def test_model_shapes():
    params = init_openpose(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 48, 3), jnp.float32)
    paf, heat = openpose_apply(params, x)
    assert paf.shape == (1, 8, 6, 38)
    assert heat.shape == (1, 8, 6, 19)


def test_converter_roundtrip():
    params = init_openpose(jax.random.PRNGKey(1))
    # export to torch-style names and re-convert
    sd = {}
    from idmvton_tpu.preprocess.openpose import _all_layers
    for block, layers in _all_layers().items():
        for name, _, _, _ in layers:
            p = params[block][name]
            sd[f"{block}.{name}.weight"] = np.transpose(
                np.asarray(p["kernel"]), (3, 2, 0, 1))
            sd[f"{block}.{name}.bias"] = np.asarray(p["bias"])
    p2 = convert_openpose(sd)
    for block in params:
        for name in params[block]:
            np.testing.assert_allclose(
                np.asarray(params[block][name]["kernel"]),
                np.asarray(p2[block][name]["kernel"]), atol=1e-6)


def _gaussian_blob(h, w, cy, cx, sigma=4.0):
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    return np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * sigma ** 2))


def test_decode_synthetic_person():
    """Plant gaussian peaks for a synthetic skeleton and matching PAFs; the
    decoder must recover the keypoints."""
    h, w = 128, 96
    joints = {1: (30, 48), 2: (40, 30), 3: (60, 25), 4: (80, 22),
              5: (40, 66), 6: (60, 72), 7: (80, 76), 8: (85, 40),
              9: (110, 40), 12: (85, 56), 13: (110, 56), 0: (18, 48)}
    heat = np.zeros((h, w, 19), np.float32)
    for part, (cy, cx) in joints.items():
        heat[:, :, part] = _gaussian_blob(h, w, cy, cx)
    paf = np.zeros((h, w, 38), np.float32)
    for limb_i, (pa, pb) in enumerate(_LIMB_SEQ):
        a, b = joints.get(pa - 1), joints.get(pb - 1)
        if a is None or b is None:
            continue
        ca, cb = _PAF_IDX[limb_i]
        vec = np.asarray([b[1] - a[1], b[0] - a[0]], np.float32)
        vec /= max(np.linalg.norm(vec), 1e-6)
        for t in np.linspace(0, 1, 60):
            y = int(round(a[0] + t * (b[0] - a[0])))
            x = int(round(a[1] + t * (b[1] - a[1])))
            paf[max(y - 2, 0):y + 3, max(x - 2, 0):x + 3, ca - 19] = vec[0]
            paf[max(y - 2, 0):y + 3, max(x - 2, 0):x + 3, cb - 19] = vec[1]

    peaks = find_peaks(heat)
    assert sum(len(p) for p in peaks) >= len(joints)
    conns = match_limbs(paf, peaks, img_h=h)
    subset, candidate = assemble_people(peaks, conns)
    assert len(subset) >= 1
    best = subset[np.argmax(subset[:, -2])]
    # neck (part 1) recovered at the planted location
    neck = candidate[int(best[1]), :2]
    assert abs(neck[0] - 48) <= 2 and abs(neck[1] - 30) <= 2


def test_openpose_end_to_end_random_weights():
    """Full wrapper on a random image: must return the 18-keypoint contract
    even with no detections (random weights)."""
    op = OpenPose(scales=(0.5,), boxsize=96)
    img = np.random.RandomState(0).randint(0, 255, (128, 96, 3), np.uint8)
    out = op(img)
    kp = np.asarray(out["pose_keypoints_2d"], np.float32)
    assert kp.shape == (36,)
