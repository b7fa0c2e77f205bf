"""OpenPose body-pose estimation: CMU 2-branch PAF/heatmap CNN in JAX +
host-side multi-person decode.

reference: preprocess/openpose/annotator/openpose/model.py:24 bodypose_model
(VGG-ish trunk + 6 refinement stages, branch L1 = 38-ch part-affinity fields,
branch L2 = 19-ch keypoint heatmaps), decode at body.py:31-229 (multi-scale
heatmap averaging, gaussian peak finding, PAF line-integral bipartite
matching), wrapper run_openpose.py:35-70 (exactly 18 keypoints in 384x512
coords).

The CNN is jitted NHWC; the decode is sequential host numpy (it operates on
a handful of peaks, not worth TPU round-trips).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from idmvton_tpu.models.layers import init_conv, conv2d

# (name, in, out, kernel) per block; pools are implicit after conv1_2,
# conv2_2, conv3_4 (reference model.py block0)
_TRUNK = [
    ("conv1_1", 3, 64, 3), ("conv1_2", 64, 64, 3),
    ("conv2_1", 64, 128, 3), ("conv2_2", 128, 128, 3),
    ("conv3_1", 128, 256, 3), ("conv3_2", 256, 256, 3),
    ("conv3_3", 256, 256, 3), ("conv3_4", 256, 256, 3),
    ("conv4_1", 256, 512, 3), ("conv4_2", 512, 512, 3),
    ("conv4_3_CPM", 512, 256, 3), ("conv4_4_CPM", 256, 128, 3),
]
_POOL_AFTER = {"conv1_2", "conv2_2", "conv3_4"}
_N_PAF, _N_HEAT = 38, 19


def _stage1(branch: str, out_ch: int):
    return [(f"conv5_{i}_CPM_{branch}", 128, 128, 3) for i in (1, 2, 3)] + [
        (f"conv5_4_CPM_{branch}", 128, 512, 1),
        (f"conv5_5_CPM_{branch}", 512, out_ch, 1),
    ]


def _stageN(n: int, branch: str, out_ch: int):
    in_ch = 128 + _N_PAF + _N_HEAT
    return [(f"Mconv1_stage{n}_{branch}", in_ch, 128, 7)] + [
        (f"Mconv{i}_stage{n}_{branch}", 128, 128, 7) for i in (2, 3, 4, 5)
    ] + [
        (f"Mconv6_stage{n}_{branch}", 128, 128, 1),
        (f"Mconv7_stage{n}_{branch}", 128, out_ch, 1),
    ]


def _all_layers():
    layers = {"model0": _TRUNK}
    layers["model1_1"] = _stage1("L1", _N_PAF)
    layers["model1_2"] = _stage1("L2", _N_HEAT)
    for n in range(2, 7):
        layers[f"model{n}_1"] = _stageN(n, "L1", _N_PAF)
        layers[f"model{n}_2"] = _stageN(n, "L2", _N_HEAT)
    return layers


def init_openpose(key, dtype=jnp.float32) -> dict:
    params = {}
    keys = iter(jax.random.split(key, 256))
    for block, layers in _all_layers().items():
        params[block] = {name: init_conv(next(keys), i, o, k, dtype=dtype)
                         for name, i, o, k in layers}
    return params


def _run_block(params, block_layers, x, *, final_no_relu: bool):
    names = [l[0] for l in block_layers]
    for idx, name in enumerate(names):
        x = conv2d(params[name], x)
        if not (final_no_relu and idx == len(names) - 1):
            x = jax.nn.relu(x)
        if name in _POOL_AFTER:
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return x


def openpose_apply(params, x):
    """x: (B, H, W, 3) BGR in [-0.5, 0.5] (reference: body.py normalization
    im/256 - 0.5). Returns (paf (B, H/8, W/8, 38), heatmap (B, H/8, W/8, 19))."""
    layers = _all_layers()
    feat = _run_block(params["model0"], layers["model0"], x, final_no_relu=False)
    paf = _run_block(params["model1_1"], layers["model1_1"], feat, final_no_relu=True)
    heat = _run_block(params["model1_2"], layers["model1_2"], feat, final_no_relu=True)
    for n in range(2, 7):
        inp = jnp.concatenate([paf, heat, feat], axis=-1)
        paf = _run_block(params[f"model{n}_1"], layers[f"model{n}_1"], inp,
                         final_no_relu=True)
        # reference quirk (model.py:29-32): the no_relu_layers list names
        # Mconv7_stage6_L1 TWICE, omitting Mconv7_stage6_L2 — so the final
        # stage's heatmap output IS relu'd. The shipped weights were trained
        # against that graph; replicate it.
        heat = _run_block(params[f"model{n}_2"], layers[f"model{n}_2"], inp,
                          final_no_relu=(n != 6))
    return paf, heat


def convert_openpose(sd: Dict[str, np.ndarray], dtype=jnp.float32, *,
                     strict: bool = False) -> dict:
    """torch state dict (keys 'model0.conv1_1.weight', ...) -> param tree."""
    params = {}
    used = set()
    for block, layers in _all_layers().items():
        params[block] = {}
        for name, _, _, _ in layers:
            w = np.asarray(sd[f"{block}.{name}.weight"])
            b = np.asarray(sd[f"{block}.{name}.bias"])
            used.update((f"{block}.{name}.weight", f"{block}.{name}.bias"))
            params[block][name] = {
                "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)), dtype),
                "bias": jnp.asarray(b, dtype),
            }
    if strict:
        from idmvton_tpu.weights.converter import check_consumed
        check_consumed(sd, used)
    return params


# ---------------------------------------------------------------------------
# decode: peaks + PAF bipartite matching (host-side numpy)
# ---------------------------------------------------------------------------

# limb sequence and the PAF channel pairs for each limb (reference body.py)
_LIMB_SEQ = [
    (2, 3), (2, 6), (3, 4), (4, 5), (6, 7), (7, 8), (2, 9), (9, 10),
    (10, 11), (2, 12), (12, 13), (13, 14), (2, 1), (1, 15), (15, 17),
    (1, 16), (16, 18), (3, 17), (6, 18),
]
_PAF_IDX = [
    (31, 32), (39, 40), (33, 34), (35, 36), (41, 42), (43, 44), (19, 20),
    (21, 22), (23, 24), (25, 26), (27, 28), (29, 30), (47, 48), (49, 50),
    (53, 54), (51, 52), (55, 56), (37, 38), (45, 46),
]


def find_peaks(heatmap: np.ndarray, *, threshold: float = 0.1,
               sigma: float = 3.0) -> List[List[Tuple[int, int, float, int]]]:
    """heatmap (H, W, 19). Returns per-part peak lists of
    (x, y, score, global_id)."""
    from scipy.ndimage import gaussian_filter
    all_peaks = []
    peak_counter = 0
    for part in range(18):
        m = gaussian_filter(heatmap[:, :, part], sigma=sigma)
        up = np.zeros_like(m); up[1:, :] = m[:-1, :]
        down = np.zeros_like(m); down[:-1, :] = m[1:, :]
        left = np.zeros_like(m); left[:, 1:] = m[:, :-1]
        right = np.zeros_like(m); right[:, :-1] = m[:, 1:]
        is_peak = ((m >= up) & (m >= down) & (m >= left) & (m >= right)
                   & (m > threshold))
        ys, xs = np.nonzero(is_peak)
        peaks = [(int(x), int(y), float(heatmap[y, x, part]), peak_counter + i)
                 for i, (y, x) in enumerate(zip(ys, xs))]
        peak_counter += len(peaks)
        all_peaks.append(peaks)
    return all_peaks


def match_limbs(paf: np.ndarray, all_peaks, *, img_h: int,
                n_integral: int = 10, score_thr: float = 0.05):
    """PAF line-integral scoring + greedy bipartite matching per limb
    (reference body.py:77-139). Returns (connections per limb)."""
    connections = []
    for limb_i, (pa, pb) in enumerate(_LIMB_SEQ):
        ca, cb = _PAF_IDX[limb_i]
        # mapIdx values are historical concat indices; PAF channel = idx - 19
        # (reference body.py score_mid indexing)
        score_map = paf[:, :, [ca - 19, cb - 19]]
        cand_a = all_peaks[pa - 1]
        cand_b = all_peaks[pb - 1]
        if not cand_a or not cand_b:
            connections.append([])
            continue
        scored = []
        for i, a in enumerate(cand_a):
            for j, b in enumerate(cand_b):
                vec = np.asarray([b[0] - a[0], b[1] - a[1]], np.float32)
                norm = max(math.sqrt(float(vec @ vec)), 1e-8)
                v = vec / norm
                xs = np.linspace(a[0], b[0], n_integral)
                ys = np.linspace(a[1], b[1], n_integral)
                samples = score_map[np.round(ys).astype(int).clip(0, paf.shape[0] - 1),
                                    np.round(xs).astype(int).clip(0, paf.shape[1] - 1)]
                line_scores = samples @ v
                prior = min(0.5 * img_h / norm - 1, 0.0)
                mean_score = float(line_scores.mean()) + prior
                ok = ((line_scores > score_thr).sum() > 0.8 * n_integral
                      and mean_score > 0)
                if ok:
                    scored.append((i, j, mean_score,
                                   mean_score + a[2] + b[2]))
        scored.sort(key=lambda t: t[2], reverse=True)
        used_a, used_b, conn = set(), set(), []
        for i, j, s, st in scored:
            if i not in used_a and j not in used_b:
                conn.append((cand_a[i][3], cand_b[j][3], s, i, j))
                used_a.add(i)
                used_b.add(j)
                if len(conn) >= min(len(cand_a), len(cand_b)):
                    break
        connections.append(conn)
    return connections


def assemble_people(all_peaks, connections):
    """Group limb connections into people (reference body.py:143-212).
    Returns subset (P, 20): 18 peak ids (-1 missing), score, count."""
    candidate = np.asarray([p for peaks in all_peaks for p in peaks],
                           np.float32).reshape(-1, 4)
    subset = np.empty((0, 20), np.float32)
    for limb_i, (pa, pb) in enumerate(_LIMB_SEQ):
        conn = connections[limb_i]
        if not conn:
            continue
        ia, ib = pa - 1, pb - 1
        for (ga, gb, score, _, _) in conn:
            found = [si for si in range(len(subset))
                     if subset[si][ia] == ga or subset[si][ib] == gb]
            if len(found) == 1:
                s = found[0]
                if subset[s][ib] != gb:
                    subset[s][ib] = gb
                    subset[s][-1] += 1
                    subset[s][-2] += candidate[int(gb), 2] + score
            elif len(found) == 2:
                s1, s2 = found
                overlap = ((subset[s1][:18] >= 0)
                           & (subset[s2][:18] >= 0)).sum()
                if overlap == 0:  # merge disjoint partial people
                    subset[s1][:18] = np.where(subset[s1][:18] < 0,
                                               subset[s2][:18], subset[s1][:18])
                    subset[s1][-2:] += subset[s2][-2:]
                    subset[s1][-2] += score
                    subset = np.delete(subset, s2, 0)
                else:
                    subset[s1][ib] = gb
                    subset[s1][-1] += 1
                    subset[s1][-2] += candidate[int(gb), 2] + score
            elif limb_i < 17:
                row = -1 * np.ones(20, np.float32)
                row[ia], row[ib] = ga, gb
                row[-1] = 2
                row[-2] = candidate[int(ga), 2] + candidate[int(gb), 2] + score
                subset = np.vstack([subset, row])
    # prune weak people
    keep = [i for i in range(len(subset))
            if subset[i][-1] >= 4 and subset[i][-2] / subset[i][-1] >= 0.4]
    return subset[keep], candidate


class OpenPose:
    """End-to-end wrapper: image -> 18 keypoints in (384, 512) coords
    (reference: run_openpose.py:35-70)."""

    def __init__(self, params=None, *, boxsize: int = 368, stride: int = 8,
                 scales=(0.5,)):
        self.params = params if params is not None else init_openpose(
            jax.random.PRNGKey(0))
        self.boxsize = boxsize
        self.stride = stride
        self.scales = scales
        self._apply = jax.jit(openpose_apply)

    @staticmethod
    def from_torch(path: str, dtype=jnp.float32) -> "OpenPose":
        from idmvton_tpu.weights.converter import load_state_dict
        return OpenPose(convert_openpose(load_state_dict(path), dtype))

    def heatmaps(self, image_bgr: np.ndarray):
        """image_bgr (H, W, 3) uint8. Multi-scale averaged (paf, heatmap) at
        image resolution."""
        h, w = image_bgr.shape[:2]
        import cv2
        heat_avg = np.zeros((h, w, _N_HEAT), np.float32)
        paf_avg = np.zeros((h, w, _N_PAF), np.float32)
        for scale in self.scales:
            s = scale * self.boxsize / h
            im = cv2.resize(image_bgr, None, fx=s, fy=s,
                            interpolation=cv2.INTER_CUBIC)
            ph = (self.stride - im.shape[0] % self.stride) % self.stride
            pw = (self.stride - im.shape[1] % self.stride) % self.stride
            # padRightDownCorner pads bottom/right with 128 (util.py:38-56)
            im = np.pad(im, ((0, ph), (0, pw), (0, 0)), mode="constant",
                        constant_values=128)
            x = im.astype(np.float32)[None] / 256.0 - 0.5
            paf, heat = self._apply(self.params, jnp.asarray(x))
            paf = np.asarray(jax.image.resize(
                paf[0], (im.shape[0], im.shape[1], _N_PAF), "bilinear"))
            heat = np.asarray(jax.image.resize(
                heat[0], (im.shape[0], im.shape[1], _N_HEAT), "bilinear"))
            paf = cv2.resize(paf[:im.shape[0] - ph or None,
                                 :im.shape[1] - pw or None], (w, h))
            heat = cv2.resize(heat[:im.shape[0] - ph or None,
                                   :im.shape[1] - pw or None], (w, h))
            paf_avg += paf / len(self.scales)
            heat_avg += heat / len(self.scales)
        return paf_avg, heat_avg

    def __call__(self, image_rgb: np.ndarray) -> dict:
        """image_rgb (H, W, 3) uint8 -> {"pose_keypoints_2d": 18*2 floats}
        scaled to 384x512 (undetected joints = -1)."""
        h, w = image_rgb.shape[:2]
        image_bgr = image_rgb[:, :, ::-1]
        paf, heat = self.heatmaps(image_bgr)
        peaks = find_peaks(heat)
        conns = match_limbs(paf, peaks, img_h=h)
        subset, candidate = assemble_people(peaks, conns)
        kps = -np.ones((18, 2), np.float32)
        if len(subset):
            best = subset[np.argmax(subset[:, -2])]
            for part in range(18):
                idx = int(best[part])
                if idx >= 0:
                    kps[part] = candidate[idx, :2]
        # scale to the canonical 384x512 frame
        kps[kps[:, 0] >= 0] *= np.asarray([384.0 / w, 512.0 / h], np.float32)
        return {"pose_keypoints_2d": kps.reshape(-1).tolist()}
