"""OpenPose face/hand estimators: unit contracts + executable-reference
parity (reference: preprocess/openpose/annotator/openpose/face.py, hand.py,
util.py — file-direct imports with stubs for torchvision/skimage, which the
tested code paths replace with available equivalents)."""

import importlib
import importlib.util
import os
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from idmvton_tpu.preprocess.openpose_extra import (
    Face, Hand, N_FACE, N_HAND, convert_facenet, convert_handpose,
    detect_faces, detect_hands, draw_facepose, draw_handpose, facenet_apply,
    handpose_apply, init_facenet, init_handpose,
)

REF = "/root/reference"

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_pkg():
    """face.py / hand.py / util.py as a package. Stubs: torchvision
    (face.py imports ToTensor/ToPILImage but the model + peaks paths never
    call them) and skimage.measure.label (hand.py decode) backed by
    scipy.ndimage.label with 8-connectivity — the exact semantics
    skimage's connectivity=2 implements."""
    from scipy import ndimage

    def _label(binary, return_num=False, connectivity=None):
        lab, n = ndimage.label(binary, structure=np.ones((3, 3), np.int32))
        return (lab, n) if return_num else lab

    def _stub(name, **attrs):
        mod = types.ModuleType(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        for k, v in attrs.items():
            setattr(mod, k, v)
        return mod

    sys.modules.setdefault("torchvision", _stub("torchvision"))
    sys.modules.setdefault(
        "torchvision.transforms",
        _stub("torchvision.transforms",  # face.py instantiates at module
              ToTensor=lambda: None, ToPILImage=lambda: None))  # scope
    sys.modules.setdefault("skimage", _stub("skimage"))
    sys.modules.setdefault("skimage.measure",
                           _stub("skimage.measure", label=_label))
    if "ref_openpose" not in sys.modules:
        pkg = types.ModuleType("ref_openpose")
        pkg.__path__ = [os.path.join(
            REF, "preprocess/openpose/annotator/openpose")]
        sys.modules["ref_openpose"] = pkg
    face = importlib.import_module("ref_openpose.face")
    hand = importlib.import_module("ref_openpose.hand")
    util = importlib.import_module("ref_openpose.util")
    return types.SimpleNamespace(face=face, hand=hand, util=util)


def _sd(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# CNN numeric parity on random converted weights
# ---------------------------------------------------------------------------


def test_facenet_numeric_parity(ref_pkg):
    torch.manual_seed(0)
    net = ref_pkg.face.FaceNet().eval()
    params = convert_facenet(_sd(net), strict=True)
    x = np.random.default_rng(1).uniform(
        -0.5, 0.5, (1, 3, 64, 48)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x))[-1].numpy()  # Face uses hs[-1]
    got = np.asarray(facenet_apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-3)


def test_handpose_numeric_parity(ref_pkg):
    model_mod = importlib.import_module("ref_openpose.model")
    torch.manual_seed(0)
    net = model_mod.handpose_model().eval()
    params = convert_handpose(_sd(net), strict=True)
    x = np.random.default_rng(2).uniform(
        -0.5, 0.5, (1, 3, 64, 48)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()
    got = np.asarray(handpose_apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# decode parity
# ---------------------------------------------------------------------------


def test_face_peaks_parity(ref_pkg):
    rng = np.random.default_rng(3)
    hm = rng.uniform(0, 0.2, (40, 30, N_FACE)).astype(np.float32)
    hm[5, 7, 0] = 0.9
    hm[20, 12, 3] = 0.7
    hm[33, 2, 70] = 0.6
    # compute_peaks_from_heatmaps reads no state but the hard-coded 0.05
    # threshold (face.py:355-368) — callable unbound
    want = ref_pkg.face.Face.compute_peaks_from_heatmaps(
        None, hm.transpose(2, 0, 1))
    face = Face.__new__(Face)  # peaks needs only the threshold
    face.threshold = 0.05
    got = face.peaks(hm)
    np.testing.assert_array_equal(got, want)


def _avgpool_stub_np(x_hw3: np.ndarray, out_ch: int) -> np.ndarray:
    """Deterministic stand-in CNN: stride-8 average pool of the preprocessed
    input, channel c reads input channel c % 3 (value-sensitive, so the
    blur/resize/pad chains feeding the CNN are part of the parity)."""
    h8, w8 = x_hw3.shape[0] // 8, x_hw3.shape[1] // 8
    pooled = x_hw3[:h8 * 8, :w8 * 8].reshape(h8, 8, w8, 8, 3).mean((1, 3))
    return np.stack([pooled[:, :, c % 3] * (1 + 0.1 * c)
                     for c in range(out_ch)], axis=-1).astype(np.float32)


def test_hand_end_to_end_parity(ref_pkg):
    """Full multi-scale wrapper chain (resize kernels, 128-pad, stride-8
    upsample, crop, average, gaussian+component+npmax decode) vs the
    reference Hand.__call__ with the SAME value-sensitive stub CNN."""

    class _TorchStub:
        def __call__(self, data):
            x = data.numpy()[0].transpose(1, 2, 0)
            return torch.from_numpy(
                _avgpool_stub_np(x, N_HAND).transpose(2, 0, 1)[None])

    ref_hand = ref_pkg.hand.Hand.__new__(ref_pkg.hand.Hand)
    ref_hand.model = _TorchStub()

    hand = Hand(params=init_handpose(jax.random.PRNGKey(0)))
    hand._apply = lambda p, x: jnp.asarray(
        _avgpool_stub_np(np.asarray(x)[0], N_HAND)[None])

    img = np.random.default_rng(4).integers(
        0, 255, (80, 60, 3), np.uint8)
    want = ref_hand(img)
    got = hand(img)
    np.testing.assert_array_equal(got, want)


def test_detect_hands_faces_parity(ref_pkg):
    rng = np.random.default_rng(5)
    candidate = np.concatenate(
        [rng.uniform(10, 300, (36, 2)), rng.uniform(0, 1, (36, 2))], axis=1)
    subset = np.full((2, 20), -1.0)
    subset[0, :18] = np.arange(18)          # full person
    subset[1, [0, 2, 3, 4, 14, 16]] = np.arange(18, 24)  # right arm + head
    img = np.zeros((320, 320, 3), np.uint8)
    want_h = ref_pkg.util.handDetect(candidate, subset, img)
    got_h = detect_hands(candidate, subset, img.shape[:2])
    assert [list(map(int, r[:3])) + [bool(r[3])] for r in got_h] == \
        [list(map(int, r[:3])) + [bool(r[3])] for r in want_h]
    want_f = ref_pkg.util.faceDetect(candidate, subset, img)
    got_f = detect_faces(candidate, subset, img.shape[:2])
    assert [list(map(int, r)) for r in got_f] == \
        [list(map(int, r)) for r in want_f]


# ---------------------------------------------------------------------------
# unit contracts (no reference needed)
# ---------------------------------------------------------------------------


def test_face_wrapper_contract():
    face = Face(params=init_facenet(jax.random.PRNGKey(1)), input_size=64)
    img = np.random.default_rng(6).integers(0, 255, (48, 40, 3), np.uint8)
    hm = face.heatmaps(img)
    assert hm.shape == (48, 40, N_FACE)
    peaks = face.peaks(hm)
    assert peaks.ndim == 2 and peaks.shape[1] == 2 if len(peaks) else True


def test_hand_wrapper_contract():
    hand = Hand(params=init_handpose(jax.random.PRNGKey(2)),
                boxsize=48, scales=(0.5, 1.0), map_size=32)
    img = np.random.default_rng(7).integers(0, 255, (40, 32, 3), np.uint8)
    peaks = hand(img)
    assert peaks.shape == (N_HAND - 1, 2)
    assert (peaks[:, 0] < 32).all() and (peaks[:, 1] < 40).all()


def test_drawing_smoke():
    canvas = np.zeros((64, 64, 3), np.uint8)
    peaks = np.asarray([[10, 10], [20, 20], [0, 0]] + [[5, 5]] * 18)
    out = draw_handpose(canvas, peaks[:21])
    assert out.shape == canvas.shape and out.sum() > 0
    out2 = draw_facepose(canvas, peaks[:3])
    assert out2.sum() > 0
